package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._

/** The native H32 expression must be value-identical to the built-in
  * composition conv(substring(md5(x),1,8),16,10) — which is what the DuckDB
  * oracle computes — on ASCII, unicode, empty, and corpus strings. */
class H32Spec extends SparkSpec {
  import spark.implicits._

  test("native h32 equals the built-in md5 composition on edge strings") {
    val df = Seq("", "a", "hello world", "héllo wörld — ünïcode ✓",
      "0", " ", "\n", "a" * 10000).toDF("s")
      .select(Portable.h32(col("s")).as("native"),
        Portable.h32Builtin(col("s")).as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).isEmpty)
    assert(df.filter(col("native") < 0 || col("native") >= (1L << 32)).isEmpty,
      "h32 out of [0, 2^32)")
  }

  test("native h32 equals the built-in composition across the corpus") {
    val docs = Tables.t(spark, sf("sf0.001"), "documents")
      .select(Portable.h32(col("text")).as("native"),
        Portable.h32Builtin(col("text")).as("builtin"))
    assert(docs.filter(col("native") =!= col("builtin")).isEmpty)
  }

  test("native h32 is null-safe and appears in scan-backed plans") {
    val df = Seq(Some("x"), None).toDF("s")
      .select(Portable.h32(col("s")).as("h"))
    assert(df.collect().map(r => r.isNullAt(0)).toSeq == Seq(false, true))
    // a local Seq constant-folds away; assert on a parquet-backed plan
    val p = Tables.t(spark, sf("sf0.001"), "documents")
      .select(Portable.h32(col("text")).as("h"))
      .queryExecution.executedPlan.toString
    assert(p.contains("h32"), s"h32 missing from plan:\n$p")
  }
}
