package graft

import graft.functions.DotI64
import org.apache.spark.sql.functions._

class DotI64Spec extends SparkSpec {
  import spark.implicits._

  test("dot_i64 matches the higher-order-function fold") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-2L, 7L), Seq(3L, 3L)),
      (Seq.empty[Long], Seq.empty[Long]))
      .toDF("qa", "qb")
    val got = df.select(
      DotI64(col("qa"), col("qb")).as("native"),
      expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
        .as("hof"))
    assert(got.filter(col("native") =!= col("hof")).count() == 0)
    assert(got.select("native").as[Long].collect().toList == List(32L, 15L, 0L))
  }

  test("dot_i64 is null-safe and handles unequal lengths (common prefix)") {
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq(1L, 2L, 3L)), Some(Seq(10L))))
      .toDF("qa", "qb")
      .select(DotI64(col("qa"), col("qb")).as("d"))
    assert(df.collect().map(r => Option(r.get(0))).toList ==
      List(None, Some(10L)))
  }

  test("dot_i64 rejects wrong input types at analysis time") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("qa", "qb")
    intercept[Exception] {
      df.select(DotI64(col("qa"), col("qb"))).collect()
    }
  }
}
