package graft

import graft.queries.Extensions
import graft.streaming.CorpusService
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The Count-Min sketch (t37) and its maintained service form.
  *
  * The load-bearing claim is LINEARITY: partial sketches of disjoint doc
  * sets sum to the union's sketch row-for-row — that is what lets every
  * shard (or every service drain) keep a 4×256 table and the monitor
  * merge them without ever re-reading old text. The service test drives
  * the same identity through the maintained log across waves, plus
  * idempotence and the never-undercount estimate contract.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("partial sketches of a split corpus sum to the one-shot sketch") {
    val d = Tables.t(spark, sf("sf0.001"), "documents")
    val even = d.filter(col("doc_id") % 2 === 0)
    val odd = d.filter(col("doc_id") % 2 =!= 0)
    val merged = Extensions.cmsSketchOf(even)
      .unionByName(Extensions.cmsSketchOf(odd))
      .groupBy("j", "b").agg(sum("c").as("c"))
    assertSameRows(merged, Extensions.cmsSketchOf(d),
      "CMS linearity: Σ partials ≠ one-shot sketch")
  }

  test("maintained sketch over waves ≡ one-shot; idempotent; never undercounts") {
    val src = Tables.t(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-cms").toString
    val p = CorpusService.Paths(base)

    src.filter(col("doc_id") % 2 === 0).write.parquet(p.docs)
    CorpusService.refreshTokenSketch(spark, p)
    src.filter(col("doc_id") % 2 =!= 0)
      .write.mode(SaveMode.Append).parquet(p.docs)
    CorpusService.refreshTokenSketch(spark, p)

    assertSameRows(CorpusService.tokenSketchView(spark, p),
      Extensions.cmsSketchOf(Tables.t(spark, base, "documents")),
      "wave-merged sketch ≠ one-shot sketch of the final corpus")

    // No new docs → the refresh must append nothing (the log stays
    // byte-identical, not merely view-identical).
    val filesBefore = spark.read.parquet(p.cmsLog).count()
    CorpusService.refreshTokenSketch(spark, p)
    assert(spark.read.parquet(p.cmsLog).count() == filesBefore,
      "an empty refresh appended rows")

    // Estimate contract: every vocabulary token's estimate is ≥ its
    // exact count (CMS never undercounts), served off the 1024-row
    // view without touching the corpus.
    val exact = Tables.t(spark, base, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("exact_count"))
    val vocab = exact.select("tok").as[String].collect().toSeq
    val under = CorpusService.tokenFreqEstimate(spark, p, vocab)
      .join(exact, "tok")
      .filter(col("est_count") < col("exact_count"))
    assert(under.count() == 0, "a CMS estimate undercounted")
  }
}
