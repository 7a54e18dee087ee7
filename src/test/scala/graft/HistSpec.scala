package graft

import graft.queries.Extensions
import graft.streaming.CorpusService
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The length-histogram quantile sketch (t39) and its maintained
  * service form — the CmsSpec contract applied to the third sketch
  * family: linearity (partials of disjoint batches sum to the corpus
  * sketch), wave-maintenance ≡ one-shot, idempotence, and
  * delete/purge-by-subtraction convergence to a never-ingested twin. */
class HistSpec extends SparkSpec {
  import spark.implicits._

  test("partial histograms of a split corpus sum to the one-shot sketch") {
    val d = Tables.t(spark, sf("sf0.001"), "documents")
    val even = d.filter(col("doc_id") % 2 === 0)
    val odd = d.filter(col("doc_id") % 2 =!= 0)
    val merged = Extensions.histSketchOf(even)
      .unionByName(Extensions.histSketchOf(odd))
      .groupBy("lang", "bin").agg(sum("cnt").as("cnt"))
    assertSameRows(merged, Extensions.histSketchOf(d),
      "histogram linearity: Σ partials ≠ one-shot sketch")
  }

  test("maintained histogram over waves ≡ one-shot; quantiles ≡ t39; idempotent") {
    val src = Tables.t(spark, sf("sf0.001"), "documents")
      .select("doc_id", "lang", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-hist").toString
    val p = CorpusService.Paths(base)

    src.filter(col("doc_id") % 2 === 0).write.parquet(p.docs)
    CorpusService.refreshLengthHistogram(spark, p)
    src.filter(col("doc_id") % 2 =!= 0)
      .write.mode(SaveMode.Append).parquet(p.docs)
    CorpusService.refreshLengthHistogram(spark, p)

    assertSameRows(CorpusService.lengthHistogramView(spark, p),
      Extensions.histSketchOf(src),
      "wave-maintained histogram vs one-shot")
    // The served quantiles ARE t39 off the maintained sketch.
    assertSameRows(CorpusService.lengthQuantiles(spark, p),
      Extensions.lengthQuantiles(spark, p.base),
      "served quantiles vs one-shot t39")
    // Idempotent: a drain with nothing new appends nothing.
    CorpusService.refreshLengthHistogram(spark, p)
    assertSameRows(CorpusService.lengthHistogramView(spark, p),
      Extensions.histSketchOf(src),
      "no-op drain changed the histogram")
  }

  test("delete + purge subtracts exactly: the sketch equals a never-ingested twin") {
    val dels = Seq(3L, 17L, 42L)
    val src = Tables.t(spark, sf("sf0.001"), "documents")
      .select("doc_id", "lang", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-histdel").toString
    val p = CorpusService.Paths(base)
    src.write.parquet(p.docs)
    CorpusService.refreshLengthHistogram(spark, p)
    CorpusService.deleteDocs(spark, p, dels)
    assert(CorpusService.purgeTombstoned(spark, p), "purge must land")
    val without = src.filter(!col("doc_id").isin(dels: _*))
    assertSameRows(CorpusService.lengthHistogramView(spark, p),
      Extensions.histSketchOf(without),
      "post-purge histogram vs never-ingested sketch")
    // Replayed delete+purge must not double-subtract.
    CorpusService.deleteDocs(spark, p, dels)
    assert(CorpusService.purgeTombstoned(spark, p))
    assertSameRows(CorpusService.lengthHistogramView(spark, p),
      Extensions.histSketchOf(without),
      "replayed purge double-subtracted the histogram")
    // The next drain must not re-ingest purged docs from the
    // append-only corpus store.
    CorpusService.refreshLengthHistogram(spark, p)
    assertSameRows(CorpusService.lengthHistogramView(spark, p),
      Extensions.histSketchOf(without),
      "histogram maintenance resurrected purged docs")
  }
}
