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

  test("tier-2 regime: long documents (>16.4k tokens) stay within one tier-2 bin width") {
    // The round-12 single-tier geometry saturated every length above
    // 16 384 into the last bin — a long-document corpus's p99 silently
    // floored. The two-tier geometry must land within HistBinW2 (2048
    // tokens) of the exact order statistic for book-length docs.
    val lens = Seq(120L, 300L, 9000L, 17500L, 21000L, 26000L, 33000L,
      48000L, 52000L, 90000L)
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, "xx", ("w " * (n.toInt - 1) + "w"))
    }.toDF("doc_id", "lang", "text")
    val got = Extensions.quantilesOfHist(Extensions.histSketchOf(docs))
      .select("p50_est", "p90_est", "p99_est").head()
    // Exact order statistics at rank ceil(10*q/100): p50 = lens(4),
    // p90 = lens(8), p99 = lens(9).
    val exact = Seq(lens(4), lens(8), lens(9))
    exact.zipWithIndex.foreach { case (e, i) =>
      val est = got.getLong(i)
      assert(math.abs(est - e) <= Extensions.HistBinW2,
        s"quantile $i: est $est vs exact $e drifted past one tier-2 bin")
    }
    // …and the sketch itself stays inside the fixed 1024-bin budget.
    val maxBin = Extensions.histSketchOf(docs).agg(max("bin")).head.getLong(0)
    assert(maxBin <= Extensions.HistMaxBin && maxBin > Extensions.HistTier1Bins,
      s"long docs landed at bin $maxBin — not in tier 2")
  }

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
