package graft

import graft.queries.Extensions
import graft.streaming.{CorpusService, StreamingDedup, StreamingSemanticDedup}
import org.apache.spark.sql.functions._

/** The composed corpus lifecycle: documents + embeddings arrive in
  * waves, both dedup cycles run at ingest, logs compact between drains
  * — and the accumulated state equals the one-shot batch operators on
  * the final corpus (the composition adds no semantics of its own). */
class CorpusServiceSpec extends SparkSpec {

  test("two-wave corpus service converges to the one-shot batch dedups") {
    val srcDir = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val p = CorpusService.Paths(base)

    val docs = graft.Tables.t(spark, srcDir, "documents")
      .select("doc_id", "text", "lang")
    val emb = graft.Tables.t(spark, srcDir, "embeddings")
      .select("vec_id", "embedding")

    // Wave 1: ~60% of the corpus, both modalities.
    docs.filter(col("doc_id") % 5 < 3).write.mode("append").parquet(p.docs)
    emb.filter(col("vec_id") % 5 < 3).write.mode("append").parquet(p.embeddings)
    // The quantizer trains on the FULL corpus (offline, as deployed —
    // here the full embedding set is written before wave 2 streams in,
    // matching the one-shot s05's sampling base).
    emb.filter(col("vec_id") % 5 >= 3).write.mode("append").parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)
    // Wave-1 drain: only wave-1 docs exist; embeddings drain fully
    // (either side may run ahead — the contract tolerates it).
    CorpusService.drainAvailable(spark, p)

    // Wave 2 (documents): the rest arrives and drains.
    docs.filter(col("doc_id") % 5 >= 3).write.mode("append").parquet(p.docs)
    CorpusService.drainAvailable(spark, p)

    // Equivalence with the one-shot batch operators on the full corpus.
    assertSameRows(
      StreamingDedup.pairsView(spark, p.pairs),
      Extensions.lshPairs(spark, base)
        .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        .distinct(),
      "streamed shingle pairs vs one-shot LSH")
    assertSameRows(
      StreamingSemanticDedup.pairsView(spark, p.semPairs),
      Extensions.semdedupCells(spark, base)
        .select("vec_a", "vec_b", "cos_ppm"),
      "streamed semantic pairs vs one-shot s05")

    // The unified report covers both modalities' pairs exactly once.
    val report = CorpusService.dedupReport(spark, p).persist()
    try {
      val nVerb = StreamingDedup.pairsView(spark, p.pairs).count()
      val nSem = StreamingSemanticDedup.pairsView(spark, p.semPairs).count()
      val byMod = report.groupBy("modality").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val both = byMod.getOrElse("both", 0L)
      assert(byMod.getOrElse("verbatim", 0L) + both == nVerb,
        s"verbatim coverage: $byMod vs $nVerb")
      assert(byMod.getOrElse("semantic", 0L) + both == nSem,
        s"semantic coverage: $byMod vs $nSem")
      assert(report.count() == report.select("doc_a", "doc_b").distinct().count(),
        "report must hold each pair once")
    } finally report.unpersist()

    // Post-drain compaction bounded every log.
    def dataFiles(dir: String): Int = new java.io.File(dir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    Seq(p.sigs, p.pairs, p.assigns, p.semPairs).foreach { d =>
      assert(dataFiles(d) <= 4, s"$d not compacted: ${dataFiles(d)} files")
    }
  }

  test("always-on corpus service ingests live appends, stops gracefully") {
    val srcDir = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-corpsvc").toString
    val p = CorpusService.Paths(base)
    val docs = graft.Tables.t(spark, srcDir, "documents")
      .select("doc_id", "text", "lang")
    val emb = graft.Tables.t(spark, srcDir, "embeddings")
      .select("vec_id", "embedding")
    // Full corpus on disk before the quantizer trains and the service
    // starts; a LIVE append lands mid-flight on the documents side.
    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(p.docs)
    emb.write.mode("append").parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)

    val running = CorpusService.start(spark, p, interval = "1 second")
    try {
      docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(p.docs)
    } finally running.drainAndStop()

    // The drain-then-stop saw BOTH document waves and all embeddings:
    // state equals the one-shot batch operators on the full corpus.
    assertSameRows(
      StreamingDedup.pairsView(spark, p.pairs),
      Extensions.lshPairs(spark, base)
        .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        .distinct(),
      "live-service shingle pairs vs one-shot LSH")
    assertSameRows(
      StreamingSemanticDedup.pairsView(spark, p.semPairs),
      Extensions.semdedupCells(spark, base)
        .select("vec_a", "vec_b", "cos_ppm"),
      "live-service semantic pairs vs one-shot s05")

    // A restart picks up exactly-once: nothing new → nothing re-appended.
    val rawPairs = spark.read.parquet(p.pairs).count()
    CorpusService.start(spark, p, interval = "1 second").drainAndStop()
    assert(spark.read.parquet(p.pairs).count() == rawPairs,
      "restart without new input must not re-append")
  }
}
