package graft

import graft.queries.Extensions
import graft.streaming.{ChunkTable, CorpusService}
import org.apache.spark.sql.functions._

/** Chunk-grain hybrid retrieval — the late-interaction fusion a RAG
  * stack runs: the maintained chunk-posting table must be a pure
  * storage change against one-shot tokenization, the served hybrid's
  * exact-vector dial must equal one-shot s23 row-for-row after
  * wave-partitioned ingestion, and a verbatim phrase must rank its
  * exact source chunk first even when the embedding side is blind to
  * it — the lexical ranker's whole reason to exist at this grain. */
class ChunkHybridSpec extends SparkSpec {

  test("arbitrary-order waves ≡ one-shot chunk postings; replay no-op; compaction") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-cpost").toString
    val corpus = s"$base/corpus"
    val log = s"$base/chunk_postings"
    val docs = Tables.t(spark, src, "documents")
      .select("doc_id", "text", "lang")
    for (k <- Seq(2, 0, 1)) {
      docs.filter(pmod(col("doc_id"), lit(3)) === k).coalesce(1)
        .write.mode("append").parquet(s"$corpus/documents.parquet")
      assert(ChunkTable.maintainPostings(spark, corpus, log) > 0)
    }
    assertSameRows(ChunkTable.postingView(spark, log),
      Extensions.chunkTokens(
        Tables.t(spark, corpus, "documents").select("doc_id", "text")),
      "maintained chunk postings vs one-shot tokenization")
    assert(ChunkTable.maintainPostings(spark, corpus, log) == 0L,
      "nothing new must be a strict no-op")
    assert(ChunkTable.compactPostings(spark, log),
      "quiesced compaction must land")
    assertSameRows(ChunkTable.postingView(spark, log),
      Extensions.chunkTokens(
        Tables.t(spark, corpus, "documents").select("doc_id", "text")),
      "compaction must not change the view")
  }

  test("served chunk-hybrid (exact dial) ≡ one-shot s23 after wave ingestion") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-chyb").toString
    val p = CorpusService.Paths(base)
    val docs = Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
    for (k <- Seq(0, 1)) {
      docs.filter(pmod(col("doc_id"), lit(2)) === k).coalesce(1)
        .write.mode("append").parquet(p.docs)
      assert(CorpusService.maintainChunks(spark, p) > 0)
      assert(CorpusService.maintainChunkVectors(spark, p) > 0)
      CorpusService.refreshChunkIndex(spark, p)
      assert(CorpusService.maintainChunkPostings(spark, p) > 0)
    }
    val queries = Tables.t(spark, base, "documents")
      .filter(col("doc_id") < 10)
      .select(col("doc_id").as("vec_id"), col("text"))
    val oneShot = Extensions.chunkHybrid(spark, base).persist()
    try {
      assertSameRows(
        CorpusService.chunkHybridTopKFor(spark, p, queries,
          excludeSelf = true, vectorExact = true),
        oneShot,
        "served chunk-hybrid (exact dial) vs one-shot s23")
      // The index-served vector dial inherits cell-probe recall; the
      // pin is overlap against the one-shot — the AnnRecallSpec idiom.
      val served = CorpusService.chunkHybridTopKFor(spark, p, queries,
        excludeSelf = true).persist()
      try {
        val inter = served.join(oneShot, Seq("query_id", "neighbor_id"),
          "left_semi").count()
        val total = oneShot.count()
        info(s"indexed chunk-hybrid overlap@10 vs one-shot: $inter/$total")
        assert(inter * 100 >= total * 70,
          s"indexed chunk-hybrid overlap@10 $inter/$total below 0.70 floor " +
            "(measured 0.92 at round 11)")
      } finally served.unpersist()
    } finally oneShot.unpersist()
  }

  test("chunk serving through the index-resident PQ codes (s21 at RAG grain)") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-cpq").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    assert(CorpusService.maintainChunks(spark, p) > 0)
    assert(CorpusService.maintainChunkVectors(spark, p) > 0)
    CorpusService.refreshChunkIndex(spark, p)
    val queries = Tables.t(spark, base, "documents")
      .filter(col("doc_id") < 10)
      .select(col("doc_id").as("vec_id"), col("text"))
    // PQ-coarse recall is bounded below by overlap with the prefix
    // dial over the SAME index (both share probes and the exact
    // rerank; only the coarse scorer differs).
    val prefix = CorpusService.chunkTopKFor(spark, p, queries,
      excludeSelf = true).persist()
    val pqd = CorpusService.chunkTopKFor(spark, p, queries,
      excludeSelf = true, pq = true).persist()
    try {
      val inter = pqd.join(prefix, Seq("query_id", "neighbor_id"),
        "left_semi").count()
      val total = prefix.count()
      info(s"chunk PQ-dial overlap@5 vs prefix dial: $inter/$total")
      assert(inter * 100 >= total * 60,
        s"chunk PQ overlap@5 $inter/$total below 0.60 floor " +
          "(measured 0.90 at round 11)")
    } finally { prefix.unpersist(); pqd.unpersist() }
    // Exact-twin guarantee survives the 4-byte coarse pass: a verbatim
    // passage derives the identical chunk vector, lands in the probed
    // cell, and wins the exact rerank at cos 1e6.
    val ext = Tables.t(spark, base, "documents").filter(col("doc_id") === 3)
      .select((col("doc_id") + 900000).as("vec_id"), col("text"))
    val r1 = CorpusService.chunkTopKFor(spark, p, ext, pq = true)
      .filter(col("rank") === 1).collect()
    assert(r1.length == 1 && r1(0).getAs[Long]("max_cos_ppm") == 1000000L &&
      r1(0).getAs[Long]("neighbor_id") == 3L,
      s"PQ-dial verbatim query lost its exact twin: ${r1.toSeq}")
  }

  test("a verbatim phrase ranks its exact chunk first even when embeddings blur it") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-chyb2").toString
    val p = CorpusService.Paths(base)
    // Eight docs with disjoint vocabularies — one chunk each.
    val docs = (1L to 8L).map { i =>
      (i, (1 to 4).map(j => s"tok${i}_$j").mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    docs.coalesce(1).write.parquet(p.docs)
    assert(CorpusService.maintainChunks(spark, p) == 8L)
    assert(CorpusService.maintainChunkVectors(spark, p) == 8L)
    CorpusService.refreshChunkIndex(spark, p)
    assert(CorpusService.maintainChunkPostings(spark, p) == 8L)
    // The query is a 3-token verbatim PHRASE from doc 5 — not the whole
    // chunk, so its derived chunk hash (and vector) differs from the
    // stored one: the embedding side is blind. The phrase tokens occur
    // in doc 5's chunk alone, so the lexical ranker nails it, and RRF
    // surfaces it at rank 1 over any vector-only candidate.
    val ext = Seq((900001L, "tok5_1 tok5_2 tok5_3")).toDF("vec_id", "text")
    val top = CorpusService.chunkHybridTopKFor(spark, p, ext).persist()
    try {
      val r1 = top.filter(col("rank") === 1).collect()
      assert(r1.length == 1 &&
        r1(0).getAs[Long]("neighbor_id") == 5L * 4096,
        s"verbatim phrase did not rank its exact chunk first: ${r1.toSeq}")
      // Deletion reaches this surface too: after a takedown of doc 5,
      // neither ranker may return its chunks.
      CorpusService.deleteDocs(spark, p, Seq(5L))
      val after = CorpusService.chunkHybridTopKFor(spark, p, ext)
      assert(after.filter(shiftright(col("neighbor_id"), 12) === 5).count() == 0,
        "a deleted doc's chunks were served from the hybrid path")
    } finally top.unpersist()
  }
}
