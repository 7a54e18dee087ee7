package graft

import graft.queries.Extensions
import graft.streaming.StreamingSemanticDedup
import org.apache.spark.sql.functions._

/** Streaming-at-ingest SEMANTIC dedup ≡ one-shot s05 SemDeDup: the
  * quantizer is trained offline on the corpus, then the corpus streams
  * through it wave by wave — after all waves the accumulated pair log
  * must equal semdedupCells on the full corpus at the d05 threshold,
  * because every pair is discovered exactly when its later member
  * arrives. Plus exactly-once across re-runs and log compaction. */
class StreamingSemanticDedupSpec extends SparkSpec {

  private def committedBatches(ckpt: String): Int =
    new java.io.File(s"$ckpt/offsets")
      .listFiles().count(f => f.getName.forall(_.isDigit))

  test("wave-ingested semantic pair log equals one-shot s05 on the corpus") {
    val srcDir = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    val corpus = s"$base/embeddings.parquet"
    val (cent, assign, pairs, ckpt) =
      (s"$base/cents", s"$base/assigns", s"$base/pairs", s"$base/ckpt")

    // Corpus written as 3 files; maxFilesPerTrigger=1 then makes each
    // file its own micro-batch — a 3-wave ingest of a fixed corpus.
    val emb = graft.Tables.t(spark, srcDir, "embeddings")
      .select("vec_id", "embedding")
    (0 until 3).foreach { w =>
      emb.filter(pmod(col("vec_id"), lit(3)) === w)
        .coalesce(1).write.mode("append").parquet(corpus)
    }
    // Offline quantizer training on the corpus (the IVF deployment
    // shape: train once per corpus refresh, stream against the result).
    StreamingSemanticDedup.trainQuantizer(spark, base, cent)

    StreamingSemanticDedup.ingestAvailable(spark, corpus, cent, assign,
      pairs, ckpt, maxFilesPerTrigger = Some(1))
    assert(committedBatches(ckpt) >= 3,
      s"expected >=3 wave batches, got ${committedBatches(ckpt)}")

    // Equivalence with the one-shot batch computation on the full corpus.
    val streamed = StreamingSemanticDedup.pairsView(spark, pairs)
    val oneShot = Extensions.semdedupCells(spark, base)
      .select("vec_a", "vec_b", "cos_ppm")
    assertSameRows(streamed, oneShot, "streamed semantic pairs vs one-shot s05")
    assert(streamed.count() > 0, "corpus must contain semantic near-dups")

    // Exactly-once: no new files → a re-run appends nothing (raw count,
    // so silent double-appends can't hide behind the distinct view).
    val rawBefore = spark.read.parquet(pairs).count()
    StreamingSemanticDedup.ingestAvailable(spark, corpus, cent, assign,
      pairs, ckpt, maxFilesPerTrigger = Some(1))
    assert(spark.read.parquet(pairs).count() == rawBefore,
      "re-run without new embeddings must not re-append pairs")

    // Compaction bounds both logs without changing the views.
    val assignRows = StreamingSemanticDedup.assignTable(spark, assign).count()
    assert(StreamingSemanticDedup.compactLogs(spark, assign, pairs, files = 2),
      "no live writer — both logs must compact")
    def dataFiles(dir: String): Int = new java.io.File(dir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(dataFiles(assign) <= 2 && dataFiles(pairs) <= 2,
      s"compaction must bound files, got assign=${dataFiles(assign)} " +
        s"pairs=${dataFiles(pairs)}")
    assert(StreamingSemanticDedup.assignTable(spark, assign).count() == assignRows,
      "assignment view unchanged by compaction")
    assertSameRows(StreamingSemanticDedup.pairsView(spark, pairs), oneShot,
      "pair view unchanged by compaction")
  }
}
