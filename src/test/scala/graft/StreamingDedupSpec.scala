package graft

import graft.queries.Extensions
import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._

/** Streaming-at-ingest dedup ≡ one-shot batch LSH: documents arrive in
  * waves, each wave probed against everything before it (plus itself,
  * once) — after all waves, the accumulated pair log must equal
  * lshPairs on the full corpus, because every pair is discovered exactly
  * when its later member arrives. Plus exactly-once across re-runs. */
class StreamingDedupSpec extends SparkSpec {

  test("wave-ingested pair log equals one-shot batch LSH on the corpus") {
    val srcDir = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val corpus = s"$base/documents.parquet"
    val (sig, pairs, ckpt) = (s"$base/sigs", s"$base/pairs", s"$base/ckpt")

    val docs = graft.Tables.t(spark, srcDir, "documents")
      .select("doc_id", "text", "lang")
    // Wave 1: first ~60% of docs; wave 2: the rest. Waves are written as
    // separate files into the corpus dir — the stream source sees each
    // append as its own micro-batch input.
    docs.filter(col("doc_id") % 5 < 3).write.mode("append").parquet(corpus)
    StreamingDedup.ingestAvailable(spark, corpus, sig, pairs, ckpt)
    val afterWave1 = StreamingDedup.pairsView(spark, pairs).count()

    docs.filter(col("doc_id") % 5 >= 3).write.mode("append").parquet(corpus)
    StreamingDedup.ingestAvailable(spark, corpus, sig, pairs, ckpt)

    // Equivalence with the one-shot batch computation on the full corpus.
    // lshPairs reads $dir/documents.parquet, so the streamed corpus dir
    // doubles as a Tables-compatible table dir.
    val streamed = StreamingDedup.pairsView(spark, pairs)
    val oneShot = Extensions.lshPairs(spark, base)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
    assertSameRows(streamed, oneShot, "streamed pair log vs one-shot LSH")
    assert(streamed.count() > afterWave1,
      "wave 2 must contribute cross-wave pairs")

    // Exactly-once: no new files → a re-run appends nothing (raw row
    // count, not the distinct view, so silent double-appends would show).
    val rawBefore = spark.read.parquet(pairs).count()
    StreamingDedup.ingestAvailable(spark, corpus, sig, pairs, ckpt)
    assert(spark.read.parquet(pairs).count() == rawBefore,
      "re-run without new documents must not re-append pairs")
  }
}
