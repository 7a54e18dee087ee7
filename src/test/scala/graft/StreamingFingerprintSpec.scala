package graft

import graft.queries.Extensions
import graft.streaming.StreamingFingerprint
import org.apache.spark.sql.functions._

/** Ingest-time media-fingerprint dedup ≡ one-shot batch m04: the
  * fingerprint is a per-document pure function and the pigeonhole is
  * deterministic, so the accumulated pair log after any wave partition
  * of the corpus must equal mediaPhashPairs on the full corpus
  * ROW-FOR-ROW (hamming column included — the streaming cycle stores
  * whole signatures, so its verification is exact, not a recall
  * approximation). Plus exactly-once across re-runs and bounded logs. */
class StreamingFingerprintSpec extends SparkSpec {

  test("wave-ingested fingerprint pair log equals one-shot batch m04") {
    val srcDir = sf("sf0.01")
    val base = java.nio.file.Files.createTempDirectory("graft-sfp").toString
    val corpus = s"$base/documents.parquet"
    val (sig, pairs, ckpt) = (s"$base/sigs", s"$base/pairs", s"$base/ckpt")

    val docs = graft.Tables.t(spark, srcDir, "documents")
      .select("doc_id", "text", "lang")
    docs.filter(col("doc_id") % 5 < 3).write.mode("append").parquet(corpus)
    StreamingFingerprint.ingestAvailable(spark, corpus, sig, pairs, ckpt)
    val afterWave1 = StreamingFingerprint.pairsView(spark, pairs).count()

    // Compact between waves: bounded files, views unchanged, and the
    // final equivalence proves ingestion continues correctly on top.
    def dataFiles(dir: String): Int = new java.io.File(dir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    val sigRowsBefore = StreamingFingerprint.sigTable(spark, sig).count()
    assert(StreamingFingerprint.compactLogs(spark, sig, pairs, files = 2),
      "no live writer between waves — both logs must compact")
    assert(dataFiles(sig) <= 2 && dataFiles(pairs) <= 2,
      s"compaction must bound file counts, got sig=${dataFiles(sig)} " +
        s"pairs=${dataFiles(pairs)}")
    assert(StreamingFingerprint.sigTable(spark, sig).count() == sigRowsBefore,
      "signature view unchanged by compaction")
    assert(StreamingFingerprint.pairsView(spark, pairs).count() == afterWave1,
      "pair view unchanged by compaction")

    docs.filter(col("doc_id") % 5 >= 3).write.mode("append").parquet(corpus)
    StreamingFingerprint.ingestAvailable(spark, corpus, sig, pairs, ckpt)

    // Row-for-row equivalence with the one-shot operator on the full
    // corpus (the streamed corpus dir doubles as a Tables-compatible
    // table dir, the StreamingDedupSpec pattern).
    val streamed = StreamingFingerprint.pairsView(spark, pairs)
    assertSameRows(streamed, Extensions.mediaPhashPairs(spark, base),
      "streamed fingerprint pair log vs one-shot m04")
    assert(streamed.count() >= afterWave1,
      "wave-2 ingestion must not lose wave-1 pairs")

    // Exactly-once: a re-run without new document files appends nothing
    // (raw row count, so a silent double-append would show).
    val rawBefore = spark.read.parquet(pairs).count()
    StreamingFingerprint.ingestAvailable(spark, corpus, sig, pairs, ckpt)
    assert(spark.read.parquet(pairs).count() == rawBefore,
      "re-run without new documents must not re-append pairs")

    // The signature table is the cycle's ENTIRE state: one row per
    // fingerprintable (≥ 64 B) document.
    val fingerprintable = docs.filter(length(col("text")) >= 64).count()
    assert(StreamingFingerprint.sigTable(spark, sig).count() == fingerprintable,
      "signature table must hold exactly one row per fingerprintable doc")
  }

  test("cross-wave pair is found when its later member arrives") {
    // A planted near-identical payload pair split across waves: the
    // wave-2 copy must pair with its wave-1 original at hamming 0 —
    // the arrival-time property the always-on form exists for (batch
    // m04 only ever sees the final corpus).
    val base = java.nio.file.Files.createTempDirectory("graft-sfp2").toString
    val corpus = s"$base/documents.parquet"
    val (sig, pairs, ckpt) = (s"$base/sigs", s"$base/pairs", s"$base/ckpt")
    import spark.implicits._
    val payload = ("media payload block " * 20).trim
    Seq((1L, payload, "en"), (2L, "completely different stream of bytes " * 12, "en"))
      .toDF("doc_id", "text", "lang").write.mode("append").parquet(corpus)
    StreamingFingerprint.ingestAvailable(spark, corpus, sig, pairs, ckpt)
    assert(StreamingFingerprint.pairsView(spark, pairs).isEmpty,
      "no pairs among unrelated wave-1 payloads")
    Seq((3L, payload, "en"))
      .toDF("doc_id", "text", "lang").write.mode("append").parquet(corpus)
    StreamingFingerprint.ingestAvailable(spark, corpus, sig, pairs, ckpt)
    val found = StreamingFingerprint.pairsView(spark, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(found.toSeq == Seq((1L, 3L, 0)),
      s"expected the cross-wave copy (1,3) at hamming 0, got ${found.toSeq}")
  }
}
