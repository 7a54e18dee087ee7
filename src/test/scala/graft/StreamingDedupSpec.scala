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

    // Compact both logs BETWEEN waves: file counts become bounded (the
    // coalesce target, not the append count), the views are unchanged,
    // and — proven by the final equivalence below — ingestion continues
    // correctly on top of the compacted logs.
    def dataFiles(dir: String): Int = new java.io.File(dir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    val sigRowsBefore = StreamingDedup.sigTable(spark, sig).count()
    assert(StreamingDedup.compactLogs(spark, sig, pairs, files = 2),
      "no live writer between waves — both logs must compact")
    assert(dataFiles(sig) <= 2 && dataFiles(pairs) <= 2,
      s"compaction must bound file counts, got sig=${dataFiles(sig)} " +
        s"pairs=${dataFiles(pairs)}")
    assert(StreamingDedup.sigTable(spark, sig).count() == sigRowsBefore,
      "signature view unchanged by compaction")
    assert(StreamingDedup.pairsView(spark, pairs).count() == afterWave1,
      "pair view unchanged by compaction")

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

  test("mid-similarity new-new band collisions are not falsely emitted") {
    // Pins the partner-fetch anti-join: a new-new candidate pair whose
    // true Jaccard t is well below the 0.8 gate but which collides in an
    // LSH band. Without the anti-join the partner's shingles enter the
    // verification frame twice (batch + corpus refetch), which inflates
    // measured Jaccard to 2t/(1-t) — for t ≈ 0.57 that is ≈ 2.67, far
    // past the gate — so such pairs were falsely emitted.
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup2").toString
    val corpus = s"$base/documents.parquet"
    val (sig, pairs, ckpt) = (s"$base/sigs", s"$base/pairs", s"$base/ckpt")
    import spark.implicits._
    // 20 disjoint-vocabulary pairs, all in ONE batch (new-new): B_i
    // extends A_i's 10 tokens by 6 → shingle sets 8 ⊂ 14, true Jaccard
    // 8/14 ≈ 0.571 — mid-similarity by construction.
    val docs = (0 until 20).flatMap { i =>
      val baseToks = (0 until 10).map(j => s"w${i}_$j")
      val extToks = (10 until 16).map(j => s"w${i}_$j")
      Seq((2L * i, baseToks.mkString(" "), "en"),
        (2L * i + 1, (baseToks ++ extToks).mkString(" "), "en"))
    }.toDF("doc_id", "text", "lang")
    docs.write.mode("append").parquet(corpus)

    // The construction must actually band-collide, or this test pins
    // nothing (prefix-containment makes collisions likely, not certain —
    // the hash is deterministic, so once observed it stays observed).
    val sh = Extensions.shinglesOfDocs(docs)
    val banded = Extensions.bandedSignatures(sh)
    val collisions = banded.as("a")
      .join(banded.as("b"),
        Extensions.bandEq && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(collisions > 0, "construction must band-collide at least once")

    StreamingDedup.ingestAvailable(spark, corpus, sig, pairs, ckpt)
    val emitted = StreamingDedup.pairsView(spark, pairs).count()
    assert(emitted == 0,
      s"no pair has true Jaccard >= 0.8, but $emitted were emitted")
  }

  test("long docs take the routed verify across waves (batch and store side)") {
    // The streaming cycle's long-doc routing, exercised with REAL long
    // documents (> LongDocVerifyBytes): wave 1 ingests a long doc among
    // short ones (store side grows a long partner), wave 2 brings its
    // long near-dup plus a short near-dup pair — so the routed verify
    // engages its length/multiplicity census long-vs-long ACROSS waves
    // (store probe memo path; at this k the census keeps the pairs on
    // the kernel — routing is perf-only and both routes are exact,
    // which is precisely what this pin holds), and the final log must
    // still equal the one-shot batch LSH, which routes through the
    // same pairJaccard by dir memo.
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup3").toString
    val corpus = s"$base/documents.parquet"
    val (sig, pairs, ckpt) = (s"$base/sigs", s"$base/pairs", s"$base/ckpt")
    import spark.implicits._
    def big(mut: Boolean): String = {
      val toks = (0 until 3000).map(i => s"tok${(i * 7) % 97}w$i")
      (if (mut) toks.updated(123, "MUT") else toks).mkString(" ")
    }
    val shortA = (0 until 40).map(i => s"s$i").mkString(" ")
    val wave1 = Seq(
      (1L, big(mut = false), "en"),
      (2L, shortA, "en"),
      (3L, "unrelated words only here once", "en")).toDF("doc_id", "text", "lang")
    val wave2 = Seq(
      (4L, big(mut = true), "en"),                  // long near-dup of 1
      (5L, shortA.replace("s7 ", "zz "), "en"))     // short near-dup of 2
      .toDF("doc_id", "text", "lang")
    assert(wave1.filter(octet_length(col("text")) >
      Extensions.LongDocVerifyBytes).count() == 1, "fixture long doc too short")

    wave1.write.mode("append").parquet(corpus)
    StreamingDedup.ingestAvailable(spark, corpus, sig, pairs, ckpt)
    wave2.write.mode("append").parquet(corpus)
    StreamingDedup.ingestAvailable(spark, corpus, sig, pairs, ckpt)

    val streamed = StreamingDedup.pairsView(spark, pairs)
      .as[(Long, Long)].collect().toSet
    assert(streamed.contains((1L, 4L)),
      s"cross-wave LONG near-dup pair missing from $streamed")
    assert(streamed.contains((2L, 5L)),
      s"cross-wave SHORT near-dup pair missing from $streamed")
    // One-shot equivalence on the mixed-length corpus (lshPairs probes
    // the same dir-memoized routing — fresh dir, fresh probe).
    val oneShot = Extensions.lshPairs(spark, base)
      .filter(col("jaccard_ppm") >= 800000)
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .as[(Long, Long)].collect().toSet
    assert(streamed == oneShot, s"streamed $streamed != one-shot $oneShot")
  }
}
