package graft.queries

import graft.Tables
import graft.functions.{DotI64, ImiCells, Portable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The multimodal family (m01–m05): opaque binary payload plumbing,
  * frame sampling, chunk checksums, fingerprint near-dup pairing.
  *
  * One mixin of [[Extensions]] (a pure file split of the original
  * single object — every member still resolves on Extensions.type via
  * the self-type; call sites and the query registry are unchanged). */
private[queries] trait ExtMultimodal { this: Extensions.type =>
  import Portable.{h32, idiv, ppm, P}

  // --------------------------------------------------------------- multimodal

  /** m01: multimodal binary-column plumbing — text re-encoded as an opaque
    * binary blob, features extracted per partition via the Dataset API
    * (the Scala analogue of mapInPandas: batched, executor-side, no
    * driver collect). The "decode" is a deterministic stand-in (md5-based
    * checksum + size-derived shape) because no media codecs ship in this
    * environment; schema/partitioning/batching are the real thing. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    docs(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          md.reset()
          val digest = md.digest(bytes)
          val checksum = digest.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
          MediaFeature(id, bytes.length.toLong, checksum,
            bytes.length % 640L, bytes.length / 1000L + 1L)
        }
      }
      .toDF()
  }

  /** m02: frame sampling plumbing — every 3rd frame index of each media
    * blob (frame count derived from byte length as in m01), exploded to one
    * row per sampled frame with its byte offset and a deterministic frame
    * signature standing in for the decoded feature (no codecs in this
    * environment; the explode/partitioning/batch shape is the real thing).
    * At scale this is the fan-out stage ahead of a mapPartitions decoder:
    * rows stay narrow (ids + offsets), the blob itself is NOT replicated
    * per frame. */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .withColumn("n_frames", idiv(col("n_bytes"), lit(1000L)) + 1)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(3L))).as("frame_id"))
      .select(col("doc_id"), col("frame_id"),
        (col("frame_id") * 1000).as("frame_offset"),
        h32(concat(col("doc_id"), lit(":"), col("frame_id"))).as("frame_sig"))

  /** m04: fingerprint near-duplicate MEDIA pairs — the dedup modality
    * for the binary column, closing the gap m01–m03 left (they are
    * plumbing: decode, frame-sample, checksum; none DEDUPLICATES
    * media). The signature is the audio/video-fingerprinting shape:
    * OVERLAPPING fixed-size windows (64 bytes every 16 — the
    * Shazam-style constellation grain, shift-resistant where one
    * global offset would re-phase a disjoint-slice pHash), each window
    * portable-hashed, and a 64-bit SimHash majority vote over the
    * window hashes (d04's signed-bit-sum shape — one hash aggregation,
    * 64 conditional sums, never a bit cross join). Two payloads
    * sharing most of their byte stream share most windows, so their
    * majority votes agree bit-for-bit almost everywhere — measured on
    * this corpus every emitted pair shares its ENTIRE distinct-window
    * set (hamming 0–3), while unrelated payloads land ~32 apart.
    * Payloads shorter than one window (< 64 B) carry no fingerprint
    * and are excluded, m03's short-payload contract.
    *
    * Pairing is the d12 machinery verbatim (hammingPairsOf: 4-band
    * pigeonhole at radius 3, exact XOR popcount) — one banded
    * self-join shuffled by (band, 16-bit block), never all-pairs;
    * recall within the radius is exact by the pigeonhole.
    * Character-addressed windows for the same reason as m03: the
    * oracle's md5 is VARCHAR-only and this corpus is pure ASCII; on
    * real binary the identical shape runs substr-on-binary + a binary
    * hash kernel. Bits beyond 31 come from a second salted 32-bit
    * hash, d12's sign-bit-portability trick. */
  def mediaPhashPairs(s: SparkSession, dir: String): DataFrame =
    hammingPairsOf(mediaFingerprints(docs(s, dir)), bits = 64, radius = 3)

  /** m04's signature half at FRAME grain — (doc_id, sig) per payload ≥
    * one window. Factored out (the shinglesOfDocs pattern) so the batch
    * operator and the ingest-time streaming cycle
    * (streaming.StreamingFingerprint) derive identical signatures
    * bit-for-bit: the fingerprint is a per-document pure function —
    * unlike MinHash band COLLISIONS or cell assignments it references
    * no corpus-wide state, which is what makes the streaming twin's
    * pair log exactly ≡ the one-shot batch pairing. */
  private[graft] def mediaFingerprints(documents: DataFrame): DataFrame = {
    val wins = documents
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      .filter(col("len") >= 64)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), idiv(col("len") - 64, lit(16L)))).as("k"))
      .withColumn("win", expr("substring(text, CAST(k * 16 + 1 AS INT), 64)"))
      .withColumn("h0", h32(col("win")))
      .withColumn("h1", h32(concat(lit("w1#"), col("win"))))
    val bitSums = (0 until 64).map { b =>
      val h = if (b < 32) col("h0") else col("h1")
      sum(shiftright(h, b % 32) % 2 * 2 - 1).as(s"s$b")
    }
    wins.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
  }

  /** m05: INCREMENTAL media-fingerprint dedup — d10's ingest-cycle
    * shape on the media axis, and the batch-registered twin of
    * StreamingFingerprint.processBatch: only the NEW batch's banded
    * signatures (stand-in: the newest 10% of doc ids, d10's delta
    * convention) probe the full signature table — new×all catches
    * new-vs-existing AND new-vs-new (emitted once, id order) — so the
    * per-cycle cost is O(|batch| + collisions), never m04's full
    * self-join re-paid per cycle. Verification is the exact XOR
    * popcount, same contract as m04; canonical orientation keeps the
    * new doc in `new_doc` (so new-vs-existing pairs where the existing
    * id is larger are NOT re-canonicalized — the arrival order IS the
    * information this report adds over m04's). */
  def phashIncremental(s: SparkSession, dir: String): DataFrame = {
    val banded = bandedFingerprints(
      mediaFingerprints(docs(s, dir)), bits = 64, radius = 3)
    val cutoff = docs(s, dir).agg((max(col("doc_id")) * 9).as("c9"))
    val withCut = banded.crossJoin(broadcast(cutoff))
    val newSide = withCut.filter(col("doc_id") * 10 > col("c9"))
    newSide.as("a")
      .join(withCut.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          (col("b.doc_id") * 10 <= col("b.c9") ||
            col("a.doc_id") < col("b.doc_id")))
      .select(col("a.doc_id").as("new_doc"), col("b.doc_id").as("other_doc"),
        expr("bit_count(a.sig ^ b.sig)").cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
  }

  /** Band-explode a (doc_id, sig) frame into (doc_id, sig, band, bkey)
    * rows — the pigeonhole key derivation hammingPairsOf and the
    * streaming probe share (radius+1 bands; see hammingPairsOf for why
    * minimum bands = widest blocks is optimal). */
  private[graft] def bandedFingerprints(sig: DataFrame,
                                        bits: Int, radius: Int): DataFrame = {
    val nBands = radius + 1
    val bandBits = bits / nBands
    require(bandBits * nBands == bits,
      s"$bits bits do not split into $nBands equal blocks")
    val mask = (1L << bandBits) - 1L
    sig.select(col("doc_id"), col("sig"),
        explode(expr(s"sequence(0, ${nBands - 1})")).as("band"))
      .withColumn("bkey",
        expr(s"shiftright(sig, band * $bandBits) & $mask"))
  }

  /** [[hammingPairsOf]]'s SKEW-SAFE twin — identical output, the
    * pathological-corpus dial. A banded self-join shuffles on
    * (band, bkey); one dominant template at 100 TB (a crawl's boilerplate
    * page, a media file re-encoded a million times) sends its whole
    * cohort to ONE bucket, and that bucket's |n|² comparison runs in ONE
    * task no matter how many executors idle. Salting splits it: the
    * probe side carries a deterministic doc-hash salt, the build side is
    * replicated `salt`× (the standard hot-key trade — `salt`× build
    * shuffle volume buys `salt`-way parallelism on every bucket), and
    * each unordered pair still meets exactly once (the a-row's salt is a
    * function of its doc_id, so exactly one of the b replicas matches).
    * Total comparison work is unchanged — skew salting bounds TASK time,
    * not the quadratic itself; a corpus where the hot cohort is genuine
    * near-duplicates pays that quadratic in any exact-verification
    * scheme. Default path stays unsalted (DedupSpec measures the planted
    * mega-bucket: key-group size drops by the salt factor; row set
    * pinned ≡ unsalted). */
  private[graft] def hammingPairsSkewSafe(sig: DataFrame, bits: Int,
                                          radius: Int,
                                          salt: Int = 16): DataFrame = {
    val banded = bandedFingerprints(sig, bits, radius)
    val a = banded.select(col("band"), col("bkey"),
        col("doc_id").as("id_a"), col("sig").as("sig_a"))
      .withColumn("__salt",
        pmod(xxhash64(col("id_a")), lit(salt.toLong)).cast("int"))
    val b = banded.select(col("band"), col("bkey"),
        col("doc_id").as("id_b"), col("sig").as("sig_b"))
      .crossJoin(sig.sparkSession.range(0, salt)
        .select(col("id").cast("int").as("__salt")))
    a.join(b.hint("shuffle_hash"), Seq("band", "bkey", "__salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        expr("bit_count(sig_a ^ sig_b)").cast("int").as("hamming"))
      .filter(col("hamming") <= radius)
      .distinct()
  }

}
