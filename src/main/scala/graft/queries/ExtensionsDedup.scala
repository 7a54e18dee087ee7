package graft.queries

import graft.Tables
import graft.functions.{DotI64, ImiCells, Portable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The dedup operator family (d01+) — exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, edit-distance, substring and incremental
  * variants.
  *
  * One mixin of [[Extensions]] (a pure file split of the original
  * single object — every member still resolves on Extensions.type via
  * the self-type; call sites and the query registry are unchanged). */
private[queries] trait ExtDedup { this: Extensions.type =>
  import Portable.{h32, idiv, ppm, P}

  // ------------------------------------------------------------ dedup family

  /** d01: exact dedup by content hash — at 100 TB this is THE cheap first
    * pass: one shuffle on a 128-bit hash, no text comparison. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))

  /** d02: n-gram Jaccard near-dup pairs (threshold 0.8), blocked by lang.
    * The shingle self-join is the textbook exact method; its cost is
    * Σ_s |docs(s)|² — the ORACLE ANCHOR of the Jaccard family, kept for
    * verification and never wired into a job. A job that needs the
    * exact semantics calls [[dedupNgramJaccardBlocked]] (same result,
    * lossless size-bucket block); one that can trade exactness for
    * sub-quadratic candidate generation calls d03's LSH. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val cnt = shingleCounts(sh)
    val common = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
        col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common_shingles"))
    common
      .join(cnt.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard_ppm",
        ppm(col("common_shingles"), col("n_a") + col("n_b") - col("common_shingles")))
      .filter(col("jaccard_ppm") >= 800000)
      .select("doc_a", "doc_b", "common_shingles", "jaccard_ppm")
  }

  /** d14: d02's JOB-CALLABLE form — identical exact-Jaccard output with
    * a LOSSLESS (lang, shingle-count bucket) block folded into the
    * shingle self-join. J(A,B) ≥ 0.8 forces |A|/|B| ∈ [0.8, 1.25]
    * (|A∩B| ≤ min and ≥ t·(|A|+|B|−|A∩B|) ≥ t·max), so only docs in the
    * same or adjacent size bucket (log base 1.25 of the shingle count)
    * can qualify: the per-shingle-group quadratic shrinks to the
    * bucket-pair share — on a corpus of mixed document sizes the bulk of
    * Σ|docs(shingle)|² — while provably losing NO qualifying pair (the
    * oracle is d02's own SQL; DedupSpec pins row-for-row equality too).
    * Blocking is d08's single-sided successor-bucket expansion: the
    * probe side explodes to {b, b+1} and pair order is (bucket, id), so
    * each unordered pair matches exactly once. */
  def dedupNgramJaccardBlocked(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val cnt = shingleCounts(sh)
    val withB = sh.join(cnt, "doc_id").withColumn("szb",
      floor(log(col("n_sh").cast("double")) / math.log(1.25)).cast("long"))
    val probe = withB.withColumn("blk",
      explode(array(col("szb"), col("szb") + 1)))
    val common = probe.as("a").join(withB.as("b"),
        col("a.shingle") === col("b.shingle") &&
        col("a.lang") === col("b.lang") &&
        col("a.blk") === col("b.szb") &&
        (col("a.szb") < col("b.szb") || col("a.doc_id") < col("b.doc_id")))
      .groupBy(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .agg(count(lit(1)).as("common_shingles"))
    common
      .join(cnt.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard_ppm",
        ppm(col("common_shingles"), col("n_a") + col("n_b") - col("common_shingles")))
      .filter(col("jaccard_ppm") >= 800000)
      .select("doc_a", "doc_b", "common_shingles", "jaccard_ppm")
  }

  /** d03: MinHash (16 perms) + LSH (4 bands × 4 rows) candidate pairs with
    * exact Jaccard verification. The band joins are plain equi-joins on the
    * 4-minhash signature — the scalable shape: shuffle by band key, never
    * all-pairs. */
  /** Band-exploded MinHash signature table (16 perms as 4 bands × 4
    * rows): all 16 permutation minima come out of ONE hash aggregation
    * over the shingle rows (map-side combinable) instead of a 16×
    * row-multiplying cross join — same values, 1/16th the shuffled rows.
    * Shared by d03 (full self-join) and d10 (delta-vs-corpus join). */
  private[graft] def bandedSignatures(sh: DataFrame): DataFrame = {
    val shh = sh.withColumn("h", h32(col("shingle")))
    val sigCols = (0 until 16).map { k =>
      min((col("h") * lit(2L * k + 1) + lit(1000003L * k)) % lit(P)).as(s"m$k")
    }
    val sig = shh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    (0 until 4).map { b =>
      sig.select(lit(b).as("band"), col("doc_id"),
        col(s"m${4 * b}").as("b0"), col(s"m${4 * b + 1}").as("b1"),
        col(s"m${4 * b + 2}").as("b2"), col(s"m${4 * b + 3}").as("b3"))
    }.reduce(_ union _)
  }

  /** [[bandedSignatures]] computed from the DOCUMENT frame by the native
    * one-pass kernel (functions.MinhashSig) instead of the exploded
    * shingle aggregation: per doc it is one generated-code call over
    * the raw text — no corpus×shingles rows, no distinct shuffle (min
    * is duplicate-insensitive), no 16-column hash aggregation. Same
    * signatures row-for-row (DedupSpec pins it): the kernel hashes the
    * identical 3-token byte slices with the identical per-permutation
    * transform. Docs with <3 tokens have no shingles and thus no rows,
    * matching the aggregate form. */
  private[graft] def bandedSignaturesOfDocs(d: DataFrame): DataFrame = {
    val sig = d.select(col("doc_id"),
        graft.functions.MinhashSig(col("text")).as("ms"))
      .filter(size(col("ms")) > 0)
    (0 until 4).map { b =>
      sig.select(lit(b).as("band"), col("doc_id"),
        col("ms")(4 * b).as("b0"), col("ms")(4 * b + 1).as("b1"),
        col("ms")(4 * b + 2).as("b2"), col("ms")(4 * b + 3).as("b3"))
    }.reduce(_ union _)
  }

  private[graft] val bandEq = Seq("band", "b0", "b1", "b2", "b3")
    .map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)

  /** The LSH band join's skew dial — [[hammingPairsSkewSafe]]'s twin for
    * the MinHash family (d03/d10/StreamingDedup shuffle on the same
    * (band, signature) keys and share the same one-dominant-template hot
    * bucket at 100 TB): deterministic doc-hash salt on the probe side,
    * build side replicated `salt`×, every unordered candidate still
    * generated exactly once. Emits at CANDIDATE grain (doc_a < doc_b,
    * distinct) — feed [[verifiedJaccard]] exactly like the unsalted
    * path. */
  private[graft] def lshCandidatesSkewSafe(sh: DataFrame,
                                           salt: Int = 16): DataFrame = {
    val banded = bandedSignatures(sh)
    val sigKeys = Seq("band", "b0", "b1", "b2", "b3")
    val a = banded.select((sigKeys.map(col) :+
        col("doc_id").as("id_a")): _*)
      .withColumn("__salt",
        pmod(xxhash64(col("id_a")), lit(salt.toLong)).cast("int"))
    val b = banded.select((sigKeys.map(col) :+
        col("doc_id").as("id_b")): _*)
      .crossJoin(sh.sparkSession.range(0, salt)
        .select(col("id").cast("int").as("__salt")))
    a.join(b.hint("shuffle_hash"), sigKeys :+ "__salt")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .distinct()
  }

  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    // One self-join on (band, 4-minhash signature) over the band-exploded
    // table instead of four separate self-joins: a single shuffle whose
    // identical build/probe exchanges Spark deduplicates (ReuseExchange),
    // where the per-band version shuffled the signature table 8 times.
    // Signatures come from the native per-row kernel and verification
    // runs at PAIR grain against the raw texts (two key-grain joins +
    // one kernel call per candidate) — the exploded distinct shingle
    // frame and its three corpus-wide verify joins are gone from this
    // plan entirely. The per-pair trade: a doc in k candidate pairs
    // re-hashes its shingles k times, row-local CPU bounded by the LSH
    // collision count, bought against two corpus-grain shuffles.
    val banded = bandedSignaturesOfDocs(d)
    val cand = banded.as("a")
      .join(banded.as("b"), bandEq && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("__ta")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("__tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.functions.ShingleJaccardPpm(col("__ta"), col("__tb"))
          .as("jaccard_ppm"))
  }

  /** Token-frequency SimHash at `bits` width (32 or 64). All signed
    * bit-sums come out of ONE hash aggregation over the (doc, token)
    * counts — `bits` conditional-sum columns instead of a row-multiplying
    * bit cross join (same values, 1/bits the aggregated rows and one
    * less shuffle; at sf0.1 this was a 4× win).
    *
    * Bits beyond 31 come from a SECOND salted 32-bit token hash, not a
    * 64-bit hash: the DuckDB twin's hex→BIGINT conversion cannot carry a
    * sign bit, and two independent md5-derived words are exactly as
    * random as one 64-bit word. Bit 63's power-of-two is Long.MinValue —
    * legal in two's complement on both engines (the disjoint-bit sum
    * is a bitwise OR), but the ORACLE must write it as
    * (-9223372036854775807 - 1): DuckDB refuses both `1 << 63` and the
    * raw negative literal. */
  private[graft] def simhashSig(s: SparkSession, dir: String, bits: Int): DataFrame = {
    require(bits == 32 || bits == 64, s"simhash width $bits")
    // Native per-row kernel (functions.SimhashSig) — the aggregate form
    // it replaces (kept below as the spec's equivalence anchor) paid a
    // tokRows explode, a (doc, token)-count shuffle, and a `bits`-column
    // conditional-sum aggregation per document.
    docs(s, dir).select(col("doc_id"),
      graft.functions.SimhashSig(col("text"), bits).as("simhash"))
  }

  /** The exploded-aggregation form of [[simhashSig]] — retained as the
    * independent implementation DedupSpec pins the kernel against
    * (bit-for-bit, both widths), and as the shape the DuckDB oracle
    * mirrors. */
  private[graft] def simhashSigAgg(s: SparkSession, dir: String,
                                   bits: Int): DataFrame = {
    require(bits == 32 || bits == 64, s"simhash width $bits")
    val tokc = tokRows(s, dir).groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("h0", h32(col("tok")))
      .withColumn("h1", h32(concat(lit("w1#"), col("tok"))))
    val bitSums = (0 until bits).map { k =>
      val h = if (k < 32) col("h0") else col("h1")
      sum(col("c") * (shiftright(h, k % 32) % 2 * 2 - 1)).as(s"s$k")
    }
    tokc.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(k => when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** d04: 32-bit SimHash per document (the signature table; d12 pairs at
    * the 64-bit production width — see dedupSimhashPairs). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    simhashSig(s, dir, 32)

  /** SimHash near-dup pairs at `bits` width, Hamming radius ≤ `radius`.
    * Banded pigeonhole join — the d03 band pattern on bit signatures:
    * the signature splits into radius+1 equal blocks, and ≤ radius
    * differing bits cannot touch ALL of them, so at least one block is
    * EQUAL and candidates come from one union'd block-keyed self-join
    * (shuffled by (band, block) — never all-pairs), verified by exact
    * popcount of the XOR. Unlike MinHash banding the pigeonhole is a
    * certainty, not a probability: recall within the Hamming radius is
    * exact.
    *
    * THE BAND COUNT IS THE COST DIAL, AND MINIMUM IS OPTIMAL: radius+1
    * bands is the fewest the pigeonhole allows, which makes each block
    * key as WIDE as possible. At 64 bits / radius 3 that is 4 bands of
    * 16 bits — 65536 buckets per band, expected bucket size < 1 at
    * sf0.1's 50k docs — where a byte-per-band split (8 bands × 256
    * buckets, ~195 docs each) pays Σ|bucket|² ≈ tens of millions of
    * candidate pairs over near-uniform signature bytes: measured 6.5 s
    * vs 1.8 s steady at sf0.1 for the SAME 373 output rows — the
    * pigeonhole guarantee does not depend on the split. Extra bands
    * would only buy probabilistic recall BEYOND the radius, which d12
    * does not claim. Block extraction is
    * (sig >> bandBits·k) & (2^bandBits − 1) — sign-safe at 64 bits on
    * both engines (the arithmetic shift's sign-extension is masked
    * off); the popcount filter is row-local below the pair-grain
    * distinct, so the only pair-grain shuffle carries radius survivors. */
  private[graft] def simhashPairsAt(s: SparkSession, dir: String,
                                    bits: Int, radius: Int): DataFrame =
    hammingPairsOf(simhashSig(s, dir, bits).withColumnRenamed("simhash", "sig"),
      bits, radius)

  /** The banded-pigeonhole Hamming pair join over ANY (doc_id, sig)
    * bit-signature frame — the verification-and-join half of d12,
    * factored out so every fixed-width signature family (token SimHash
    * d12, media perceptual hash m04) shares one join shape.
    *
    * Bands via EXPLODE, not a union of per-band projections: union
    * branches do not share work, so a 4-branch union re-evaluated the
    * signature derivation once PER BAND per join side — after the
    * banding fix this was the remaining dominant cost (measured
    * 3.5 s → 1.8 s at sf0.1 from this alone). The explode is a narrow
    * row fan-out above ONE derivation, and the self-join's two sides
    * then share it through exchange reuse (the d03 pattern). */
  private[graft] def hammingPairsOf(sig: DataFrame,
                                    bits: Int, radius: Int): DataFrame = {
    val banded = bandedFingerprints(sig, bits, radius)
    // SHUFFLE join by construction, not broadcast. Two reasons, one
    // honest measurement: (a) at 100 TB the signature frame outgrows
    // any broadcast threshold, so the shuffle form is the only sound
    // plan — the hint makes the test-scale plan and the scale plan the
    // SAME plan instead of a shape that silently flips at a size
    // boundary; (b) at test scale it is also measurably faster
    // (~0.82 s vs ~0.92 s steady-state for m04 at sf0.1, alternating
    // A/B in one JVM): the broadcast plan pays a driver-side
    // HashedRelation build of the banded frame on every invocation.
    // (Exchange reuse does NOT fire on this self-join either way — the
    // analyzer's right-side re-aliasing keeps the two subtrees from
    // canonicalizing equal — so the signature aggregation runs once
    // per side under both shapes; the delta is the build path alone.)
    banded.as("a")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast("int"))
      .filter(col("hamming") <= radius)
      .select("doc_a", "doc_b", "hamming")
      .distinct()
      // A corpus with ONE dominant template makes a (band, bkey) bucket
      // hot — its |n|² comparison lands in one task. The skew dial is
      // [[hammingPairsSkewSafe]]: same rows, salted probe side.
  }

  /** d12: SimHash near-dup PAIRS at the PRODUCTION setting — 64-bit
    * signature, Hamming ≤ 3, 4-block pigeonhole (Manku et al.'s
    * near-duplicate web-crawl configuration). Round 6 shipped this at
    * 32 bits and documented the precision cost honestly (725 pairs at
    * sf0.01 — short same-vocabulary documents land within radius 3 of
    * each other constantly on a coarse signature); doubling the width
    * squares the chance-collision odds per bit and DedupSpec pins the
    * measured effect: the 64-bit pair set is a small fraction of the
    * 32-bit one, in line with d03's verified near-dup count. 32-bit
    * remains available as the comparison dial (simhashPairsAt). */
  def dedupSimhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairsAt(s, dir, bits = 64, radius = 3)

  /** d05: embedding near-dup pairs by quantized cosine ≥ 0.35. Brute-force
    * all-pairs (exact baseline); s02 is the bucketed scale path. */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("s2").as("sa"))
    val b = e.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("s2").as("sb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .filter(col("cos_ppm") >= 350000)
      .select("vec_a", "vec_b", "cos_ppm")
  }

}
