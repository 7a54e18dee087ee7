package graft.queries

import graft.Tables
import graft.functions.{DotI64, ImiCells, Portable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extracted media features for the multimodal plumbing demo (m01). */
case class MediaFeature(doc_id: Long, n_bytes: Long, checksum32: Long,
                        frame_width: Long, n_frames: Long)

/** Large-scale training-data pipeline operators (BASELINE.json north star):
  * deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
  * text analysis (token stats, quality, language-ID, fingerprint), and
  * multimodal binary-column plumbing — all over `documents`/`embeddings`.
  *
  * Oracle portability: every similarity number is integer (parts-per-million)
  * or computed from exact integers with single IEEE ops (sqrt/div), so the
  * DuckDB twin is bit-identical — see graft.functions.Portable.
  *
  * Scale posture per operator is noted inline; the common theme: candidate
  * generation (LSH bands, hash buckets) turns O(n²) pairwise work into
  * equi-joins that shuffle-partition by bucket key, which is the only shape
  * that survives 100 TB.
  */
object Extensions {
  import Portable.{h32, idiv, ppm, P}

  // ---------------------------------------------------------------- builders

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")

  /** doc_id, lang, t = whitespace tokens. */
  private def toks(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), col("lang"),
      split(col("text"), " ").as("t"))

  /** One row per token occurrence with 1-based position. */
  private def tokRows(s: SparkSession, dir: String): DataFrame =
    toks(s, dir)
      .select(col("doc_id"), col("lang"), posexplode(col("t")))
      .select(col("doc_id"), col("lang"), (col("pos") + 1).as("pos"),
        col("col").as("tok"))

  /** Distinct 3-gram word shingles per doc (same-lang blocking key kept).
    * Frame-grain so the streaming dedup path can shingle a micro-batch
    * (streaming.StreamingDedup) with the identical definition. */
  private[graft] def shinglesOfDocs(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("lang"),
        explode(expr(
          """CASE WHEN size(t) < 3 THEN CAST(array() AS array<string>)
            |ELSE transform(sequence(0, size(t) - 3),
            |               i -> concat_ws(' ', t[i], t[i+1], t[i+2])) END"""
            .stripMargin)).as("shingle"))
      .distinct()

  private def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesOfDocs(docs(s, dir))

  private def shingleCounts(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))

  /** t06's content-hash split bucket (0–99), shared by every operator
    * that partitions on the deterministic train/valid/test assignment. */
  private def splitBucket = h32(col("text")) % 100

  /** Exact-Jaccard verification of candidate pairs against the true
    * shingle sets — the shared tail of d03 and d10 (column names of the
    * pair frame differ, arithmetic does not).
    *
    * The set-size aggregation (shingleCounts) deliberately runs over the
    * FULL shingle frame, not a candidate-restricted one. It looks like a
    * scale smell, but it is map-side combinable — the shuffle carries
    * one row per document, and the scan it rides is shared with the
    * pair-join branches — whereas restricting it needs the candidate id
    * set, whose derivation re-evaluates the banded-join subtree (the
    * heaviest stage here) two more times: measured +35% on t13 at sf0.1
    * for a second-order shuffle saving. Candidate-grain restriction is
    * the wrong trade as long as candidates come from a join over the
    * same lineage; it becomes right only when the candidate set arrives
    * MATERIALIZED (the streaming path's batch frame — which already
    * passes only batch + partner shingles in). */
  private[graft] def verifiedJaccard(cand: DataFrame, sh: DataFrame,
                              aCol: String, bCol: String): DataFrame = {
    val common = cand
      .join(sh.as("a"), col(aCol) === col("a.doc_id"))
      .join(sh.as("b"),
        col(bCol) === col("b.doc_id") && col("a.shingle") === col("b.shingle"))
      .groupBy(aCol, bCol).agg(count(lit(1)).as("c"))
    val cnt = shingleCounts(sh)
    cand.join(common, Seq(aCol, bCol), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .join(cnt.select(col("doc_id").as(aCol), col("n_sh").as("n_a")), aCol)
      .join(cnt.select(col("doc_id").as(bCol), col("n_sh").as("n_b")), bCol)
      .withColumn("jaccard_ppm",
        ppm(col("c"), col("n_a") + col("n_b") - col("c")))
      .select(aCol, bCol, "jaccard_ppm")
  }

  /** Embeddings quantized to integer parts-per-million so every sum is
    * exact and order-free (float accumulation order differs between
    * engines; integer sums cannot). Frame form shared with the streaming
    * semantic-dedup path so batch and stream agree bit-for-bit. */
  private[graft] def quantizeFrame(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT))")
        .as("q"))
      .withColumn("s2", DotI64(col("q"), col("q")))

  private def quantized(s: SparkSession, dir: String): DataFrame =
    quantizeFrame(Tables.t(s, dir, "embeddings"))

  /** Integer dot product via the native codegen Expression (DotI64):
    * higher-order functions (zip_with/aggregate) fall out of whole-stage
    * codegen and allocate per-pair arrays — on an O(n²) pair join that
    * interpreted fold dominated the profile at sf0.1. */
  private def dot: org.apache.spark.sql.Column = DotI64(col("qa"), col("qb"))

  /** cos * 1e6 rounded to integer, from exact integer dot/norms; the only
    * float ops are sqrt/div/floor on identical inputs → identical output. */
  private val cosPpm =
    floor(col("dot") / (sqrt(col("sa")) * sqrt(col("sb"))) * lit(1000000.0) + lit(0.5))
      .cast("long")

  /** The FLAT √n-centroid seed frame — now s14's k-means operator
    * only (clustering a corpus into √n Lloyd-refined groups is that
    * query's own spec): every IVF/index/dedup path assigns through the
    * two-level [[coarseCodebooks]] instead, which keeps driver-side
    * state at 2·∜n rows. The √n analysis below holds for s14's
    * regime — a clustering job whose output IS the k=√n centroid set —
    * not as an "any corpus size" broadcastability claim: at 10¹²
    * vectors this frame is ~0.5 GB, which is exactly why the IVF
    * family moved off it.
    *
    * CARDINALITY IS THE LOAD-BEARING CHOICE. A fixed sampling stride
    * (an earlier revision used every-50th-vector) makes |centroids|
    * LINEAR in the corpus: at a billion vectors that is 20M centroids —
    * too big to broadcast, and the assignment crossJoin degenerates to
    * O(n²/stride) dot products, the exact quadratic class IVF exists to
    * avoid. Real IVF keeps k sublinear; √n balances the two costs that
    * pull against each other — assignment work n·k and per-probe cell
    * scans n/k — both O(n^1.5) total / O(√n) per query at k = √n. The
    * stride is derived from a count(*) (parquet metadata, no data scan)
    * and vectors are sampled by the portable 32-bit hash of their id —
    * stable under non-dense / non-uniform id spaces where a raw
    * `id % stride` would oversample or miss entirely.
    *
    * The centroid frame is √n rows of d ints: ~32k centroids × 768 dims
    * × 8 B ≈ 200 MB at a billion vectors — still a broadcastable dim
    * table, where the linear policy's 20M × 768 × 8 B ≈ 123 GB is not.
    *
    * The √n stride needs ONE count per directory, memoized: counting at
    * every plan CONSTRUCTION (s03/s05/s07 and each spec/bench iteration
    * re-construct plans) ran a full count job each time — and through
    * the quantized() projection at that, not the raw scan. The memoized
    * count runs over the bare embeddings table column-pruned to nothing,
    * which parquet row-group metadata answers without a data scan. */
  private val corpusCount =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Drop the memoized corpus count for `dir` — REQUIRED before
    * re-deriving the quantizer over a corpus that has GROWN since the
    * count was taken (the memo assumes static table dirs; a stale count
    * silently freezes the √n stride). StreamingSemanticDedup.retrain
    * calls this; static-testdata callers never need to. */
  private[graft] def invalidateCorpusCount(dir: String): Unit = {
    corpusCount.remove(dir)
    booksCache.remove(dir)
  }
  private def coarseCentroids(s: SparkSession, dir: String,
                              e: DataFrame): DataFrame = {
    val n: Long = corpusCount.computeIfAbsent(dir,
      _ => Tables.t(s, dir, "embeddings").count())
    val stride = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
    e.filter(h32(col("vec_id").cast("string")) % stride === 0)
      .select(col("vec_id").as("cent_id"), col("q").as("qc"), col("s2").as("sc"))
  }

  /** One Bloom sketch broadcast per cache key (d09: dir; t16:
    * dir + "#test8") — see contamination / corpusDecontaminated. Keys
    * are PREFIXED with the owning SparkContext's applicationId: a
    * session stopped and rebuilt in the same JVM must not serve a dead
    * context's broadcast to its executors (it fails remotely, long
    * after the cause). */
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    String,
    org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]]()

  private def bloomKey(s: SparkSession, key: String): String =
    s.sparkContext.applicationId + "@@" + key

  /** Drop every memoized Bloom sketch for `dir` (across contexts and
    * the d09/t16 key variants) — REQUIRED before querying a corpus that
    * has grown since the sketch was built: a stale sketch silently
    * drops NEW grams below the exact join, and Bloom false negatives
    * are MISSED CONTAMINATION (the one error class the pre-pass
    * contract forbids). Mirror of invalidateCorpusCount; any
    * corpus-refresh path should call both (plus invalidateAnnIndex). */
  private[graft] def invalidateBloom(dir: String): Unit =
    bloomCache.keySet.removeIf(k => k.split("@@", 2).last.startsWith(dir))

  private[graft] def bloomCacheKeys: Set[String] = {
    import scala.jdk.CollectionConverters._
    bloomCache.keySet.asScala.toSet
  }

  /** Distinct verbatim 8-token windows of a document frame — the gram
    * generator d09/t16 and the ingest-time contamination gate
    * (streaming.StreamingContamination) share, so batch and stream
    * agree bit-for-bit. Every non-`text` column is carried through
    * (d09/t16 ride the split bucket alongside doc_id). */
  private[graft] def grams8OfDocs(d: DataFrame): DataFrame = {
    val keep = d.columns.filter(_ != "text").map(col).toSeq
    d.withColumn("t", split(col("text"), " "))
      .select(keep :+ explode(expr(
        """CASE WHEN size(t) < 8 THEN CAST(array() AS array<string>)
          |ELSE transform(sequence(0, size(t) - 8),
          |  i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
          |                 t[i+4], t[i+5], t[i+6], t[i+7])) END"""
          .stripMargin)).as("gram"): _*)
      .distinct()
  }

  /** The distinct (doc, split-bucket, 8-gram) frame d09 and t16 share:
    * every verbatim 8-token window of every document, tagged with the
    * document's deterministic train/valid/test bucket. */
  private def grams8(s: SparkSession, dir: String): DataFrame =
    grams8OfDocs(docs(s, dir)
      .select(col("doc_id"), splitBucket.as("bucket"), col("text")))

  /** Broadcast-Bloom pre-filter of a gram frame against a REFERENCE gram
    * set: the sketch is built once on the reference side (the small
    * side — an eval suite in production), memoized under `refKey`
    * (application-scoped, invalidateBloom drops it), and `g`'s rows are
    * filtered to possible members BELOW whatever exact join the caller
    * puts above — no false negatives (Bloom never rejects a member),
    * false positives rejected by that exact join. The d09/t16 asymmetry,
    * factored for every consumer including the streaming gate. */
  private[graft] def bloomFiltered(s: SparkSession, refKey: String,
                                   refGrams: => DataFrame,
                                   g: DataFrame): DataFrame = {
    val bloomB = bloomCache.computeIfAbsent(bloomKey(s, refKey), { _ =>
      val ref = refGrams.persist()
      val bloom = try {
        val n = ref.count()
        ref.stat.bloomFilter("gram", math.max(n, 1000L), 0.01)
      } finally ref.unpersist()
      s.sparkContext.broadcast(bloom)
    })
    val mightContain = udf((gr: String) =>
      gr != null && bloomB.value.mightContainString(gr))
      .withName("bloom_might_contain")
    g.filter(mightContain(col("gram")))
  }

  /** Per-document contamination of a corpus against an EXTERNAL
    * reference suite (refDir — its own documents table, e.g. a held-out
    * benchmark): documents sharing ≥1 verbatim 8-gram with any
    * reference document, with the shared-gram count. d09 audits WITHIN
    * one corpus (train vs test split); this is the cross-corpus form a
    * deployment runs against each eval suite it must protect, and the
    * one-shot twin of the ingest-time gate
    * (streaming.StreamingContamination — spec-pinned ≡). Bloom on the
    * reference side (fixed, small), exact gram join above it. */
  def contaminationAgainst(s: SparkSession, corpusDir: String,
                           refDir: String): DataFrame = {
    val refGrams = grams8OfDocs(
        Tables.t(s, refDir, "documents").select("doc_id", "text"))
      .select("gram").distinct()
    val g = grams8OfDocs(docs(s, corpusDir).select("doc_id", "text"))
    bloomFiltered(s, refDir + "#refgrams", refGrams, g)
      .join(refGrams, "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_hit_grams"))
  }

  /** DuckDB twin of coarseCentroids' sampling predicate — s14's k-means
    * oracle only (the flat √n seed set is that operator's own spec);
    * every IVF-family oracle mirrors the two-level assigner via
    * [[imiCtes]] instead. */
  private val centsCte: String =
    """cents AS (
      |  SELECT vec_id FROM embeddings
      |  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
      |        % (SELECT GREATEST(1, CAST(floor(sqrt(count(*))) AS BIGINT))
      |           FROM embeddings) = 0),
      |""".stripMargin

  /** DuckDB twin of [[coarseCodebooks]] + the per-half scoring chain
    * every IMI oracle shares: dense-numbered sub-codebooks (top-k by
    * (h32, id) per sub, salt "b" for sub 1 — same hash, same
    * sqrt(sqrt(n)) sizing, both engines' sqrt being IEEE-exact where
    * pow(n, 0.25) is not), half-split rows with within-half index j,
    * per-half integer-cosine scoring against the matching sub-codebook,
    * and the per-(vector, sub) rank hrank. Heavy frames MATERIALIZED —
    * hev feeds both sides of the book-dot join and hrank both sides of
    * the product-cell join, so default inlining would re-run the chain
    * multiplicatively (the d13 lesson). */
  private val imiCtes: String =
    """dims AS (SELECT MAX(i) AS d FROM ev),
      |books AS MATERIALIZED (
      |  SELECT sub, vec_id,
      |         row_number() OVER (PARTITION BY sub ORDER BY h, vec_id) - 1 AS cent_id
      |  FROM (
      |    SELECT 0 AS sub, vec_id,
      |           ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
      |    FROM embeddings
      |    UNION ALL
      |    SELECT 1 AS sub, vec_id,
      |           ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || 'b'), 1, 8))::BIGINT AS h
      |    FROM embeddings)
      |  QUALIFY cent_id < (SELECT GREATEST(2, CAST(floor(sqrt(sqrt(count(*)))) AS BIGINT))
      |                     FROM embeddings)),
      |hev AS MATERIALIZED (
      |  SELECT e.vec_id, CASE WHEN e.i <= d.d // 2 THEN 0 ELSE 1 END AS sub,
      |         CASE WHEN e.i <= d.d // 2 THEN e.i ELSE e.i - d.d // 2 END AS j,
      |         e.v
      |  FROM ev e, dims d),
      |hsq AS MATERIALIZED (
      |  SELECT vec_id, sub, CAST(SUM(v * v) AS BIGINT) AS s2h
      |  FROM hev GROUP BY 1, 2),
      |hrank AS MATERIALIZED (
      |  SELECT vec_id, sub, cent_id,
      |         row_number() OVER (PARTITION BY vec_id, sub
      |           ORDER BY cos_ppm DESC, cent_id ASC) AS hr
      |  FROM (
      |    SELECT d.vec_id, d.sub, d.cent_id,
      |           CAST(floor(d.dot / (sqrt(x.s2h) * sqrt(y.s2h)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
      |    FROM (
      |      SELECT a.vec_id, bk.sub, bk.cent_id, bk.vec_id AS bvec,
      |             CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |      FROM hev a
      |      JOIN books bk ON bk.sub = a.sub
      |      JOIN hev b ON b.vec_id = bk.vec_id AND b.sub = bk.sub AND b.j = a.j
      |      GROUP BY 1, 2, 3, 4) d
      |    JOIN hsq x ON x.vec_id = d.vec_id AND x.sub = d.sub
      |    JOIN hsq y ON y.vec_id = d.bvec AND y.sub = d.sub) t),
      |""".stripMargin

  /** Product-cell ranking over [[imiCtes]]'s hrank: top `perHalf` per
    * half, cell = sub₀·2²⁰ + sub₁, ranked (hr₀+hr₁, hr₀, cell) — the
    * [[imiRank]] twin. `extra` restricts the vector side (probe
    * queries). */
  private def imiCellsCte(name: String, perHalf: Int,
                          extra: String = ""): String =
    s"""$name AS MATERIALIZED (
       |  SELECT a.vec_id, a.cent_id * 1048576 + b.cent_id AS cell,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY a.hr + b.hr, a.hr, b.cent_id) AS rn
       |  FROM hrank a JOIN hrank b
       |    ON b.vec_id = a.vec_id AND a.sub = 0 AND b.sub = 1
       |  WHERE a.hr <= $perHalf AND b.hr <= $perHalf$extra),
       |""".stripMargin

  /** The serving-family assignment block: unique cell per corpus vector
    * (`assigned`), probe fan for the vec_id < 10 query rows (`probes`,
    * `nprobe` cells of the 25-cell P=5 product ranking). */
  private def imiAssignProbeCtes(nprobe: Int): String =
    imiCtes + imiCellsCte("acells", 1) +
      imiCellsCte("pcells", 5, " AND a.vec_id < 10") +
      s"""assigned AS (SELECT vec_id AS neighbor_id, cell FROM acells WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, cell FROM pcells WHERE rn <= $nprobe),
         |""".stripMargin

  /** The dedup-family assignment block: s05's 4-cell multi-assignment
    * as the top-2 × top-2 product. */
  private val imiAssign4Ctes: String =
    imiCtes + imiCellsCte("acells", 2) +
      """assigned AS MATERIALIZED (
        |  SELECT vec_id, cell FROM acells WHERE rn <= 4),
        |""".stripMargin

  /** One greedy round of the s22 oracle's MMR unroll: from the pool
    * minus everything selected so far, pick the per-query argmax of
    * 7·rel − 3·max-sim-to-selected (ties by candidate id), and extend
    * the running selection. Mirrors the Spark loop round-for-round. */
  private def mmrRoundSql(k: Int): String =
    s"""sel$k AS MATERIALIZED (
       |  SELECT query_id, cand, rel, $k AS mmr_rank FROM (
       |    SELECT r.query_id, r.cand, r.rel,
       |           row_number() OVER (PARTITION BY r.query_id
       |             ORDER BY 7 * r.rel - 3 * COALESCE(m.maxsim, 0) DESC,
       |                      r.cand) AS rn
       |    FROM (SELECT p.* FROM pool p
       |          WHERE NOT EXISTS (SELECT 1 FROM selall${k - 1} s
       |                            WHERE s.query_id = p.query_id
       |                              AND s.cand = p.cand)) r
       |    LEFT JOIN (
       |      SELECT ps.query_id, ps.a AS cand, MAX(ps.sim) AS maxsim
       |      FROM ps JOIN selall${k - 1} s
       |        ON s.query_id = ps.query_id AND s.cand = ps.b
       |      GROUP BY 1, 2) m
       |    ON m.query_id = r.query_id AND m.cand = r.cand) t
       |  WHERE rn = 1),
       |selall$k AS MATERIALIZED (
       |  SELECT * FROM selall${k - 1} UNION ALL SELECT * FROM sel$k),
       |""".stripMargin

  /** One round of the d13 oracle's iterative min-label connected
    * components (the non-recursive twin of the Spark fixpoint): node x's
    * label becomes min over its own label, its neighbors' labels, and
    * its LABEL's label (pointer doubling — coverage grows geometrically
    * per round where plain neighbor propagation grows by one hop).
    * Linear work per round: one label row per node survives the GROUP
    * BY, unlike a recursive closure's (node, reachable-label) relation.
    * MATERIALIZED is load-bearing: each round references its
    * predecessor three times, so DuckDB's default CTE inlining would
    * expand the 7-round chain 3^7-fold (observed as a file-handle
    * blowup re-opening the parquet scan). */
  private def ccRoundSql(k: Int): String =
    s"""l$k AS MATERIALIZED (
       |  SELECT t.doc_id, MIN(t.lab) AS lab FROM (
       |    SELECT doc_id, lab FROM l${k - 1}
       |    UNION ALL
       |    SELECT e.doc_a AS doc_id, l.lab FROM e JOIN l${k - 1} l ON l.doc_id = e.doc_b
       |    UNION ALL
       |    SELECT a.doc_id, b.lab FROM l${k - 1} a JOIN l${k - 1} b ON b.doc_id = a.lab
       |  ) t GROUP BY 1),
       |""".stripMargin

  /** The coarse quantizer's TRAINED state as a writable frame — what an
    * offline quantizer-training job materializes for the streaming
    * semantic-dedup path to probe against (IVF systems train the
    * quantizer offline and stream assignments against it). Same
    * two-level codebook rule as coarseCodebooks, so a stream probing
    * this table and a one-shot s05 over the same corpus agree exactly. */
  private[graft] def trainedCentroids(s: SparkSession, dir: String): DataFrame =
    coarseCodebooks(s, dir, quantized(s, dir))

  /** Per-(vector, centroid) cosine with rank 1 = nearest cell over a
    * FLAT full-width centroid frame — retained for s14's k-means
    * operator (Lloyd refinement of √n seeds is that query's own spec);
    * every IVF/index/dedup path assigns through [[imiRank]]'s two-level
    * codebook instead, whose driver-side state stays ~∜n rows at any
    * corpus size. */
  private[graft] def centroidRank(v: DataFrame, cents: DataFrame,
                           idCol: String): DataFrame =
    v.crossJoin(broadcast(cents))
      .withColumn("dot", DotI64(col("q"), col("qc")))
      .withColumn("cos_ppm",
        floor(col("dot") / (sqrt(col("s2")) * sqrt(col("sc"))) * lit(1000000.0) + lit(0.5))
          .cast("long"))
      .withColumn("rn", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("cos_ppm").desc, col("cent_id").asc)))

  /** Cell-id packing for the two-level (IMI-style) coarse quantizer:
    * cell = subcell₀ · 2²⁰ + subcell₁. Sub-codebooks are dense-numbered
    * from 0, so any codebook below 2²⁰ entries (a ~10²⁴-vector corpus)
    * packs collision-free into one BIGINT — the cell stays an ordinary
    * long join/partition key for every downstream consumer. */
  private[graft] val CellBase = 1048576L

  /** Spark-side slice expressions for the two vector halves (the IMI
    * subspaces). Integer `div` keeps odd dims correct: sub 0 takes
    * ⌊d/2⌋ dims, sub 1 the remainder. */
  private val sliceH0 = "slice(q, 1, size(q) div 2)"
  private val sliceH1 = "slice(q, (size(q) div 2) + 1, size(q) - (size(q) div 2))"

  /** The TWO-LEVEL coarse quantizer both IVF serving and semantic dedup
    * share (the inverted-multi-index construction, Babenko & Lempitsky
    * 2012): the vector space is split into two halves, each half gets
    * its own sub-codebook of k = max(2, ⌊∜n⌋) corpus-sampled
    * half-vectors, and a cell is a PAIR of sub-cell ids — ~√n effective
    * cells from 2·∜n stored rows.
    *
    * CARDINALITY IS THE LOAD-BEARING CHOICE, second iteration. The flat
    * predecessor held k = √n full-width centroids: per-cell density and
    * assignment-vs-probe balance were right (√n cells), but the
    * codebook itself grew as √n rows — ~0.5 GB to broadcast at 10¹²
    * vectors — and every (re)build paid an n·√n assignment pass, the
    * measured n^1.5 class (the old t26 exponent). The product structure
    * keeps the SAME ~√n cell count (so per-cell scan cost, probe recall
    * geometry, and every downstream cell-blocked join are unchanged in
    * shape) while the driver-side state drops to 2·∜n rows (~2·10³ at
    * 10¹² vectors — broadcastable at any realistic corpus size, with
    * the regime bound now explicit: collision-free packing holds to 2²⁰
    * entries per sub-codebook) and assignment work drops to n·2·∜n
    * half-width dots — out of the n^1.5 class entirely.
    *
    * Sub-codebook entries are chosen by portable-hash ORDER (the k
    * smallest (h32(id), id) per sub, salt "b" giving sub 1 an
    * independent order) rather than the old modulo stride: same
    * determinism, exactly-k entries with no sampling variance, and no
    * empty-codebook edge at small n. The top-k is a distributed
    * TakeOrdered, never a global sort. */
  private[graft] def coarseCodebooks(s: SparkSession, dir: String,
                                     e: DataFrame): DataFrame = {
    val n: Long = corpusCount.computeIfAbsent(dir,
      _ => Tables.t(s, dir, "embeddings").count())
    codebooksFrom(e, n)
  }

  /** The codebook builder over an explicit already-quantized frame —
    * the chunk-grain index trains through this (its vectors never sit
    * in an embeddings table). k = max(2, ⌊√√n⌋): two IEEE sqrts, which
    * are correctly rounded in every engine, where pow(n, 0.25) is not —
    * the DuckDB twin must land on the identical k. The floor is 2, not
    * 4: the product of floored codebooks is 4 cells, which the
    * 12-probe fan still covers COMPLETELY, so a tiny corpus (planted
    * spec fixtures, a service's first wave) serves with exact recall —
    * a higher floor would mint more cells than probes at small n and
    * lose vectors a probe never visits. */
  private[graft] def codebooksFrom(e: DataFrame, n: Long): DataFrame = {
    val k = math.max(2L,
      math.floor(math.sqrt(math.sqrt(n.toDouble))).toLong).toInt
    def book(sub: Int, salt: String, slice: String) =
      e.select(col("vec_id"), expr(slice).as("qc"))
        .withColumn("__h",
          h32(concat(col("vec_id").cast("string"), lit(salt))))
        .orderBy(col("__h").asc, col("vec_id").asc)
        .limit(k)
        .select(lit(sub).as("sub"), col("vec_id"), col("__h"), col("qc"))
    val w = Window.partitionBy(col("sub"))
      .orderBy(col("__h").asc, col("vec_id").asc)
    book(0, "", sliceH0).unionByName(book(1, "b", sliceH1))
      .withColumn("cent_id", (row_number().over(w) - 1).cast("long"))
      .withColumn("sc", DotI64(col("qc"), col("qc")))
      .select("sub", "cent_id", "qc", "sc")
  }

  /** The sub-codebooks COLLECTED to the driver — ~2·∜n rows of
    * (dense id, half-vector, norm) per side, the broadcast-ADC size
    * class (∜10¹² ≈ 10³ rows of 32 longs ≈ 0.25 MB). Collecting them
    * is what lets [[imiRankB]] run cell assignment as a PURE NARROW
    * MAP: the codebooks ride inside the [[graft.functions.ImiCells]]
    * expression as plain JVM arrays — zero joins, zero shuffles, zero
    * windows in the assignment itself (the flat predecessor paid a
    * broadcast cross join plus an n·√n-row ranking window; the first
    * IMI cut paid a join + two windows + a self-pair join — measured
    * ~1 s of fixed stage overhead per query at bench grain; the
    * literal-array higher-order-function cut re-evaluated the nested
    * lambda per outer element — 2.5–5× slower than the join form). */
  private[graft] final case class ImiBooks(
      b0: Array[(Long, Array[Long], Long)],
      b1: Array[(Long, Array[Long], Long)])

  private[graft] def collectBooks(books: DataFrame): ImiBooks = {
    val rows = books.select(col("sub").cast("int"), col("cent_id"),
      col("qc"), col("sc")).collect()
    def side(s: Int): Array[(Long, Array[Long], Long)] = rows.toSeq
      .filter(_.getInt(0) == s)
      .map(r => (r.getLong(1), r.getSeq[Long](2).toArray, r.getLong(3)))
      .sortBy(_._1)
      .toArray
    ImiBooks(side(0), side(1))
  }

  /** Collected [[coarseCodebooks]] memoized per corpus dir (the
    * corpusCount pattern — invalidateCorpusCount drops both, since a
    * stale codebook is exactly a stale count's failure mode). */
  private val booksCache =
    new java.util.concurrent.ConcurrentHashMap[String, ImiBooks]()
  private[graft] def coarseBooks(s: SparkSession, dir: String,
                                 e: DataFrame): ImiBooks =
    booksCache.computeIfAbsent(dir,
      _ => collectBooks(coarseCodebooks(s, dir, e)))

  /** Two-level cell assignment: rank each vector's HALVES against the
    * matching sub-codebook (per-half integer cosine, the cosPpm idiom),
    * keep the top `perHalf` sub-cells per half, and emit the product
    * cells ranked by (rank₀+rank₁, rank₀, cell) — rank 1 is always the
    * (nearest, nearest) pair, invariant to `perHalf`. Callers pick
    * `perHalf` by intent: 1 for the unique serving cell, 2 for dedup's
    * 4-cell multi-assignment, 5 for probe fans up to 25 cells (s11's
    * nprobe=20 included).
    *
    * Scale shape: ONE narrow projection — the whole per-half ranking
    * and product enumeration runs inside the native
    * [[graft.functions.ImiCells]] expression (per row: 2·∜n half-width
    * dots, two perHalf-selection passes, an anti-diagonal product emit
    * — no per-entry allocation, child stays codegen'd), then one
    * posexplode. No join, no shuffle, no window: the corpus flows
    * through untouched, exactly the "assignment is a narrow map over
    * the corpus" shape the IVF scaladocs promise. Returns `v`'s
    * columns plus (cent_id = packed cell, rn). */
  private[graft] def imiRankB(v: DataFrame, bk: ImiBooks, idCol: String,
                              perHalf: Int): DataFrame =
    v.select(v.columns.map(col) :+
        posexplode(ImiCells(col("q"), bk.b0, bk.b1, perHalf))
          .as(Seq("__pos", "cent_id")): _*)
      .withColumn("rn", (col("__pos") + 1).cast("int"))
      .drop("__pos")

  /** [[imiRankB]] over an uncollected codebook frame — callers that
    * read the quantizer from a store (the streaming assignment path,
    * the index sidecars) pass the frame; the collect is 2·∜n rows. */
  private[graft] def imiRank(v: DataFrame, books: DataFrame, idCol: String,
                             perHalf: Int): DataFrame =
    imiRankB(v, collectBooks(books), idCol, perHalf)

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
    val sh = shingles(s, dir)
    // One self-join on (band, 4-minhash signature) over the band-exploded
    // table instead of four separate self-joins: a single shuffle whose
    // identical build/probe exchanges Spark deduplicates (ReuseExchange),
    // where the per-band version shuffled the signature table 8 times.
    val banded = bandedSignatures(sh)
    val cand = banded.as("a")
      .join(banded.as("b"), bandEq && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifiedJaccard(cand, sh, "doc_a", "doc_b")
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
  private def simhashSig(s: SparkSession, dir: String, bits: Int): DataFrame = {
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

  // ------------------------------------------------------- similarity search

  /** s01: exact brute-force cosine top-5 for the query set (vec_id < 10).
    * O(|Q|·|corpus|) with a row-local integer dot — the correctness
    * baseline every ANN variant is judged against. */
  def annCosineTopK(s: SparkSession, dir: String): DataFrame =
    annCosineTopKOf(quantized(s, dir))

  /** s01's core at quantized-frame grain, shared with the maintained
    * service (whose live corpus is the tombstone-filtered store, not a
    * table directory). */
  private[graft] def annCosineTopKOf(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val b = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    q.join(b, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s02: LSH-bucketed ANN — BANDED sign-LSH: 32 deterministic md5-seeded
    * integer hyperplanes arranged as 8 hash tables × 4 sign bits (the
    * same band trick d03 uses for MinHash). A candidate only needs to
    * collide in ONE table, so recall compounds across tables
    * (1-(1-p⁴)⁸ instead of the single-table p⁸ — a lone 8-bit signature
    * keeps ~4% of true neighbors; AnnRecallSpec pins the floor at 0.6).
    * The per-table bucket equi-join is the scale path: shuffle by
    * (table, bucket), exact re-rank within. */
  def annLshBuckets(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val ev = e.select(col("vec_id"), posexplode(col("q")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("col").as("v"))
    val w = s.range(0, 32).select(col("id").as("p"))
      .crossJoin(s.range(1, 65).select(col("id").as("i")))
      .withColumn("wv", h32(concat(col("p"), lit("_"), col("i"))) % 2001 - 1000)
    val buckets = ev.join(w, "i")
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("v") * col("wv")).as("sgn"))
      .groupBy(col("vec_id"), expr("CAST(p div 4 AS INT)").as("t"))
      .agg(sum(when(col("sgn") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 4 AS INT))")).otherwise(lit(0L)))
        .as("bucket"))
    val cand = buckets.as("qb").filter(col("qb.vec_id") < 10)
      .join(buckets.as("nb"),
        col("qb.t") === col("nb.t") && col("qb.bucket") === col("nb.bucket") &&
          col("qb.vec_id") =!= col("nb.vec_id"))
      .select(col("qb.vec_id").as("query_id"), col("nb.vec_id").as("neighbor_id"))
      .distinct()
    val q = e.select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s06: truncated-dimension prefilter ANN — the Matryoshka/PCA-prefix
    * pattern: a CHEAP coarse pass scores every (query, vector) pair on
    * only the first 32 of 64 dimensions (prefix cosine from prefix
    * norms), keeps the top-100 candidates per query, and an exact
    * rerank computes the full 64-dim cosine ONLY at candidate grain.
    * Top-5 output is schema-identical to s01 so recall is directly
    * measurable: 0.96 on the near-uniform sf0.01 embeddings
    * (AnnRecallSpec floor 0.85; 16 dims / top-50 measured 0.60,
    * 32 / top-50 0.76 — prefix width and candidate count are the two
    * dials, and on real embeddings with decaying spectra the prefix
    * carries most of the variance, steepening the curve).
    *
    * The two-pass structure is the scale story, not the arithmetic: the
    * prefix pass touches a frame of (vec_id, 32-dim prefix, prefix
    * norm) ONLY — at 100 TB the prefix lives as its own parquet column
    * (or a separate sidecar table), so the coarse scan reads half the
    * vector bytes, and the full vectors are fetched by key join at
    * candidate grain (100/|corpus| of the rows), never scanned in the
    * scoring loop. Complements s02/s03: those prune CANDIDATES by
    * bucket/cell; this prunes BYTES-PER-SCORE — on clustered production
    * embeddings the two compose (prefix-score within a probed cell). */
  def annTruncated(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    // The prefix-only frame: what the coarse pass is allowed to read.
    val pfx = e.select(col("vec_id"), expr("slice(q, 1, 32)").as("qp"))
      .withColumn("sp", DotI64(col("qp"), col("qp")))
    val qp = pfx.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qp").as("qpa"), col("sp").as("spa"))
    val np = pfx.select(col("vec_id").as("neighbor_id"),
      col("qp").as("qpb"), col("sp").as("spb"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("neighbor_id").asc)
    val cand = qp.join(np, col("query_id") =!= col("neighbor_id"))
      .withColumn("pdot", DotI64(col("qpa"), col("qpb")))
      .withColumn("pcos",
        floor(col("pdot") / (sqrt(col("spa")) * sqrt(col("spb")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= 100)
      .select("query_id", "neighbor_id")
    // Exact rerank at candidate grain: full vectors enter by key join.
    val q = e.select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s13: scalar-quantized (SQ8) ANN — the third compression axis of the
    * serving matrix. s02/s03 prune CANDIDATES (buckets/cells), s06 prunes
    * DIMENSIONS (32-of-64 prefix); s13 prunes BITS-PER-DIMENSION: every
    * vector is affinely quantized to 8-bit codes against per-dimension
    * corpus ranges (the FAISS `SQ8` layout), the coarse pass scores every
    * (query, vector) pair on the RECONSTRUCTED codes — at scale the code
    * frame is 1 byte/dim, an 8x byte reduction the coarse scan reads
    * instead of the float vectors — keeps top-100 per query, and the
    * exact rerank runs at candidate grain only (full vectors enter by
    * key join, never scanned in the scoring loop).
    *
    * Determinism across engines: the per-dimension range (mn, r) comes
    * from an integer min/max over the ppm-quantized corpus; code_i =
    * floor((v-mn)*255/r + 0.5) is computed in EXACT integer arithmetic
    * as ((v-mn)*510 + r) div (2r) (numerator nonnegative, so Spark's
    * truncating `div` ≡ DuckDB's floor `//`), and the coarse score uses
    * the 255x-scaled reconstruction vh = 255*mn + code*r — all BIGINT
    * sums, floats only at the final sqrt/div/floor on identical inputs
    * (the cosPpm idiom). Overflow headroom: |vh| ≤ 255·|v|max ≈ 1.5e8,
    * so a 64-dim dot is ≤ 1.4e18 < 2^63.
    *
    * Quality (AnnRecallSpec, recall@5 vs exact s01 on sf0.01): 8-bit
    * codes over the full width measured 1.00 — the quantization grid
    * (255 levels per dim) is finer than the top-5/top-100 cosine gaps
    * on these embeddings, so the coarse order matches the exact order
    * at candidate grain; floor pinned at 0.9. The dial is bits/dim
    * (4-bit halves the bytes again and would trade recall).
    * At 100 TB SQ8 composes with s03 exactly like s06 does (s07):
    * code-score within probed cells, rerank survivors. */
  /** The scalar quantizer's TRAINED state: per-dimension affine ranges
    * from one narrow agg over the posexploded (i, v) frame, folded into
    * two 64-element arrays — one broadcastable row. Persisted as the
    * stored index's `_sq8` sidecar (the codes are only meaningful
    * relative to their ranges, exactly as index cells are only
    * meaningful relative to their `_quantizer`); a range refresh is a
    * retrain-class event — within an epoch the ranges are immutable and
    * the append path encodes under them. */
  private[graft] def sq8Ranges(e: DataFrame): DataFrame =
    e.select(posexplode(col("q")))
      .groupBy((col("pos") + 1).as("i"))
      .agg(min("col").as("mn"), (max("col") - min("col")).as("r"))
      .agg(expr("array_sort(collect_list(named_struct('i', i, 'mn', mn, 'r', r)))")
        .as("st"))
      .select(expr("transform(st, x -> x.mn)").as("mns"),
        expr("transform(st, x -> x.r)").as("rs"))

  /** Encode a quantized frame against GIVEN ranges: the per-dimension
    * 8-bit `codes` (what the stored index carries — 1 byte/dim at
    * scale; smallint here, parquet bit-packs it), the 255x-scaled
    * reconstruction `vh` = 255·mn + code·r, and its norm `ss`. Codes
    * CLAMP to [0, 255]: a no-op for the corpus the ranges were trained
    * on (in-range values land in [0, 255] by construction, so s13/s15
    * arithmetic is unchanged), and the standard SQ saturation for
    * post-training arrivals the append path encodes under a frozen
    * epoch. Constant dimensions (r = 0) code to 0, reconstructing to
    * their single level 255·mn. */
  private[graft] def sq8EncodeWith(e: DataFrame, ranges: DataFrame): DataFrame =
    e.crossJoin(broadcast(ranges))
      .withColumn("codes", expr(
        """zip_with(q, zip_with(mns, rs, (m, r) -> named_struct('m', m, 'r', r)),
          |  (v, c) -> CASE WHEN c.r = 0 THEN CAST(0 AS BIGINT)
          |    ELSE greatest(CAST(0 AS BIGINT), least(CAST(255 AS BIGINT),
          |           ((v - c.m) * 510 + c.r) div (2 * c.r)))
          |  END)""".stripMargin).cast("array<smallint>"))
      .withColumn("vh", expr(
        """zip_with(codes, zip_with(mns, rs, (m, r) -> named_struct('m', m, 'r', r)),
          |  (k, c) -> 255 * c.m + CAST(k AS BIGINT) * c.r)""".stripMargin))
      .withColumn("ss", DotI64(col("vh"), col("vh")))
      .select("vec_id", "codes", "vh", "ss")

  /** The SQ8 code frame (s13's construction, shared with the IVF∘SQ8
    * composition s15): ranges derived from the frame itself, encoded in
    * place — the one-shot form; s17 reads the same codes from the
    * stored index instead. */
  private def sq8Codes(e: DataFrame): DataFrame =
    sq8EncodeWith(e, sq8Ranges(e)).select("vec_id", "vh", "ss")

  /** s20: product-quantized ANN (PQ 4×16, asymmetric distance) — the
    * remaining FAISS compression tier, completing the matrix: s06
    * truncates dimensions, s13 narrows bytes per dimension (SQ8,
    * 64 B/vector), PQ replaces each 16-dim SUBVECTOR with one codebook
    * id — 4 bytes/vector, the shape billion-scale serving actually
    * stores. Codebooks are hash-sampled corpus subvectors (≈256 per
    * subspace — the coarseCentroids sampling rule at the PQ codebook
    * cardinality); encoding assigns each subvector to its nearest
    * entry by EXACT integer L2 (d² = |a|² + |b|² − 2ab, all BIGINT —
    * no k-means float drift, no libm), ties by centroid id. Scoring is
    * textbook ADC: the RAW query against each neighbor's concatenated
    * reconstruction — dot(q, recon) = Σ_m dot(q_m, codebook[m][code_m])
    * and |recon|² = Σ_m |c_m|² exactly, because subspaces are
    * disjoint. Top-100 by reconstructed cosine, exact rerank to top-5
    * (the s13/s15 tail).
    *
    * Scale shape: assignment is |corpus|·4 subvector rows × ≈256
    * broadcast codebook entries (16-dim codegen dots — s14's cost
    * class at fixed k); ADC reads (vec, sub, code) rows — the 4-byte
    * frame at scale — and |Q|·4·|corpus| lookup dots; reranks fetch
    * ~100 full vectors per query by key join. Composition with the
    * IVF cell probe (s15's pattern) and index-residence (s17's)
    * apply verbatim — registered once here at the honest corpus-wide
    * grain, s13's posture. */
  /** The PQ subvector frame: 4 rows per vector (16-dim slices + exact
    * norms) — shared by codebook sampling, encoding, and the ADC
    * query side. */
  private[graft] def pqSubvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("q"),
        explode(expr("sequence(0, 3)")).as("sub"))
      .withColumn("qs", expr("slice(q, sub * 16 + 1, 16)"))
      .withColumn("ss", DotI64(col("qs"), col("qs")))
      .select("vec_id", "sub", "qs", "ss")

  /** The PQ codebook frame TRAINED on a quantized corpus: hash-sampled
    * subvectors, ≈256 entries per subspace (`n` is the corpus count —
    * callers with a memoized count pass it; builds count once). Like
    * `_quantizer` and `_sq8`, this is epoch state: the stored index
    * persists it as the `_pq` sidecar, appends encode under it frozen,
    * and a codebook refresh is a retrain-class rebuild. */
  private[graft] def pqCodebooks(e: DataFrame, n: Long): DataFrame = {
    val stride = math.max(1L, n / 256L)
    pqSubvectors(e)
      .filter(h32(col("vec_id").cast("string")) % stride === 0)
      .select(col("vec_id").as("cent_id"), col("sub"),
        col("qs").as("cs"), col("ss").as("scs"))
  }

  /** PQ-encode a quantized frame under a GIVEN codebook: per (vector,
    * subspace) the nearest entry by EXACT integer L2 (d² = |a|² + |b|²
    * − 2ab, all BIGINT), ties by centroid id — one (vec_id, sub,
    * cent_id, scs) row per subspace. */
  private[graft] def pqEncodeWith(e: DataFrame, books: DataFrame): DataFrame = {
    val aw = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d2").asc, col("cent_id").asc)
    pqSubvectors(e).join(broadcast(books), "sub")
      .withColumn("d2",
        col("ss") + col("scs") - lit(2L) * DotI64(col("qs"), col("cs")))
      .withColumn("rn", row_number().over(aw))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("cent_id"),
        col("cs"), col("scs"))
  }

  def annPq(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val n: Long = corpusCount.computeIfAbsent(dir,
      _ => Tables.t(s, dir, "embeddings").count())
    // Codebooks + encoding (the shared construction; s21 reads the
    // same codes from the stored index instead).
    val codes = pqEncodeWith(e, pqCodebooks(e, n))
    // Reconstruction norm: Σ over subspaces of the chosen entry's norm.
    val rnorm = codes.groupBy("vec_id")
      .agg(sum(col("scs")).as("ssr"))
    // ADC: raw query subvectors against neighbor reconstructions.
    val qsubs = pqSubvectors(e.filter(col("vec_id") < 10))
      .select(col("vec_id").as("query_id"), col("sub"), col("qs").as("qq"))
    val adc = codes.select(col("vec_id").as("neighbor_id"), col("sub"),
        col("cs"))
      .join(qsubs, "sub")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("pdot", DotI64(col("qq"), col("cs")))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("pdot")).as("adot"))
    val qn = e.select(col("vec_id").as("query_id"), col("s2").as("sa"))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id").asc)
    val cand = adc
      .join(qn, "query_id")
      .join(rnorm.select(col("vec_id").as("neighbor_id"), col("ssr")),
        "neighbor_id")
      .withColumn("acos",
        floor(col("adot") / (sqrt(col("sa")) * sqrt(col("ssr")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("arn", row_number().over(cw))
      .filter(col("arn") <= 100)
      .select("query_id", "neighbor_id")
    // Exact rerank at candidate grain (the family's shared tail).
    val q = e.select(col("vec_id").as("query_id"), col("q").as("qa"),
      col("s2").as("sa"))
    val nn = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
      col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(nn, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  def annSq8(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    // The code frame: what the coarse pass is allowed to read.
    val coded = sq8Codes(e)
    val qc = coded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("vh").as("vha"), col("ss").as("ssa"))
    val nc = coded.select(col("vec_id").as("neighbor_id"),
      col("vh").as("vhb"), col("ss").as("ssb"))
    val aw = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id").asc)
    val cand = qc.join(nc, col("query_id") =!= col("neighbor_id"))
      .withColumn("adot", DotI64(col("vha"), col("vhb")))
      .withColumn("acos",
        floor(col("adot") / (sqrt(col("ssa")) * sqrt(col("ssb")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("arn", row_number().over(aw))
      .filter(col("arn") <= 100)
      .select("query_id", "neighbor_id")
    // Exact rerank at candidate grain only.
    val q = e.select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s15: IVF ∘ SQ8 — the full FAISS "IVF√n,SQ8" serving layout and the
    * serving matrix's composition corner: the coarse quantizer prunes
    * CANDIDATES (12 probed cells of √n, s03's dial), the SQ8 codes prune
    * BYTES for scoring within them (1 byte/dim, s13's construction),
    * and the exact full-width rerank reads vectors only at top-100
    * candidate grain. s13 scores codes CORPUS-WIDE — an honest linear
    * scan; this composition scores ~nprobe/√n of the corpus instead,
    * which is the shape production vector serving deploys (cell-pruned
    * reads of a byte-compressed frame, full precision only for
    * finalists). The code frame RIDES the cell-partitioned stored index
    * (s08's layout) as the `codes`/`css` columns — s17
    * ([[annIvfSq8Indexed]]) is this query served off that storage, so
    * the probe's partition pruning bounds bytes read by nprobe/k
    * exactly as the prefix sidecar does for s07; this one-shot form
    * recomputes the codes per invocation and stands as s17's
    * recompute twin (the s07→s08 relationship).
    *
    * Recall: the two prunings compound (a true neighbor must survive
    * the cell probe AND the code-order top-100); AnnRecallSpec pins the
    * floor vs exact s01 alongside s07's — on these embeddings SQ8's
    * 255-level grid loses nothing (s13 measured 1.00), so s15's recall
    * tracks s03's cell-probe recall. */
  def annIvfSq8(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val books = coarseBooks(s, dir, e)
    val assigned = imiRankB(e, books, "vec_id", 1)
      .filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cent_id").as("cell"))
    val probes = imiRankB(e.filter(col("vec_id") < 10), books, "vec_id", 5)
      .filter(col("rn") <= 12)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cell"))
    val cellCand = probes.join(assigned, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    // SQ8 coarse pass at cell-candidate grain: scores read ONLY the
    // code frame (the byte sidecar at scale).
    val coded = sq8Codes(e)
    val qc = coded.select(col("vec_id").as("query_id"),
      col("vh").as("vha"), col("ss").as("ssa"))
    val nc = coded.select(col("vec_id").as("neighbor_id"),
      col("vh").as("vhb"), col("ss").as("ssb"))
    val aw = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id").asc)
    val cand = cellCand.join(qc, "query_id").join(nc, "neighbor_id")
      .withColumn("adot", DotI64(col("vha"), col("vhb")))
      .withColumn("acos",
        floor(col("adot") / (sqrt(col("ssa")) * sqrt(col("ssb")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("arn", row_number().over(aw))
      .filter(col("arn") <= 100)
      .select("query_id", "neighbor_id")
    // Exact rerank at the doubly-pruned candidate grain.
    val q = e.select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s17: IVF∘SQ8 served off the STORED index — semantically ≡ s15
    * (same probes, same code-scored top-100, same exact rerank;
    * AnnIndexSpec pins the outputs identical at all three SFs), but the
    * cell assignment AND the SQ8 code frame are READ, not recomputed:
    * the index rows carry `codes` (1 byte/dim at scale) and the
    * precomputed code-norm `css` beside the prefix payload, and the
    * range epoch lives in the `_sq8` sidecar next to `_quantizer`. The
    * coarse pass therefore reads partition-pruned thin rows of the
    * probed cells only — s15's one gap (per-query code recomputation
    * re-read every full-width vector) closed by the same
    * storage-for-recompute swap s08 made for s07. The only corpus-grain
    * touch left is the rerank's ~100-vector key-join fetch (PlanSpec
    * pins DPP on the index scan and the corpus-scan count). */
  def annIvfSq8Indexed(s: SparkSession, dir: String): DataFrame =
    annIvfSq8IndexedAt(s, dir, annIndexPath(s, dir))

  /** s17's read path over an EXPLICIT index location (the
    * annIvfIndexedAt pattern — CorpusService serves its maintained
    * artifact through this). Queries encode against the index's own
    * `_sq8` sidecar and probe its `_quantizer`, so serving is always
    * consistent with the epoch that wrote the stored codes. */
  def annIvfSq8IndexedAt(s: SparkSession, dir: String,
                         indexPath: String,
                         dropIds: Option[DataFrame] = None): DataFrame = {
    val idx0 = s.read.parquet(indexPath).filter(col("rn") === 1)
    val idx = dropIds.fold(idx0)(d =>
      idx0.join(d.select(col("vec_id")), Seq("vec_id"), "left_anti"))
    val cents = quantizerOf(s, indexPath)
    val ranges = sidecarOf(s, indexPath, "_sq8")
    val eq = quantized(s, dir).filter(col("vec_id") < 10)
    val cellT = idx.schema(idx.schema.fieldIndex("cell")).dataType
    val probes = imiRank(eq, cents, "vec_id", 5)
      .filter(col("rn") <= 12)
      .select(col("vec_id").as("query_id"),
        col("cent_id").cast(cellT).as("cell"))
    // Query-side codes: encoded at QUERY grain (10 rows) under the
    // sidecar ranges — identical to the stored codes for corpus rows.
    val qc = sq8EncodeWith(eq, ranges)
      .select(col("vec_id").as("query_id"),
        col("vh").as("vha"), col("ss").as("ssa"))
    // Coarse pass: partition-pruned index read; per-row work is one
    // reconstruction zip (codes × broadcast ranges) + one DotI64.
    val aw = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id").asc)
    val cand = idx.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("codes"), col("css"))
      .crossJoin(broadcast(ranges))
      .withColumn("vhb", expr(
        """zip_with(codes, zip_with(mns, rs, (m, r) -> named_struct('m', m, 'r', r)),
          |  (k, c) -> 255 * c.m + CAST(k AS BIGINT) * c.r)""".stripMargin))
      .join(broadcast(qc), "query_id")
      .withColumn("adot", DotI64(col("vha"), col("vhb")))
      .withColumn("acos",
        floor(col("adot") / (sqrt(col("ssa")) * sqrt(col("css")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("arn", row_number().over(aw))
      .filter(col("arn") <= 100)
      .select("query_id", "neighbor_id")
    // Exact rerank at the doubly-pruned grain — the one corpus-grain
    // touch (full neighbor vectors fetched by key join).
    val q = eq.select(col("vec_id").as("query_id"), col("q").as("qa"),
      col("s2").as("sa"))
    val n = quantized(s, dir)
      .select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s21: IVF ∘ PQ served off the STORED index — the "IVF,PQ" layout
    * FAISS deploys at billion scale, completing the serving matrix's
    * last cell: the coarse quantizer prunes CANDIDATES (12 probed
    * cells, s03's dial), the index-resident PQ codes prune BYTES
    * within them (4 ids/vector — 4 bytes at scale), and scoring is
    * textbook ADC with a LOOKUP TABLE: the query's raw subvectors dot
    * every codebook entry ONCE (|Q|·4·≈256 rows, broadcast), and each
    * candidate costs 4 table lookups + 4 adds — no per-candidate
    * vector arithmetic at all, which is PQ's entire point. Exact
    * rerank at top-100 candidate grain (the family tail). Codes,
    * codebooks (`_pq` sidecar), cells, and SQ8 ranges are all frozen
    * per epoch; appends encode under them (s17's contract, applied to
    * the third payload). */
  def annIvfPqIndexed(s: SparkSession, dir: String): DataFrame =
    annIvfPqIndexedAt(s, dir, annIndexPath(s, dir))

  def annIvfPqIndexedAt(s: SparkSession, dir: String,
                        indexPath: String): DataFrame =
    annIvfPqIndexedOver(s, quantized(s, dir),
      quantized(s, dir).filter(col("vec_id") < 10), indexPath,
      excludeSelf = true, k = 5)

  /** The grain-agnostic core of PQ-served ANN (the annIvfIndexedOver
    * pattern for the third payload): `corpus` supplies the exact-rerank
    * vectors, `eq` the ALREADY-QUANTIZED query frame, and the chunk
    * index serves through this directly (CorpusService.chunkTopKFor's
    * `pq` dial — 4 bytes per chunk vector at the coarse pass, the shape
    * a 100 TB chunk store needs). `dropIds` is the tombstone filter. */
  private[graft] def annIvfPqIndexedOver(s: SparkSession, corpus: DataFrame,
                                         eq: DataFrame, indexPath: String,
                                         excludeSelf: Boolean, k: Int,
                                         dropIds: Option[DataFrame] = None)
      : DataFrame = {
    val idx0 = s.read.parquet(indexPath).filter(col("rn") === 1)
    val idx = dropIds.fold(idx0)(d =>
      idx0.join(d.select(col("vec_id")), Seq("vec_id"), "left_anti"))
    val cents = quantizerOf(s, indexPath)
    val books = sidecarOf(s, indexPath, "_pq")
    val cellT = idx.schema(idx.schema.fieldIndex("cell")).dataType
    val probes = imiRank(eq, cents, "vec_id", 5)
      .filter(col("rn") <= 12)
      .select(col("vec_id").as("query_id"),
        col("cent_id").cast(cellT).as("cell"))
    // The ADC lookup table: query subvectors × sidecar codebooks, once.
    val lut = pqSubvectors(eq)
      .select(col("vec_id").as("query_id"), col("sub"), col("qs"))
      .join(broadcast(books), "sub")
      .withColumn("pdot", DotI64(col("qs"), col("cs")))
      .select(col("query_id"), col("sub"), col("cent_id"), col("pdot"))
    // Candidates: partition-pruned thin (cell, vec_id, pq, spq) rows;
    // each candidate's ADC score is 4 broadcast-LUT lookups.
    val hits = idx.join(broadcast(probes), "cell")
    val cand0 = (if (excludeSelf)
        hits.filter(col("vec_id") =!= col("query_id"))
      else hits)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        posexplode(col("pq")), col("spq"))
      .select(col("query_id"), col("neighbor_id"),
        col("pos").as("sub"), col("col").as("cent_id"), col("spq"))
    val qn = eq.select(col("vec_id").as("query_id"), col("s2").as("sa"))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id").asc)
    val cand = cand0
      .join(broadcast(lut), Seq("query_id", "sub", "cent_id"))
      .groupBy("query_id", "neighbor_id", "spq")
      .agg(sum(col("pdot")).as("adot"))
      .join(broadcast(qn), "query_id")
      .withColumn("acos",
        floor(col("adot") / (sqrt(col("sa")) * sqrt(col("spq")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("arn", row_number().over(cw))
      .filter(col("arn") <= 100)
      .select("query_id", "neighbor_id")
    // Exact rerank at the doubly-pruned grain — the one corpus-grain
    // touch (full neighbor vectors fetched by key join).
    val q = eq.select(col("vec_id").as("query_id"), col("q").as("qa"),
      col("s2").as("sa"))
    val n = corpus
      .select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s22: MMR-diversified retrieval (Maximal Marginal Relevance,
    * Carbonell & Goldstein 1998) — the post-retrieval RE-RANKER class
    * the serving family was missing: plain top-k returns five
    * paraphrases of the best hit; MMR greedily selects items maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-selected (λ = 0.7),
    * so each pick adds information the previous picks lack — the
    * dedup-at-serving-time dual of d05's dedup-at-corpus-time.
    *
    * Exactness: the greedy argmax is inherently sequential, so the 5
    * selection rounds are UNROLLED (the d13 oracle's pattern applied to
    * a query plan): each round is one anti-join (drop selected), one
    * max-aggregation over the pool-internal similarity frame restricted
    * to the selected set, and one per-query argmax window. The MMR
    * score is kept ×10 (7·rel − 3·maxsim, pure BIGINT — division would
    * reintroduce the negative-numerator truncation hazard and changes
    * no ordering), ties by candidate id; both engines compute it
    * bit-identically.
    *
    * Scale shape: the candidate pool is the exact top-20 per query
    * (s01's scan — any s02–s21 retriever drops in; MMR only consumes
    * the pool), the pairwise similarity frame is |Q|·20·19 rows, and
    * every greedy round touches ≤20 rows per query — re-ranking cost
    * is INDEPENDENT of corpus size, the defining property of a
    * post-retrieval stage. */
  def mmrDiversified(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val q0 = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
      col("s2").as("sb"))
    val wv = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    val pool = q0.join(n, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rnk", row_number().over(wv))
      .filter(col("rnk") <= 20)
      .select(col("query_id"), col("neighbor_id").as("cand"),
        col("cos_ppm").as("rel"))
    mmrSelect(pool, p => poolSimsFrom(p, e))
      .select(col("query_id"), col("cand").as("neighbor_id"),
        col("rel").as("cos_ppm"), col("mmr_rank"))
  }

  /** Pool-internal similarity frame for [[mmrSelect]]: exact pairwise
    * cosine between a pool's candidates, full vectors fetched by key
    * join into the quantized frame `e` — |Q|·N·(N−1) rows for an N-item
    * pool; the re-ranker never touches the corpus beyond this fetch. */
  private[graft] def poolSimsFrom(pool: DataFrame, e: DataFrame): DataFrame =
    pool.select(col("query_id"), col("cand").as("a"))
      .join(pool.select(col("query_id"), col("cand").as("b")), "query_id")
      .filter(col("a") =!= col("b"))
      .join(e.select(col("vec_id").as("a"), col("q").as("qa"),
        col("s2").as("sa")), "a")
      .join(e.select(col("vec_id").as("b"), col("q").as("qb"),
        col("s2").as("sb")), "b")
      .withColumn("dot", dot)
      .withColumn("sim", cosPpm)
      .select("query_id", "a", "b", "sim")

  /** The MMR greedy core at POOL grain, shared by one-shot s22 and the
    * service's diversify dials (CorpusService.diversifiedTopKFor /
    * hybridTopKFor / chunkTopKFor — the re-ranker belongs on the
    * request path): consumes a relevance pool (query_id, cand, rel —
    * ANY retriever's integer-scored top-N drops in) and a builder for
    * its pool-internal similarity frame (query_id, a, b, sim), returns
    * the `k` greedy picks per query as (query_id, cand, rel, mmr_rank),
    * score = 7·rel − 3·max-sim-to-selected (λ = 0.7 kept ×10 in pure
    * BIGINT), ties by cand.
    *
    * Each round's selection is localCheckpoint-ed: round r's plan
    * references the running result, so without materialization the
    * lineage re-executes rounds 1..r−1 inside round r — the CC loop's
    * quadratic-replan trap at query-plan grain (measured 5.5 s → ~2 s
    * for 5 rounds of ≤50-row frames). Every SUPERSEDED checkpoint
    * (pool, sims, each intermediate result) is freed as soon as the
    * next round materializes — only the returned frame's blocks stay
    * resident, so repeated serving calls cannot accumulate blocks.
    *
    * Cost is INDEPENDENT of corpus size — the defining property of a
    * post-retrieval stage: every round touches ≤|pool| rows per query. */
  private[graft] def mmrSelect(pool0: DataFrame,
                               simsOf: DataFrame => DataFrame,
                               k: Int = 5): DataFrame = {
    val pool = pool0.localCheckpoint()
    val sims = simsOf(pool).localCheckpoint()
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cand").asc)
    var result = pool
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("cand"), col("rel"),
        lit(1).as("mmr_rank"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val remaining = pool.join(result.select("query_id", "cand"),
        Seq("query_id", "cand"), "left_anti")
      val maxsim = sims
        .select(col("query_id"), col("a").as("cand"), col("b"), col("sim"))
        .join(result.select(col("query_id"), col("cand").as("b")),
          Seq("query_id", "b"), "left_semi")
        .groupBy("query_id", "cand")
        .agg(max(col("sim")).as("maxsim"))
      val wk = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("cand").asc)
      val pick = remaining
        .join(maxsim, Seq("query_id", "cand"), "left")
        .withColumn("score",
          lit(7L) * col("rel") - lit(3L) * coalesce(col("maxsim"), lit(0L)))
        .withColumn("rn", row_number().over(wk))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("cand"), col("rel"),
          lit(r).as("mmr_rank"))
      val prev = result
      result = result.unionByName(pick).localCheckpoint()
      freeCkpt(prev)
    }
    freeCkpt(pool)
    freeCkpt(sims)
    result
  }

  /** s16: hybrid retrieval with Reciprocal Rank Fusion — the serving
    * shape modern search actually deploys: a LEXICAL ranker (integer
    * tf·idf over shared tokens, the BM25 family's exact-arithmetic
    * sibling — t10's idiom at retrieval grain) and the VECTOR ranker
    * (s01's exact cosine) each produce a top-20, and the fused score is
    * Σ 1/(60+rank) over the UNION (RRF, Cormack et al.'s k=60), in ppm
    * via integer division so the fusion is exact across engines. A doc
    * found by only one ranker scores that ranker's term alone — RRF's
    * point: lexical recovers exact-term matches embeddings blur, vectors
    * recover paraphrases sharing no tokens.
    *
    * Queries are docs 0–9 under the established doc_id ≡ vec_id
    * convention (s04's join). Determinism: tf, df, and N are integers;
    * idf_ppm = (N·1e6) // df; the lexical score is a BIGINT sum; rank
    * ties break by neighbor id everywhere.
    *
    * Scale shape: the lexical side is a posting-list join at QUERY
    * grain — |Q| tiny, cost Σ_{t ∈ q} df(t), the classic serving cost
    * (production systems bound hot-token df with impact-sorted
    * postings; idf already downweights them to noise here). The vector
    * side is s01's honest exact scan standing in for any s02–s15
    * variant (RRF only consumes ranks, so the ANN family drops in
    * unchanged). Fusion joins two ≤20-row-per-query frames. */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val vec = vecRankExact(e, e.filter(col("vec_id") < 10),
      excludeSelf = true, k = 20)
    val tf = tokRows(s, dir)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val nn = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val lex = lexicalRank(
      tf.filter(col("doc_id") < 10).select(col("doc_id").as("query_id"), col("tok")),
      tf, nn)
    rrfFuse(vec, lex)
  }

  /** The exact-cosine vector ranker shared by one-shot s16 and the
    * service's `vectorExact` dial (CorpusService.hybridTopKFor): s01's
    * honest |Q|×n scan over QUANTIZED frames, top-k per query, ties by
    * neighbor id. Exact integer arithmetic end-to-end, so two callers
    * can never drift — which is what lets PostingSpec pin the served
    * hybrid ≡ one-shot s16 row-for-row on this path (the index-served
    * vector dial inherits s07's cell-probe recall instead and is pinned
    * by an overlap floor, the AnnRecallSpec idiom). */
  private[graft] def vecRankExact(corpus: DataFrame, queries: DataFrame,
                                  excludeSelf: Boolean, k: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = corpus
      .select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val wv = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    (if (excludeSelf) q.join(n, col("query_id") =!= col("neighbor_id"))
     else q.crossJoin(n))
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank_v", row_number().over(wv))
      .filter(col("rank_v") <= k)
      .select("query_id", "neighbor_id", "cos_ppm", "rank_v")
  }

  /** s19: BM25-family lexical ranking — Okapi's two ranking
    * innovations over s16's raw tf·idf, in exact ppm-integer
    * arithmetic: tf SATURATION (k1 = 1.2 — a term's contribution is
    * bounded as tf grows, so a 100-occurrence spam term cannot drown
    * ten distinct matches) and LENGTH NORMALIZATION (b = 0.75 — a
    * long document's tf is discounted toward the corpus-average
    * length, so verbosity is not relevance). The idf factor is the
    * engine's reciprocal-df form (N·1e6 // df) rather than the
    * textbook ln((N−df+.5)/(df+.5)): ln() is libm-dependent in its
    * last ulp, which breaks bit-exact cross-engine oracles, and the
    * reciprocal form shares log-idf's monotone direction — the
    * saturation/normalization behavior, which is what BM25 adds, is
    * preserved exactly.
    *
    * All arithmetic is staged integer division (the idiv idiom, each
    * numerator < 2^53 by construction — the idf·sat product is split
    * (idf//1000)·sat//1000 precisely to stay inside idiv's exact
    * range at 100× this corpus), identical operation-for-operation in
    * the DuckDB twin. Queries are docs 0–9 (the s16 convention);
    * top-10 per query, ties by neighbor id.
    *
    * Scale shape: s16's lexical cost exactly — a posting join at query
    * grain (Σ df over query tokens; the dfCapPpm dial composes
    * unchanged), one |docs|-grain length frame joined at candidate
    * grain, the one-row totals broadcast. Rank-only consumers (RRF)
    * can swap this in for lexicalRank unchanged. */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val tf = tokRows(s, dir)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    bm25Rank(
      tf.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("tok")),
      tf)
  }

  /** The BM25 scoring core at posting grain, shared by one-shot s19
    * and the service's posting-table path (CorpusService.hybridTopKFor
    * with `bm25 = true`): everything — document lengths, totals, df —
    * derives from the `tf` posting frame itself (Σ tf per doc IS the
    * token count), so the maintained posting log serves BM25 with no
    * corpus re-tokenization. The df cap and self-exclusion dials are
    * lexicalRank's, applied identically (the cap filters before the
    * posting join). */
  private[graft] def bm25Rank(qtoks: DataFrame, tf: DataFrame,
                              dfCapPpm: Long = 1000000L,
                              excludeSelf: Boolean = true,
                              k: Int = 10,
                              selfOf: org.apache.spark.sql.Column =>
                                org.apache.spark.sql.Column = identity)
      : DataFrame = {
    val dlen = tf.groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("dlen"))
    val tot = dlen.agg(sum("dlen").cast("long").as("total_toks"),
      count(lit(1)).as("n_docs"))
    val dfx = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(tot))
      .filter(col("df") * lit(1000000L) <= lit(dfCapPpm) * col("n_docs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_ppm").desc, col("neighbor_id").asc)
    val hits = qtoks
      .join(dfx, "tok")
      .join(tf.select(col("doc_id").as("neighbor_id"), col("tok"), col("tf")), "tok")
    // `selfOf` maps a neighbor key to the identity the query id lives
    // in — identity at doc grain; the packed-id doc extractor
    // (shiftright 12) when `tf` is CHUNK-grain postings and "self"
    // means the query's own document.
    (if (excludeSelf) hits.filter(selfOf(col("neighbor_id")) =!= col("query_id"))
     else hits)
      .join(dlen.select(col("doc_id").as("neighbor_id"), col("dlen")),
        "neighbor_id")
      .withColumn("idf_ppm", ppm(col("n_docs"), col("df")))
      .withColumn("sat_ppm", idiv(
        col("tf") * lit(2200000L) * lit(1000000L),
        col("tf") * lit(1000000L) + idiv(
          lit(1200000L) * (lit(250000L) + idiv(
            lit(750000L) * idiv(
              col("dlen") * col("n_docs") * lit(1000000L),
              col("total_toks")),
            lit(1000000L))),
          lit(1000000L))))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(idiv(idiv(col("idf_ppm"), lit(1000L)) * col("sat_ppm"),
        lit(1000L))).as("bm25_ppm"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "bm25_ppm", "rank")
  }

  /** The lexical ranker shared by one-shot s16 and the service's
    * posting-table serving path (streaming.PostingTable /
    * CorpusService.hybridTopKFor): integer tf·idf over shared tokens —
    * score(q, d) = Σ_{t ∈ q ∩ d} tf_d(t) · ((N·1e6) // df(t)) — top-20
    * per query, ties by neighbor id. `qtoks` is the (query_id, tok)
    * DISTINCT token set of each query; `tf` the (doc_id, tok, tf)
    * posting rows (recomputed by s16, READ from the maintained log by
    * the service); `nn` the one-row corpus count.
    *
    * `dfCapPpm` is the hot-token dial: tokens whose df exceeds
    * dfCapPpm/1e6 of the corpus are dropped BEFORE the posting join.
    * The join's cost is Σ_{t ∈ q} df(t) — one stop-word-grade token
    * (df ≈ N) makes a query's candidate set the whole corpus, the
    * lexical twin of the d03 hot bucket — while its score weight,
    * (N·1e6) // df ≈ 1e6, is ~N/2× below a df=2 token's, so dropping
    * it is the impact-truncation production posting lists apply.
    * 1e6 (default here) = uncapped, the oracle-exact form;
    * PostingSpec pins top-20 unchanged on this corpus at the service's
    * default cap and a planted-hot-token candidate shrink. */
  private[graft] def lexicalRank(qtoks: DataFrame, tf: DataFrame,
                                 nn: DataFrame,
                                 dfCapPpm: Long = 1000000L,
                                 excludeSelf: Boolean = true): DataFrame = {
    val dfx0 = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // The cap filters the |q-tokens|-grain frame BEFORE postings join
    // in (n_docs rides the broadcast one-row frame).
    val dfx = dfx0.crossJoin(broadcast(nn))
      .filter(col("df") * lit(1000000L) <= lit(dfCapPpm) * col("n_docs"))
    val wl = Window.partitionBy(col("query_id"))
      .orderBy(col("lex_score").desc, col("neighbor_id").asc)
    val hits = qtoks
      .join(dfx, "tok")
      .join(tf.select(col("doc_id").as("neighbor_id"), col("tok"), col("tf")), "tok")
    // excludeSelf mirrors the ANN serving contract: on for corpus-row
    // queries; off for external ids, where an accidental numeric
    // collision must not drop a true lexical match.
    (if (excludeSelf) hits.filter(col("neighbor_id") =!= col("query_id"))
     else hits)
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("tf") * ppm(col("n_docs"), col("df"))).as("lex_score"))
      .withColumn("rank_l", row_number().over(wl))
      .filter(col("rank_l") <= 20)
      .select("query_id", "neighbor_id", "rank_l")
  }

  /** Reciprocal Rank Fusion over the two rankers' top-20s (Cormack et
    * al.'s k=60, in exact ppm integers) — shared by s16 and the served
    * hybrid so fusion can never drift between them. */
  private[graft] def rrfFuse(vec: DataFrame, lex: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_ppm").desc, col("neighbor_id").asc)
    vec.join(lex, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(idiv(lit(1000000L), lit(60L) + col("rank_v")), lit(0L)) +
        coalesce(idiv(lit(1000000L), lit(60L) + col("rank_l")), lit(0L)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("query_id", "neighbor_id", "rrf_ppm", "rank")
  }

  /** s14: k-means refinement of the coarse quantizer — two Lloyd
    * iterations over the hash-sampled √n seeds ([[coarseCentroids]]),
    * the offline TRAINING job behind every IVF consumer (s03/s05/s07/
    * s08 assign against a quantizer; this is where a production system
    * makes that quantizer good instead of merely deterministic —
    * Lloyd's alternation of assign/recenter is the k-means training
    * FAISS et al. run before building the inverted file).
    *
    * Exactness across engines: a Lloyd recenter is a MEAN, but cosine
    * assignment is scale-invariant, so the centroid is kept as the
    * exact integer component SUM — no division ever happens and every
    * accumulated quantity is a BIGINT (float sums would make the
    * result depend on accumulation order, which no distributed engine
    * guarantees). Floats appear only in the final sqrt/div/floor on
    * identical integer inputs (the cosPpm idiom). Overflow headroom:
    * a component sum is ≤ |members|·1e6 and the centroid self-dot is
    * ≤ 64·(|members|·1e6)² — at a million members per cell that is
    * ~6e25, past 2^63, so at that scale the sum must be right-shifted
    * before the self-dot (scale-invariance makes the shift free);
    * here members/cell ≈ √n keeps it ≤ ~1e18 through sf1.
    *
    * Degenerate cells: a cell whose members cancel to the zero vector
    * has no cosine direction — filtered (sc > 0) before it can emit
    * NaN scores; a cell that loses all members in round 1 drops out
    * (standard Lloyd empty-cell behavior; the seed itself assigns to
    * its own cell at cos 1e6, so cells start non-empty).
    *
    * Scale shape: each iteration is one broadcast-centroid map over
    * the corpus (n·k integer dots at k = √n — this operator's own
    * n^1.5 regime: its OUTPUT is the √n-cluster decomposition, so the
    * cost is the ask) + one (cell, i)-grain hash agg — no corpus
    * self-join anywhere. The √n frame broadcasts to ~10⁹ vectors
    * (~0.25 GB at 64 dims); past that this clustering grain is the
    * wrong tool, and the IVF serving family does NOT depend on it —
    * it trains 2·∜n sub-codebooks per [[refinedCentroids]].
    * Output: the refined centroids as exact component sums at
    * (cent_id, i) grain with the final member count. */
  def kmeansRefine(s: SparkSession, dir: String): DataFrame =
    kmeansSums(s, dir)
      .select(col("cell").as("cent_id"), (col("pos") + 1).cast("int").as("i"),
        col("csum"), col("n_members"))

  /** The round-2 assignment's exact component sums at (cell, pos)
    * grain. n_members falls out of the same aggregation: every member
    * contributes exactly one row per dimension, so count(*) at
    * (cell, pos) grain IS the cell's member count — one hash agg, no
    * second consumption of the assignment subtree (which a separate
    * members join would re-plan and re-execute). */
  private def kmeansSums(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    def assign(cents: DataFrame): DataFrame =
      centroidRank(e, cents, "vec_id").filter(col("rn") === 1)
        .select(col("vec_id"), col("cent_id").as("cell"), col("q"))
    // Exact integer component sums per cell, folded back to the
    // (cent_id, qc, sc) centroid-frame shape assign() consumes.
    def recenter(a: DataFrame): DataFrame =
      a.select(col("cell"), posexplode(col("q")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum("col").as("csum"))
        .groupBy("cell")
        .agg(expr("array_sort(collect_list(named_struct('pos', pos, 'csum', csum)))")
          .as("ps"))
        .select(col("cell").as("cent_id"),
          expr("transform(ps, x -> x.csum)").as("qc"))
        .withColumn("sc", DotI64(col("qc"), col("qc")))
        .filter(col("sc") > 0)
    val a2 = assign(recenter(assign(coarseCentroids(s, dir, e))))
    a2.select(col("cell"), posexplode(col("q")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum("col").as("csum"), count(lit(1)).as("n_members"))
  }

  /** Lloyd-REFINED sub-codebooks in the (sub, cent_id, qc, sc) frame
    * shape every quantizer consumer reads ([[trainedCentroids]]'s
    * contract) — what `StreamingSemanticDedup.trainQuantizer(refine =
    * true)` writes, so the streaming semantic-dedup path can probe
    * trained cells instead of raw hash-sampled seeds. s14's two Lloyd
    * iterations applied PER SUBSPACE (the k-means-per-half training
    * FAISS runs for an IMI quantizer): each half of the corpus refines
    * its own ∜n-entry codebook independently, exact integer component
    * sums (cosine assignment is scale-invariant, so no division ever
    * happens), degenerate zero-sum entries filtered exactly as in
    * s14's loop. Per-iteration cost is n·2·∜n half-width dots — the
    * trainer rides the same complexity class as assignment itself. */
  private[graft] def refinedCentroids(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val halves = e.select(col("vec_id"),
        posexplode(array(expr(sliceH0), expr(sliceH1))).as(Seq("sub", "qh")))
      .withColumn("sh", DotI64(col("qh"), col("qh")))
    def assign(books: DataFrame): DataFrame =
      halves.join(broadcast(books), "sub")
        .withColumn("hdot", DotI64(col("qh"), col("qc")))
        .withColumn("hcos",
          floor(col("hdot") / (sqrt(col("sh")) * sqrt(col("sc")))
            * lit(1000000.0) + lit(0.5)).cast("long"))
        .withColumn("hr", row_number().over(
          Window.partitionBy(col("vec_id"), col("sub"))
            .orderBy(col("hcos").desc, col("cent_id").asc)))
        .filter(col("hr") === 1)
        .select(col("sub"), col("cent_id"), col("qh"))
    def recenter(a: DataFrame): DataFrame =
      a.select(col("sub"), col("cent_id"), posexplode(col("qh")))
        .groupBy(col("sub"), col("cent_id"), col("pos"))
        .agg(sum("col").as("csum"))
        .groupBy("sub", "cent_id")
        .agg(expr("array_sort(collect_list(named_struct('pos', pos, 'csum', csum)))")
          .as("ps"))
        .select(col("sub"), col("cent_id"),
          expr("transform(ps, x -> x.csum)").as("qc"))
        .withColumn("sc", DotI64(col("qc"), col("qc")))
        .filter(col("sc") > 0)
    recenter(assign(recenter(assign(coarseCodebooks(s, dir, e)))))
  }

  /** t24: cluster-balanced corpus subsampling — cap each IVF cell at a
    * fixed budget (8 here), members ranked by the portable id hash
    * (deterministic pseudo-random, so the kept set is a stable sample,
    * not a prefix of ingestion order). This is the diversity-preserving
    * pruning step of the SemDeDup/DoReMi family: over-represented modes
    * (a crawl that is 40% one template) are clipped to the same budget
    * as rare modes, so the downstream token mix covers the embedding
    * space instead of echoing the crawl distribution.
    *
    * Scale shape: one broadcast-centroid assignment map over the corpus
    * (no shuffle), then one window per cell — partitions are cell-sized
    * (~√n rows each), never a global sort. The cap is the dial; rank is
    * exposed so a consumer can re-cut to any budget ≤ 8 without
    * re-assigning. */
  def clusterSample(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val assigned = imiRankB(e, coarseBooks(s, dir, e), "vec_id", 1)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(h32(col("vec_id").cast("string")), col("vec_id"))
    assigned
      .withColumn("smp_rank", row_number().over(w).cast("int"))
      .filter(col("smp_rank") <= 8)
      .select("cell", "vec_id", "smp_rank")
  }

  /** t25: fixed-window document chunking — 64-token windows on a
    * 48-token stride (16-token overlap), the grain an embedding /
    * retrieval pipeline actually encodes (models embed chunks, not
    * documents; the overlap keeps boundary-spanning context in at
    * least one chunk). Emits one row per chunk with its exact token
    * count and a content hash — the chunk table IS the unit of work
    * for the embedding job, so its id scheme (doc_id, chunk_id) must
    * be deterministic and re-derivable, which `k·48` start offsets
    * are and byte offsets into re-encoded text are not.
    *
    * Scale shape: a pure per-row map (split + transform + explode) —
    * no shuffle, no state; fan-out is Σ ceil(tokens/48) rows, linear
    * in corpus tokens. At 100 TB this pipelines inside one stage and
    * the chunk hash doubles as the join key for chunk-grain dedup. */
  def chunkDocs(s: SparkSession, dir: String): DataFrame =
    chunksOfDocs(docs(s, dir))

  /** t25 at frame grain (expects doc_id, text) so the incremental
    * maintenance path (streaming.ChunkTable) chunks a delta batch with
    * the identical definition — the shinglesOfDocs pattern.
    *
    * The window sequence stops once the PREVIOUS 64-token window covers
    * the tail: a naive ceil(n/48) tiling emits, for n mod 48 in 1..16
    * (n > 48), a final chunk wholly contained in the prior window —
    * pure embedding-workload inflation, every token already encoded.
    * greatest((n-17) div 48, 0) is the largest k whose window adds at
    * least one new token (start k·48+1 ≤ n−16 ⇔ k ≤ (n−17)/48); the
    * greatest() also keeps the n < 17 numerator non-negative, where
    * Spark's truncating div and DuckDB's floor `//` would diverge. The
    * last chunk then holds 17–64 tokens, always inside its window. */
  private[graft] def chunksOfDocs(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("n"))
      .select(col("doc_id"), col("n"),
        explode(expr(
          """transform(sequence(0, greatest((n - 17) div 48, 0)),
            |  k -> named_struct(
            |    'chunk_id', CAST(k AS INT),
            |    'chunk_hash', md5(concat_ws(' ', slice(t, k * 48 + 1, 64)))))"""
            .stripMargin)).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        least(lit(64L), col("n") - col("chunk_id") * lit(48L)).cast("long")
          .as("n_tokens"),
        col("c.chunk_hash").as("chunk_hash"))

  /** d15: chunk-grain exact dedup — d01's hash dedup at t25's chunk
    * grain, the retrieval/embedding unit. Document-grain dedup (d01)
    * misses boilerplate chunks embedded in otherwise-distinct
    * documents; d11 finds repeated substrings at EVERY 30-token offset
    * (the memorization audit); d15 detects repetition at exactly the
    * grain the embedding job pays for, so its hit list is directly the
    * set of redundant vectors a RAG corpus can drop before encoding
    * (the chunk hash t25 emits doubles as the dedup key — no second
    * tokenization pass at scale, the chunk table is the input). One
    * hash-shuffle groupBy at chunk grain, d01's cost class. */
  def chunkDupes(s: SparkSession, dir: String): DataFrame =
    chunkDocs(s, dir)
      .groupBy("chunk_hash")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_chunks"),
        min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)

  /** Chunk-grain embedding derivation — RAG serving indexes CHUNKS, not
    * documents, and the testdata ships no chunk vectors, so the chunk
    * table (t25) gets deterministic integer vectors derived from chunk
    * content the way the fixtures give documents theirs: dim i of a
    * chunk is h32(chunk_hash ‖ ':' ‖ i) % 2001 − 1000 — a 64-dim
    * integer vector both engines compute bit-identically (the md5-hex
    * h32 idiom), already at the ppm-integer grain the ANN chain's exact
    * arithmetic wants. vec_id packs (doc_id, chunk_id) as
    * doc_id·4096 + chunk_id: deterministic, reversible, and ordered —
    * chunk_id < 4096 covers ~196k-token documents at the 48 stride.
    *
    * Scale shape: a pure per-row map over the chunk table (t25's
    * zero-shuffle grain) — the chunk-embedding job at 100 TB pipelines
    * inside the chunking stage; the derived frame is exactly what
    * [[buildAnnIndexFrom]] indexes at chunk grain (AnnIndexSpec). */
  private[graft] def chunkVectors(s: SparkSession, dir: String): DataFrame =
    chunkVectorsOf(chunkDocs(s, dir))

  /** The derivation at frame grain (expects doc_id, chunk_id,
    * chunk_hash) so a maintained chunk table (streaming.ChunkTable)
    * embeds its delta with the identical definition. */
  private[graft] def chunkVectorsOf(chunks: DataFrame): DataFrame =
    chunks
      .select((col("doc_id") * 4096 + col("chunk_id")).as("vec_id"),
        col("doc_id"), col("chunk_hash"))
      .withColumn("q", expr(
        """transform(sequence(1, 64),
          |  i -> CAST(conv(substring(md5(concat(chunk_hash, ':',
          |         CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT)
          |       % 2001 - 1000)""".stripMargin))
      .withColumn("s2", DotI64(col("q"), col("q")))
      .select("vec_id", "doc_id", "q", "s2")

  /** s18: chunk-grain ANN with doc-level rollup — the late-interaction
    * retrieval shape (ColBERT's MaxSim family): each query document's
    * CHUNKS score against every corpus chunk, and a candidate document's
    * score is its best-matching chunk (max-chunk rollup), so a long
    * document matching on one tight passage ranks above one diffusely
    * similar everywhere — the property chunk-grain retrieval exists to
    * buy. Queries are docs 0–9's chunks; output is top-5 DOCS per query
    * doc by max chunk cosine, ties by neighbor id.
    *
    * This registered form is the exact baseline (brute-force chunk
    * pairs at query grain — |chunks(q)|×|corpus chunks|, the s01
    * posture); the scale path builds the stored IVF index at chunk
    * grain over the SAME [[chunkVectors]] frame and serves through the
    * partition-pruned read (AnnIndexSpec pins chunk-grain build, append
    * under frozen epochs, and twin-first serving). The rollup is one
    * hash agg at (query doc, neighbor doc) grain. */
  def chunkAnn(s: SparkSession, dir: String): DataFrame = {
    val cv = chunkVectors(s, dir)
    val q = cv.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = cv.select(col("doc_id").as("neighbor_id"),
      col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("max_cos_ppm").desc, col("neighbor_id").asc)
    q.join(n, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .groupBy("query_id", "neighbor_id")
      .agg(max(col("cos_ppm")).as("max_cos_ppm"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "max_cos_ppm", "rank")
  }

  /** Token rows at CHUNK grain — t25's overlapping tiling applied to
    * the token stream: chunk k of a doc covers tokens
    * [k·48+1, k·48+64], so a token in an overlap region posts to BOTH
    * covering chunks (the inverted file must find a phrase wherever its
    * window lands). Keyed by the PACKED chunk id under the `doc_id`
    * column name so the doc-grain lexical rankers (bm25Rank /
    * lexicalRank) consume it verbatim — they are grain-agnostic over
    * the posting key. */
  private[graft] def chunkTokens(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("n"))
      .select(col("doc_id"),
        explode(expr(
          """transform(sequence(0, greatest((n - 17) div 48, 0)),
            |  k -> named_struct('cid', CAST(k AS INT),
            |                    'toks', slice(t, k * 48 + 1, 64)))"""
            .stripMargin)).as("c"))
      .select((col("doc_id") * 4096 + col("c.cid")).as("doc_id"),
        explode(col("c.toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))

  /** The chunk-grain VECTOR ranker shared by one-shot s23 and the
    * served chunk hybrid's exact dial: every corpus chunk scores
    * against each query's chunk set, a chunk's relevance is its best
    * match over the query's chunks (the query-side half of MaxSim —
    * a multi-passage query matches a chunk wherever ANY of its
    * passages does), top-`k` chunks per query, ties by chunk id.
    * `queryCh` is (query_id, q, s2) at query-CHUNK grain (one row per
    * chunk of each query); `corpusCv` is the (vec_id, doc_id, q, s2)
    * chunk-vector frame. `excludeSelfDoc` drops the query's own
    * document's chunks (corpus-parity queries). */
  private[graft] def chunkVecRank(corpusCv: DataFrame, queryCh: DataFrame,
                                  excludeSelfDoc: Boolean,
                                  k: Int = 20): DataFrame = {
    val q = queryCh
      .select(col("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = corpusCv.select(col("vec_id").as("neighbor_id"),
      col("doc_id").as("nd"), col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("best_cos_ppm").desc, col("neighbor_id").asc)
    (if (excludeSelfDoc) q.join(n, col("query_id") =!= col("nd"))
     else q.crossJoin(n))
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .groupBy("query_id", "neighbor_id")
      .agg(max(col("cos_ppm")).as("best_cos_ppm"))
      .withColumn("rank_v", row_number().over(w))
      .filter(col("rank_v") <= k)
      .select("query_id", "neighbor_id", "rank_v")
  }

  /** s23: chunk-grain HYBRID retrieval — the late-interaction fusion a
    * RAG stack actually runs, closing the grain gap between s16/s19
    * (doc-grain lexical ∘ doc-grain vector) and s18 (chunk-grain vector
    * alone): candidates are CHUNKS, the vector ranker is s18's MaxSim
    * restricted to the query side ([[chunkVecRank]] — a chunk's score
    * is its best match over the query's chunks), the lexical ranker is
    * s19's BM25 over the chunk-grain posting rows ([[chunkTokens]] —
    * document frequency, length normalization, and totals all at chunk
    * grain, where "document" IS the retrieval unit), and the two rank
    * lists fuse by the shared [[rrfFuse]]. Lexical recovers the
    * verbatim phrase whose embedding the hash blurs; vectors recover
    * the paraphrase sharing no tokens; the fused winner is the chunk a
    * reader would actually cite. Queries are docs 0–9 (their full
    * token sets and their chunk vectors), own-document chunks
    * excluded; output is top-10 CHUNKS per query by fused score.
    *
    * Scale shape: the vector side is the honest exact baseline any
    * s18-family index form drops into (rank-only fusion — the served
    * twin probes the stored chunk index instead); the lexical side is
    * one posting join at query grain (Σ df over query tokens, the
    * s16/s19 serving cost, over a posting table ~1.33× the doc-grain
    * one — overlap regions post twice); fusion joins two ≤20-row
    * frames per query. */
  def chunkHybrid(s: SparkSession, dir: String): DataFrame = {
    val cv = chunkVectors(s, dir)
    val vec = chunkVecRank(cv,
      cv.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("q"), col("s2")),
      excludeSelfDoc = true)
    val ctf = chunkTokens(docs(s, dir))
    val qtoks = tokRows(s, dir)
      .filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("tok"))
      .distinct()
    val lex = bm25Rank(qtoks, ctf, excludeSelf = true, k = 20,
        selfOf = shiftright(_, 12))
      .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_l"))
    rrfFuse(vec, lex)
  }

  /** Connected components over an undirected pair list via min-label
    * propagation run to FIXPOINT — the BSP shape GraphFrames/Pregel would
    * run at scale, expressed as plain shuffles: each round is one
    * equi-join + one min-aggregation.
    *
    * Convergence, not a fixed unroll: labels only ever decrease, so the
    * global label sum strictly decreases until the fixpoint — one scalar
    * per round decides termination (no row-level diff job). Each round's
    * labels are eagerly localCheckpoint-ed: without materialization,
    * lineage re-expands the whole prefix every round and a
    * join-per-round loop goes quadratic.
    *
    * The loop runs at its OWN partitioning, derived from the measured
    * node count, not the session's shuffle.partitions: the label/edge
    * frames are key-grain (|distinct doc ids in pairs| — orders of
    * magnitude below fact grain), and every round is a full stage-set
    * whose cost at that size is pure task scheduling. At 32 session
    * partitions a round on a few hundred labels measured 2–3 s of
    * overhead; collapsed to the size-appropriate count it is ~0.2 s,
    * while a billion-node graph at 100 TB still fans out. The
    * repartition column matches the groupBy key, so the explicit
    * exchange REPLACES the aggregation's (no extra shuffle).
    * `maxRounds` bounds the worst case (rounds needed =
    * ⌈component diameter / hopsPerRound⌉ + 1). */
  /** Frees a localCheckpoint's materialized blocks (df.unpersist is a
    * CacheManager no-op for them; the blocks belong to the LogicalRDD).
    * Walks EVERY LogicalRDD in the plan, not just the first: a caller
    * that checkpoints a multi-source frame (a union of two checkpointed
    * inputs, say) would otherwise leak every RDD after the first. */
  private[graft] def freeCkpt(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val edges0 = pairs.select(col("doc_a"), col("doc_b"))
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .persist()
    def checksum(labels: DataFrame): Long = {
      val r = labels.agg(sum(col("label"))).head
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val nodes0 = edges0.select(col("doc_a").as("doc_id")).distinct().persist()
    // Size the loop from the measured node count (~1M labels per loop
    // partition, capped at the session setting), then re-lay BOTH loop
    // frames at that partitioning: a labels layout left at the session's
    // partition count re-imposes session-grain stages on every round.
    val nNodes = nodes0.count()
    val sessionParts =
      pairs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts = math.max(1,
      math.min(sessionParts.toLong, nNodes / 1000000L + 1L).toInt)
    // localCheckpoint (eager) TRUNCATES LINEAGE, not just caches it: a
    // plain persist leaves the whole upstream candidate-generation plan
    // (here, the full d03 LSH chain) inside every loop frame's logical
    // plan, and each round's query re-canonicalizes and re-optimizes it —
    // measured 2-3 s of pure PLANNING per round on few-hundred-row
    // frames at sf0.1. After the checkpoint the loop plans against the
    // materialized RDD. (On a multi-node cluster with executor churn,
    // swap for reliable checkpoint(dir) — same shape, durable blocks.)
    var labels = nodes0.repartition(loopParts, col("doc_id"))
      .withColumn("label", col("doc_id"))
      .localCheckpoint()
    val edges = edges0.repartition(loopParts, col("doc_b")).localCheckpoint()
    nodes0.unpersist()
    edges0.unpersist()
    // HOP UNROLLING: on a key-grain label frame every round's cost is
    // task scheduling + planning, not data — measured ~0.21 s/round on a
    // 1828-node sf0.1 graph whatever the row count. So each
    // checkpoint/checksum ROUND runs `hopsPerRound` propagation HOPS
    // chained in ONE plan: rounds needed drop from the component
    // diameter D to ⌈D/k⌉ (+1 to observe the fixpoint) while the
    // per-round plan stays three small stage-sets. k = 3 is the measured
    // knee — at k = 5 Catalyst's re-optimization of the nested
    // join/agg chain costs more than the saved rounds (1.37 s vs
    // 0.37 s/round); pointer-doubling was measured and rejected too
    // (a local-min's label is itself, so l(l(v)) is usually a no-op
    // under min-label semantics: 15→11 hops for 2× the jobs). This is
    // what un-regressed d13 after the IMI cell structure produced a
    // longer-chained pair graph than the flat quantizer's.
    val hopsPerRound = 3
    var prevSum = checksum(labels)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      var cur = labels
      var h = 0
      while (h < hopsPerRound) {
        cur = cur.union(
            edges.join(cur.withColumnRenamed("doc_id", "doc_b"), "doc_b")
              .select(col("doc_a").as("doc_id"), col("label")))
          .repartition(loopParts, col("doc_id"))
          .groupBy("doc_id").agg(min("label").as("label"))
        h += 1
      }
      val next = cur.localCheckpoint()
      val nextSum = checksum(next)
      // next is already materialized (eager checkpoint): the previous
      // round's blocks can be dropped deterministically instead of
      // pinning up to maxRounds of label frames until driver GC.
      freeCkpt(labels)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      rounds += 1
    }
    freeCkpt(edges)
    if (!converged) freeCkpt(labels)
    // Fail loudly rather than return wrong labels: if a component's
    // diameter exceeds maxRounds the loop exits on the bound with labels
    // still in flight — silently handing those to a dedup pipeline would
    // under-merge clusters with no signal. Callers with genuinely deeper
    // graphs raise maxRounds (rounds needed =
    // ⌈component diameter / hopsPerRound⌉ + 1).
    require(converged,
      s"connectedComponents: not converged after $maxRounds rounds — " +
        "a component's diameter exceeds maxRounds; raise it")
    // The final labels are a checkpointed RDD: the caller's plan starts
    // from the materialized blocks, not the loop lineage. The frame is
    // key-grain (|distinct doc ids in pairs|) — tiny.
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** The candidate pair graph the TERMINAL dedup operators (d06/d07/t13)
    * consume: LSH candidates (d03's banded MinHash self-join) verified at
    * the exact-Jaccard threshold. This is the load-bearing choice for
    * 100 TB: d02's shingle self-join generates the same ≥0.8 pairs but
    * costs Σ_lang |docs|² — quadratic in corpus size — while the banded
    * join shuffles by (band, signature) bucket and only ever compares
    * colliding candidates. The trade is LSH recall: a true ≥0.8 pair is
    * caught with p = 1-(1-s⁴)⁴ (s = its Jaccard), ≈97% at s=0.9, ≈88% at
    * the 0.8 threshold — the standard dedup-pipeline contract (banding
    * tuned to the threshold), vs. a pipeline that cannot run at all.
    * Unlike d02's lang-blocked generator, the hash buckets are
    * lang-agnostic: a verbatim copy filed under two languages still
    * collides and merges (extra recall, not a false positive — every
    * candidate is verified against the true shingle sets).
    *
    * d08's edit-distance pairs are DELIBERATELY not unioned in: a
    * ≤10-edit match on a 20-char prefix window is evidence of a shared
    * opening, not of whole-document duplication — auto-merging on it
    * would chain documents that merely start alike. d08 stays a REPORT
    * of fuzzy candidates for human/threshold triage;
    * `connectedComponents` accepts any pairs frame, so a caller that
    * does want the union clusters
    * `lshPairs(...).union(dedupEditDistance(...).select(...))`
    * directly. */
  def lshPairs(s: SparkSession, dir: String): DataFrame =
    dedupMinhashLsh(s, dir)
      .filter(col("jaccard_ppm") >= 800000)
      .select("doc_a", "doc_b")

  /** d06: near-dup cluster resolution — true connected components of the
    * LSH-verified pair graph (convergence-driven; the oracle is a
    * recursive transitive closure over the same banded candidates, so
    * both sides compute the component minimum exactly, whatever the
    * component diameter). */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    clusterPairs(lshPairs(s, dir))

  /** d06's resolution at FRAME grain — cluster an arbitrary (doc_a,
    * doc_b) pair frame; streaming callers hand in their accumulated
    * pair log (CorpusService.refreshCanonicalCorpus), the batch path
    * hands in lshPairs.
    *
    * Materializes the pair frame ONCE (eager localCheckpoint) before
    * the fixpoint: connectedComponents references it in both union
    * orientations, and every downstream stage of the terminal
    * composition (d07's left join, t13's semi-joins) would otherwise
    * carry the full candidate-generation chain in its lineage and
    * re-derive it per reference — at sf0.1 that made d06 cost 2.6× d03
    * (7.8 s vs 3.0 s) for a loop over a few-hundred-row graph. The pair
    * frame itself is tiny (one row per verified near-dup pair), so the
    * checkpoint is cheap at any corpus size; its blocks are freed once
    * the component labels (their own checkpoint) exist. */
  private[graft] def clusterPairs(pairFrame: DataFrame): DataFrame = {
    val pairs = pairFrame.select("doc_a", "doc_b").localCheckpoint()
    val out = connectedComponents(pairs)
    freeCkpt(pairs)
    out
  }

  /** Incremental maintenance of clusterPairs' labels: given the PREVIOUS
    * label table and only the pairs appended since it was computed,
    * produce labels equal to a full recompute over the whole pair set —
    * without touching the components the delta never reaches.
    *
    * The equivalence argument: a label is the component's minimum doc id
    * (connectedComponents initializes label := doc_id and propagates
    * min), so every previous cluster collapses soundly to a STAR — an
    * edge from each member to its label, which is itself a doc id inside
    * that component. Components containing no endpoint of a new pair
    * cannot change (no new edge reaches them), so their rows carry over
    * verbatim; for the rest, the fixpoint reruns over (new pairs ∪ star
    * edges of every touched cluster), and min over the merged member
    * sets is the global min — exactly what the full recompute yields.
    * A new pair may merge two old clusters, extend one, or create a
    * brand-new component of previously-unpaired docs; all three are the
    * same code path (IncrementalClustersSpec pins each, ≡ clusterPairs
    * over the union).
    *
    * Scale: the delta-refresh cost is O(|new pairs| + |members of
    * touched clusters|) plus a fixpoint whose edge set is that same
    * frame — vs. the full recompute's O(|all pairs| × diameter). At
    * 100 TB the pair log is collision-grain but LONG-LIVED; a steady
    * trickle of arrivals touches a vanishing fraction of accumulated
    * clusters, which is what makes a per-drain canonical refresh
    * sustainable. */
  private[graft] def incrementalClusters(prevLabels: DataFrame,
                                         newPairs: DataFrame): DataFrame = {
    val np = newPairs.select("doc_a", "doc_b").distinct().localCheckpoint()
    val touched = np.select(col("doc_a").as("doc_id"))
      .union(np.select(col("doc_b").as("doc_id"))).distinct()
    // Checkpointed (it is |touched clusters|-grain — tiny) so the
    // returned plan is self-contained once np's blocks are freed.
    val affected = prevLabels.join(touched, Seq("doc_id"), "left_semi")
      .select("cluster_id").distinct().localCheckpoint()
    // Every member of a touched cluster re-enters the fixpoint via its
    // star edge (label-as-partner is a doc id of the same component);
    // members equal to their label are covered as the stars' endpoints.
    val stars = prevLabels.join(affected, Seq("cluster_id"), "left_semi")
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
    val relabeled = clusterPairs(np.unionByName(stars))
    freeCkpt(np)
    prevLabels.join(affected, Seq("cluster_id"), "left_anti")
      .select("doc_id", "cluster_id")
      .unionByName(relabeled)
  }

  /** s03: IVF-style ANN — √n hash-sampled coarse quantizer
    * (coarseCentroids), each vector assigned to its nearest centroid
    * cell, query probes the 12 nearest cells and re-ranks exactly within
    * them.
    *
    * Quality (AnnRecallSpec, recall@5 vs exact s01 on sf0.01, 32 sampled
    * cells): 4 probes measured 0.42, 8 → 0.52, 12 → 0.64 (asserted floor
    * 0.6), all 32 → 1.00 exactly (the probe-everything sanity bound —
    * within-cell re-ranking is exact, so scanning every cell IS s01).
    * nprobe is the recall/cost dial; the synthetic embeddings are
    * near-uniform (no cluster structure), so recall tracks the scanned
    * fraction (12/32 ≈ 37%, slightly LESS scanning than the previous
    * 4-of-10-linear-cells geometry at equal-or-better recall). On
    * clustered production embeddings the same operator concentrates
    * neighbors into few cells and the curve steepens.
    *
    * This is the partition-pruning scale path: cells become partition keys,
    * so a query touches |probed cells| / |cells| of the corpus instead of
    * all of it; the centroid table is tiny and broadcast, so assignment is
    * a narrow map over the corpus (no shuffle until the per-cell top-k). */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val books = coarseBooks(s, dir, e)
    val assigned = imiRankB(e, books, "vec_id", 1)
      .filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cent_id").as("cell"))
    val probes = imiRankB(e.filter(col("vec_id") < 10), books, "vec_id", 5)
      .filter(col("rn") <= 12)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cell"))
    val q = e.select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    probes.join(assigned, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s07: IVF ∘ prefix ANN — the composition the s06 scaladoc promises,
    * now as an operator: s03's coarse quantizer prunes CANDIDATES (each
    * query probes its 12 nearest of √n cells), s06's truncated-dimension
    * pass prunes BYTES-PER-SCORE within those cells (prefix cosine over
    * the 32-of-64-dim slice keeps top-100 per query), and the exact
    * 64-dim rerank runs at the doubly-pruned grain. This is the
    * production ANN shape: at 100 TB a query scores |probes|/|cells| of
    * the corpus from the PREFIX sidecar (half the vector bytes), then
    * fetches ~100 full vectors by key join — full vectors are never
    * scanned in a scoring loop. PlanSpec pins the composition order
    * (cell equi-join below the prefix top-100 filter below the rerank
    * window); AnnRecallSpec pins recall@5 ≥ 0.6 (s03's floor) — the
    * prefix pass can only drop candidates s03 kept, and measured on
    * sf0.01 it drops none: composed recall 0.640, identical to s03's
    * (the ~12·√n cell candidates per query shrink to 100, and the true
    * top-5 all survive the prefix cut — consistent with s06's 0.96
    * global prefix-retention). */
  def annIvfPrefix(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val books = coarseBooks(s, dir, e)
    val assigned = imiRankB(e, books, "vec_id", 1)
      .filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cent_id").as("cell"))
    val probes = imiRankB(e.filter(col("vec_id") < 10), books, "vec_id", 5)
      .filter(col("rn") <= 12)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cell"))
    val cellCand = probes.join(assigned, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    // Prefix coarse pass at cell-candidate grain: scores read ONLY the
    // 32-dim prefix frame (the sidecar column at scale).
    val pfx = e.select(col("vec_id"), expr("slice(q, 1, 32)").as("qp"))
      .withColumn("sp", DotI64(col("qp"), col("qp")))
    val qp = pfx.select(col("vec_id").as("query_id"),
      col("qp").as("qpa"), col("sp").as("spa"))
    val np = pfx.select(col("vec_id").as("neighbor_id"),
      col("qp").as("qpb"), col("sp").as("spb"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("neighbor_id").asc)
    val cand = cellCand.join(qp, "query_id").join(np, "neighbor_id")
      .withColumn("pdot", DotI64(col("qpa"), col("qpb")))
      .withColumn("pcos",
        floor(col("pdot") / (sqrt(col("spa")) * sqrt(col("spb")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= 100)
      .select("query_id", "neighbor_id")
    // Exact rerank at the doubly-pruned candidate grain.
    val q = e.select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s11: metadata-FILTERED ANN — top-5 by cosine among vectors sharing
    * the query's `label`, the filtered-vector-search shape every real
    * serving deployment needs (search within a tenant / language /
    * license class) and the one pure-ANN operators s01–s08 don't cover.
    *
    * This is POST-FILTERED IVF with the filter at CANDIDATE grain:
    * s03's probe (12 nearest of √n cells) generates candidates, the
    * label equality prunes them BEFORE any full-width dot product, and
    * the exact rerank runs only on same-label survivors — the filter
    * costs a key-join against the thin (vec_id, label) metadata frame,
    * never a scan of vector payloads. At 100 TB the same plan reads the
    * stored index (s08's layout) with `label` as an index column, so
    * the predicate pushes into the partition-pruned parquet scan;
    * PlanSpec pins the filter below the rerank window here. The
    * alternative — rerank first, filter after — breaks top-k semantics
    * (k survivors of an unfiltered top-k ≠ top-k of the filtered set);
    * recall vs the exact FILTERED baseline is pinned in AnnRecallSpec.
    *
    * With ~uniform labels (10 classes) each query's candidate set
    * shrinks ~10×, so filtered probing at equal nprobe is CHEAPER than
    * unfiltered — and the dial a deployment turns is nprobe: the
    * filtered truth set is FARTHER away (the query's true same-label
    * top-5 spread over more cells when 9/10 of every cell is filtered
    * out), so s11 probes 20 cells where s03 probes 12 — measured
    * recall@5 vs the exact filtered baseline 0.50 at 12 probes, back
    * at s03's floor by 20 (AnnRecallSpec pins ≥ 0.6). Total work still
    * UNDER s03's: 20 probed cells × ~1/10 label survivors is fewer
    * full-width dots than 12 cells unfiltered. */
  def annIvfFiltered(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val lab = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("label"))
    val books = coarseBooks(s, dir, e)
    val assigned = imiRankB(e, books, "vec_id", 1)
      .filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cent_id").as("cell"))
      .join(lab.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), "neighbor_id")
    val probes = imiRankB(e.filter(col("vec_id") < 10), books, "vec_id", 5)
      .filter(col("rn") <= 20)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cell"))
      .join(lab.select(col("vec_id").as("query_id"),
        col("label").as("q_label")), "query_id")
    val q = e.select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    probes.join(assigned, "cell")
      .filter(col("neighbor_id") =!= col("query_id") &&
        col("n_label") === col("q_label"))
      .join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("q_label").as("label"),
        col("neighbor_id"), col("cos_ppm"), col("rank"))
  }

  /** Materialized ANN index locations, one per corpus dir (built once
    * per JVM; the build is the offline indexing job, the queries read).
    * Mirror of the corpusCount/bloomCache memos, with the same
    * invalidation contract for corpora that grow. */
  private val annIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Drop the memoized index for `dir` — REQUIRED before querying a
    * corpus that has grown since the index was built (a stale index
    * silently misses every vector ingested after the build; same
    * staleness contract as invalidateCorpusCount/invalidateBloom). */
  private[graft] def invalidateAnnIndex(dir: String): Unit =
    annIndexCache.remove(dir)

  /** s08/s09's storage half: materialize the IVF layout as ONE
    * self-describing warehouse artifact, hive-partitioned by `cell` —
    * the engine's analogue of the reference's ORDER-BY-key read
    * locality (initial_load_generate_postgres_data.py:98,109,119): the
    * linear assignment work s03/s05/s07 re-derive per invocation
    * becomes storage, and queries read |touched cells| / |cells| of the
    * index files via partition pruning instead of scanning and
    * re-assigning the corpus.
    *
    * Layout: one row per (vector, top-4 cell) with the assignment rank
    * `rn` — rn=1 rows carry the ANN serving payload (32-dim prefix
    * `qp`, prefix norm `sp`, full norm `s2`); rn>1 rows carry NULLs
    * there (parquet nulls cost ~nothing), existing only as thin
    * (cell, vec_id) membership rows. One artifact thus serves BOTH
    * consumers: s08 reads rn=1 + prefix bytes under partition pruning,
    * s09/the dedup family read the thin top-4 membership (s05's
    * multi-assignment, exactly). Full vectors are NOT in the index —
    * reranks fetch them by key join, so index bytes stay ~half the
    * corpus bytes plus the thin membership rows.
    *
    * The quantizer that assigned the rows is persisted WITH them
    * (`_quantizer` sidecar — underscore dirs are invisible to the
    * parquet read): index rows are only meaningful relative to their
    * centroid set, serving must probe the SAME set (a probe against a
    * re-derived quantizer could disagree with stored cells), and the
    * append path must extend under it. Epoch contract mirrors
    * StreamingSemanticDedup.retrain: within an epoch the quantizer is
    * immutable; a retrain is a REBUILD, never an append. */
  /** The (vec_id, label) metadata frame of an embeddings source, when
    * it carries one — the single rule every index build/append path
    * shares, so a layout is labeled iff its corpus is and build, append
    * and rebuild can never disagree about the schema (the streaming
    * service ingests label-less (vec_id, embedding) waves → null label
    * column; the batch testdata dirs carry labels → indexed labels). */
  private[graft] def metaOf(src: DataFrame): Option[DataFrame] =
    if (src.columns.contains("label"))
      Some(src.select(col("vec_id"), col("label").cast("int")))
    else None

  private[graft] def buildAnnIndex(s: SparkSession, dir: String,
                                   path: String): Unit = {
    val e = quantized(s, dir)
    buildAnnIndexFrom(e, coarseCodebooks(s, dir, e), path,
      meta = metaOf(Tables.t(s, dir, "embeddings")))
  }

  /** Core of the build, parameterized by the quantizer frame — callers
    * that own a persisted quantizer epoch (CorpusService) pass it here;
    * the batch memo path derives it from the corpus. `meta` is the
    * optional (vec_id, label) metadata frame: filtered serving (s12)
    * answers metadata predicates FROM the index rows, the way every
    * production vector store co-locates filterable attributes with the
    * index — a corpus-grain metadata join at query time is exactly the
    * scan the index exists to avoid. Callers without metadata (the
    * streaming service's label-less corpus) get a null label column, so
    * the layout's schema — and therefore the append path — is identical
    * either way. */
  /** `sq8` is the SQ8 range frame and `pq` the PQ codebook frame to
    * encode the two code payloads under — callers that own persisted
    * epochs (the append path, the frozen-rebuild spec twins) pass
    * them; the build path derives both from the corpus and persists
    * them as the `_sq8` / `_pq` sidecars. */
  private[graft] def buildAnnIndexFrom(e: DataFrame, cents: DataFrame,
                                       path: String,
                                       meta: Option[DataFrame] = None,
                                       sq8: Option[DataFrame] = None,
                                       pq: Option[DataFrame] = None): Unit = {
    // One tiny (1-row) frame read by both the data write and the sidecar
    // write; localCheckpoint stops the second write re-running the
    // corpus-grain min/max agg it derives from. The PQ codebooks (≈256
    // rows/subspace) get the same treatment — their derivation counts
    // and samples the corpus.
    val ranges = sq8.getOrElse(sq8Ranges(e)).localCheckpoint()
    val books = pq.getOrElse(pqCodebooks(e, e.count())).localCheckpoint()
    try {
      indexRows(e, cents, meta, ranges, books)
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
      // After the data write: overwrite mode clears `path` first, which
      // would take a pre-written sidecar with it.
      cents.write.mode("overwrite").parquet(path + "/_quantizer")
      ranges.write.mode("overwrite").parquet(path + "/_sq8")
      books.write.mode("overwrite").parquet(path + "/_pq")
    } finally { freeCkpt(ranges); freeCkpt(books) }
  }

  private def indexRows(e: DataFrame, cents: DataFrame,
                        meta: Option[DataFrame],
                        sq8: DataFrame, pqBooks: DataFrame): DataFrame = {
    val assigned = imiRank(e, cents, "vec_id", 2)
      .filter(col("rn") <= 4)
      .select(col("vec_id"), col("rn"), col("cent_id").as("cell"))
    val pfx = e.select(col("vec_id"), expr("slice(q, 1, 32)").as("qp"),
        col("s2"))
      .withColumn("sp", DotI64(col("qp"), col("qp")))
    // The SQ8 payload rides the rn=1 rows beside the prefix: codes are
    // 1 byte/dim (vs the prefix's 8 B/dim over half the dims), css is
    // the precomputed code-norm — s17's coarse pass reads ONLY these.
    val codes = sq8EncodeWith(e, sq8)
      .select(col("vec_id"), col("codes"), col("ss").as("css"))
    // The PQ payload: 4 codebook ids per vector (4 bytes at scale once
    // ids remap to byte codes; longs here) + the reconstruction norm —
    // s21's ADC pass reads ONLY these. The struct sort keys on `sub`,
    // so the array is subspace-ordered deterministically.
    val pqc = pqEncodeWith(e, pqBooks)
      .groupBy("vec_id")
      .agg(expr(
        """transform(array_sort(collect_list(named_struct('sub', sub,
          |  'c', cent_id))), x -> x.c)""".stripMargin).as("pq"),
        sum(col("scs")).as("spq"))
    val labeled = meta match {
      // Metadata rides on EVERY row (membership rows included): the
      // filtered candidate pass reads thin (cell, vec_id, label) rows,
      // and 4 bytes per row is noise next to the rn=1 prefix payload.
      case Some(m) => assigned.join(
        m.select(col("vec_id"), col("label").cast("int")), Seq("vec_id"), "left")
      case None    => assigned.withColumn("label", lit(null).cast("int"))
    }
    labeled.join(pfx, "vec_id").join(codes, "vec_id").join(pqc, "vec_id")
      .select(col("vec_id"), col("rn"),
        when(col("rn") === 1, col("qp")).as("qp"),
        when(col("rn") === 1, col("sp")).as("sp"),
        when(col("rn") === 1, col("s2")).as("s2"),
        when(col("rn") === 1, col("codes")).as("codes"),
        when(col("rn") === 1, col("css")).as("css"),
        when(col("rn") === 1, col("pq")).as("pq"),
        when(col("rn") === 1, col("spq")).as("spq"),
        col("label"),
        col("cell"))
  }

  /** Incremental index maintenance — the append path a growing corpus
    * needs (rebuilding n rows to admit a batch of b is O(n) wasted work
    * at 100 TB): assign ONLY not-yet-indexed vectors, under the index's
    * own frozen sidecar quantizer, and append their rows as new files
    * inside the hive-partitioned layout — no existing file is touched,
    * so concurrent index readers see the old row set or the new one
    * per their plan-time file listing, never a torn row (the append-only
    * log contract the dedup pair logs already carry).
    *
    * `newVectors` (vec_id, embedding): callers that track their ingest
    * batch pass it directly — O(batch) work, the per-wave maintenance
    * cost. When absent, new ids are discovered by anti-joining the
    * corpus against the index's id column (a column-pruned scan of the
    * index: no prefix bytes are read). */
  private[graft] def appendAnnIndex(s: SparkSession, dir: String,
                                    path: String,
                                    newVectors: Option[DataFrame] = None)
      : Unit = {
    val newQ = newVectors
      .map(f => quantizeFrame(f.select(col("vec_id"), col("embedding"))))
      .getOrElse(quantized(s, dir)
        .join(s.read.parquet(path).select("vec_id"), Seq("vec_id"), "left_anti"))
    // Metadata contract mirrors the build (metaOf's column-presence
    // rule, applied to whichever frame supplies the new vectors): an
    // append must not hide rows from the filtered read the build made
    // visible, nor invent a label column the layout doesn't have.
    // Corollary for explicit-batch callers: on a LABELED layout the
    // batch frame must CARRY its labels — a label-less explicit frame
    // would append null-label rows that the filtered read (s12) can
    // never return. The guard below makes that mistake fail loudly
    // (one column-pruned limit-1 probe of the stored label column,
    // paid only on the label-less-explicit-batch path); the discovery
    // path is immune (it reads the corpus table, labels and all).
    val meta = metaOf(newVectors.getOrElse(Tables.t(s, dir, "embeddings")))
    if (newVectors.isDefined && meta.isEmpty) {
      val layoutLabeled = !s.read.parquet(path)
        .where(col("label").isNotNull).limit(1).isEmpty
      require(!layoutLabeled,
        s"appendAnnIndex: index at $path has a labeled layout but the " +
          "explicit batch carries no label column; rows appended without " +
          "labels would be invisible to filtered serving (s12). Pass the " +
          "batch with its (vec_id, label) metadata.")
    }
    // Codes for the new rows are encoded under the index's own FROZEN
    // range epoch (`_sq8` sidecar — out-of-range arrivals saturate),
    // exactly as cells come from the frozen `_quantizer`: an append
    // never moves either epoch; a range refresh is a retrain-class
    // event (rebuild, staged swap).
    appendAnnIndexFrom(s, path, newQ, meta)
  }

  /** The grain-agnostic append core: `newQ` is an ALREADY-QUANTIZED
    * (vec_id, q, s2) frame assigned and encoded under the index's own
    * frozen sidecars — the chunk-grain index (integer-derived vectors,
    * no quantizeFrame, no label layout) appends through this directly;
    * [[appendAnnIndex]] is the embeddings-table form with discovery and
    * the label-layout guard above it. */
  /** Read an index sidecar, failing LOUDLY when the index predates the
    * payload epoch that sidecar carries: an index built before the
    * SQ8/PQ payloads exist has no `codes`/`pq` columns either, so an
    * append or code-served query against it cannot be made consistent —
    * the raw missing-path AnalysisException it would otherwise throw
    * says nothing about the fix. A sidecar refresh is a retrain-class
    * event: delete the index directory and rebuild (refreshAnnIndex /
    * refreshChunkIndex take the build path when the dir is gone). */
  /** Read an index's `_quantizer` sidecar, failing LOUDLY when the
    * index predates the two-level quantizer epoch: a flat (cent_id,
    * qc, sc) sidecar has no `sub` column, its stored cells are single
    * centroid ids rather than packed sub-cell pairs, and no probe
    * against it can be made consistent with the IMI assigner — the
    * raw unresolved-column error it would otherwise throw says nothing
    * about the fix. Same contract as [[sidecarOf]]: a quantizer-format
    * migration is a retrain-class event — delete the index directory
    * and rebuild. */
  private def quantizerOf(s: SparkSession, path: String): DataFrame = {
    val q = sidecarOf(s, path, "_quantizer")
    require(q.columns.contains("sub"),
      s"ANN index at $path predates the two-level (IMI) quantizer epoch " +
        "(flat _quantizer sidecar, no `sub` column): its stored cells " +
        "are single centroid ids, which the product-cell prober cannot " +
        "serve consistently. Rebuild the index — a quantizer-format " +
        "migration is a retrain-class event (delete the index directory " +
        "and run the build/refresh path again).")
    q
  }

  private def sidecarOf(s: SparkSession, path: String,
                        name: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$name")
    require(
      p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p),
      s"ANN index at $path predates the $name payload epoch (no $name " +
        "sidecar): its stored rows carry no matching codes, so appending " +
        "or serving under this epoch is impossible. Rebuild the index — " +
        "a sidecar refresh is a retrain-class event (delete the index " +
        "directory and run the build/refresh path again).")
    s.read.parquet(s"$path/$name")
  }

  private[graft] def appendAnnIndexFrom(s: SparkSession, path: String,
                                        newQ: DataFrame,
                                        meta: Option[DataFrame] = None)
      : Unit = {
    val cents = quantizerOf(s, path)
    indexRows(newQ, cents, meta, sidecarOf(s, path, "_sq8"),
        sidecarOf(s, path, "_pq"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Compaction for the APPEND-MAINTAINED index: every append adds one
    * file set per touched cell, so a long-lived index's file count
    * tracks the append count — the same unbounded-growth failure the
    * dedup logs have, paid at query PLANNING time (file listing) rather
    * than read time. The rewrite collapses each cell back to the
    * shuffle's output files, `distinct()` absorbing the one duplicate
    * source appends can physically produce (a crash-replayed
    * appendAnnIndex re-adding its batch — index rows are unique per
    * (vec_id, rn) otherwise), and carries the `_quantizer` sidecar into
    * the staged artifact unchanged: compaction is a FILE-layout
    * operation, the epoch does not move. Same fingerprint guard +
    * staged swap as the log compactions — a concurrent append parks the
    * rewrite and returns false; run it in the same quiesced windows
    * (CorpusService.compactQuiesced does). */
  private[graft] def tryCompactAnnIndex(s: SparkSession,
                                        path: String): Boolean =
    graft.jobs.Warehouse.guardedRewrite(s, path) { stage =>
      s.read.parquet(path).distinct()
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(stage)
      // Carry whichever sidecars this index's epoch has — compaction is
      // a file-layout operation and must not demand a payload epoch the
      // index predates (sidecarOf's rebuild contract is for
      // append/serving, where the codes are actually consumed).
      Seq("_quantizer", "_sq8", "_pq").foreach { sc =>
        val sp = new org.apache.hadoop.fs.Path(s"$path/$sc")
        if (sp.getFileSystem(s.sparkContext.hadoopConfiguration).exists(sp))
          s.read.parquet(s"$path/$sc")
            .write.mode("overwrite").parquet(s"$stage/$sc")
      }
    }

  private def annIndexPath(s: SparkSession, dir: String): String =
    annIndexCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-annidx")
        .toFile.getAbsolutePath
      buildAnnIndex(s, dir, p)
      p
    })

  private def annIndex(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(annIndexPath(s, dir))

  /** s08: ANN served off the STORED index — semantically ≡ s07 (same
    * probes, same prefix cut, same exact rerank; AnnIndexSpec pins the
    * outputs identical), but the corpus-wide cell assignment is READ,
    * not recomputed. The probe→index join is on the index's hive
    * partition column, so Catalyst inserts a dynamic partition-pruning
    * filter on the index scan (PlanSpec pins it): only probed cells'
    * files are opened — at 100 TB an ANN query touches
    * |probes|/|cells| ≈ 12/√n of the index, reads prefix bytes only,
    * and fetches ~100 full vectors per query by key join. The once-per-
    * corpus build is the offline indexing job every IVF system runs;
    * queries amortize it. */
  def annIvfIndexed(s: SparkSession, dir: String): DataFrame =
    annIvfIndexedAt(s, dir, annIndexPath(s, dir))

  /** [[annIvfIndexed]] at an explicit probe width — the serving dial
    * (AnnRecallSpec prices two settings against the exact scan). */
  def annIvfIndexed(s: SparkSession, dir: String, nprobe: Int): DataFrame =
    annIvfIndexedAt(s, dir, annIndexPath(s, dir), nprobe = nprobe)

  /** s24: SERVING-QUALITY AUDIT — per-query recall@5 of the
    * index-served IVF path (s08) against the exact scan (s01), the
    * health metric an ANN deployment watches continuously: approximate
    * retrieval trades recall for the cell-probe cost model, and the
    * trade drifts as the corpus grows within a quantizer epoch (cells
    * fill unevenly; the probe budget covers less of the mass), so the
    * audit runs on a schedule and its drop is what triggers a retrain
    * in practice. Both sides are the deterministic operators already
    * oracle-pinned (ties broken by neighbor_id), so the audit itself is
    * hash-exact. Scale: the exact side is the honest cost (one |Q|·n
    * scan at audit cadence, |Q| = the fixed probe set — NOT per user
    * query); the served side is the pruned index read. Columns:
    * (query_id, n_hit, k, recall_ppm), truncating-div ppm. */
  def recallAudit(s: SparkSession, dir: String): DataFrame =
    recallAuditOf(annCosineTopK(s, dir), annIvfIndexed(s, dir))

  /** The audit core over any (exact, served) top-k pair — shared with
    * the maintained service, whose two sides are the tombstone-filtered
    * live corpus and the stored-index read path. */
  private[graft] def recallAuditOf(exactTopK: DataFrame,
                                   servedTopK: DataFrame): DataFrame = {
    val exact = exactTopK.select("query_id", "neighbor_id")
    val served = servedTopK.select("query_id", "neighbor_id")
    val hits = exact.join(served, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    exact.groupBy("query_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .select(col("query_id"), col("n_hit"), col("k"),
        expr("n_hit * 1000000 div k").as("recall_ppm"))
  }

  /** s08's read path over an EXPLICIT index location — the serving
    * entry for callers that maintain the index as a warehouse artifact
    * (CorpusService.refreshAnnIndex) rather than through the per-JVM
    * memo. Probes score against the index's own sidecar quantizer, so
    * serving is always consistent with the epoch that assigned the
    * stored rows — probes and assignments cannot disagree, whatever
    * grew or retrained in between. */
  def annIvfIndexedAt(s: SparkSession, dir: String,
                      indexPath: String,
                      dropIds: Option[DataFrame] = None,
                      nprobe: Int = DefaultNprobe): DataFrame =
    annIvfIndexedQueries(s, dir,
      Tables.t(s, dir, "embeddings").filter(col("vec_id") < 10),
      indexPath, excludeSelf = true, dropIds = dropIds, nprobe = nprobe)

  /** s08's serving entry for an ARBITRARY query frame — the production
    * shape, where queries are EXTERNAL vectors (a user request, another
    * table's embeddings), not rows of the indexed corpus. `queries` is
    * (vec_id, embedding); everything else is s08 exactly: probes score
    * against the index's sidecar quantizer, candidates come from the
    * partition-pruned index read (prefix bytes only), the exact rerank
    * fetches ~100 full corpus vectors per query by key join. The corpus
    * form above is this with `queries` = the benchmark's fixed corpus
    * rows and `excludeSelf` on — external callers leave `excludeSelf`
    * off, because their ids share no space with the corpus's and an
    * accidental numeric collision must not drop a true neighbor
    * (AnnIndexSpec pins an identical-vector external query ranking its
    * corpus twin first at cos 1e6). */
  /** `k` is the returned depth (default 5, the benchmark grain); the
    * candidate pass is always top-100, so any k ≤ 100 reads the same
    * pruned index rows — the served hybrid (CorpusService.hybridTopKFor)
    * takes its vector top-20 through this. */
  def annIvfIndexedQueries(s: SparkSession, dir: String, queries: DataFrame,
                           indexPath: String,
                           excludeSelf: Boolean = false,
                           k: Int = 5,
                           dropIds: Option[DataFrame] = None,
                           nprobe: Int = DefaultNprobe): DataFrame =
    annIvfIndexedOver(s, quantized(s, dir), quantizeFrame(queries),
      indexPath, excludeSelf, k, dropIds, nprobe)

  /** The default probe width of the served IVF read path — the one the
    * benchmark queries and the s03 oracle pin (12 of the P=5 product
    * ranking's 25 cells). Deployments turn [[annIvfIndexedQueries]]'
    * `nprobe` per request class; the recall audit prices each setting
    * (the audit log records the width per row). */
  val DefaultNprobe = 12

  /** The grain-agnostic core of indexed ANN serving: `corpus` and `eq`
    * are ALREADY-QUANTIZED (vec_id, q, s2) frames, so the same read
    * path serves doc-grain embeddings (the forms above) and the
    * chunk-grain index ([[chunkVectors]] — RAG's serving grain), where
    * vectors are integer-derived and never pass through quantizeFrame. */
  private[graft] def annIvfIndexedOver(s: SparkSession, corpus: DataFrame,
                                       eq: DataFrame, indexPath: String,
                                       excludeSelf: Boolean,
                                       k: Int,
                                       dropIds: Option[DataFrame] = None,
                                       nprobe: Int = DefaultNprobe)
      : DataFrame = {
    require(nprobe >= 1, "annIvfIndexedOver: nprobe must be >= 1")
    // `dropIds` is the TOMBSTONE dial (CorpusService.deleteDocs): a thin
    // (vec_id) frame of deleted rows filtered out of the index read, so
    // serving equals a rebuild-without-the-docs under the same epoch,
    // until compaction physically removes them.
    val idx0 = s.read.parquet(indexPath).filter(col("rn") === 1)
    val idx = dropIds.fold(idx0)(d =>
      idx0.join(d.select(col("vec_id")), Seq("vec_id"), "left_anti"))
    val cents = quantizerOf(s, indexPath)
    // Hive partition values round-trip through directory names; cast the
    // probe side to the scan's inferred type so the join key is the bare
    // partition attribute (a cast on the scan side would defeat pruning).
    val cellT = idx.schema(idx.schema.fieldIndex("cell")).dataType
    // The ranking width covers the probe budget (perHalf² ranked
    // product cells ≥ nprobe) and never shrinks below the default 5 —
    // the P=5 ranking's top-12 is what the s03/s08 oracles pin, so a
    // SMALLER nprobe is a pure prefix of the pinned ranking, and a
    // larger one widens the ranking only as far as it must.
    val perHalf = math.max(5, math.ceil(math.sqrt(nprobe.toDouble)).toInt)
    val probes = imiRank(eq, cents, "vec_id", perHalf)
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"),
        col("cent_id").cast(cellT).as("cell"))
    // Candidate generation reads the index: neighbor prefixes and norms
    // come from the pruned index rows, not a corpus scan.
    val qp = eq
      .select(col("vec_id").as("query_id"), expr("slice(q, 1, 32)").as("qpa"))
      .withColumn("spa", DotI64(col("qpa"), col("qpa")))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("neighbor_id").asc)
    val hits = idx.join(broadcast(probes), "cell")
    val cand = (if (excludeSelf) hits.filter(col("vec_id") =!= col("query_id"))
                else hits)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qp").as("qpb"), col("sp").as("spb"))
      .join(broadcast(qp), "query_id")
      .withColumn("pdot", DotI64(col("qpa"), col("qpb")))
      .withColumn("pcos",
        floor(col("pdot") / (sqrt(col("spa")) * sqrt(col("spb")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= 100)
      .select("query_id", "neighbor_id")
    // Exact rerank at the doubly-pruned grain: query vectors from the
    // caller's frame, full neighbor vectors by key join into the corpus.
    val q = eq.select(col("vec_id").as("query_id"), col("q").as("qa"), col("s2").as("sa"))
    val n = corpus
      .select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_ppm", "rank")
  }

  /** s12: FILTERED ANN served off the STORED index — s11's semantics
    * (top-5 by cosine within the query's label) with both the
    * corpus-wide cell assignment AND the label metadata READ from the
    * index instead of recomputed/joined per invocation. This is how a
    * production vector store answers filtered queries: the label rides
    * in the index rows (indexRows co-locates it), so the candidate pass
    * reads thin (cell, vec_id, label) tuples of the probed cells —
    * partition-pruned on `cell`, label equality applied right at the
    * pruned scan, full vectors fetched by key join only for same-label
    * survivors. No corpus-grain metadata join exists at query time; the
    * only corpus-grain work left is the rerank's key-join fetch.
    *
    * The query's OWN label comes from the query frame (a filtered
    * request names its filter), probes score against the sidecar
    * quantizer (the epoch that assigned the stored rows), and the
    * result is row-for-row ≡ s11's recompute path — AnnIndexSpec pins
    * the equivalence, and one oracle text serves both registrations
    * (the s07/s08 sharing pattern). */
  def annIvfFilteredIndexed(s: SparkSession, dir: String): DataFrame =
    annIvfFilteredQueries(s, dir,
      Tables.t(s, dir, "embeddings").filter(col("vec_id") < 10),
      annIndexPath(s, dir), excludeSelf = true)

  /** s12's serving entry for an ARBITRARY filtered query frame — the
    * request path of filtered vector search ("top-k within label L for
    * this vector"): `queries` is (vec_id, embedding, label), where
    * `label` names each request's filter — it need not be a label the
    * query vector itself carries in the corpus. Everything else is s12
    * exactly: probes score against the sidecar quantizer, candidates
    * come from the partition-pruned index read with the label equality
    * at the pruned scan, the rerank fetches full corpus vectors for
    * same-label survivors only. The corpus form above is this with the
    * benchmark's fixed corpus rows and `excludeSelf` on — external
    * callers leave it off (their ids share no space with the corpus's;
    * the annIvfIndexedQueries contract). */
  def annIvfFilteredQueries(s: SparkSession, dir: String, queries: DataFrame,
                            indexPath: String,
                            excludeSelf: Boolean = false,
                            dropIds: Option[DataFrame] = None): DataFrame = {
    val idx0 = s.read.parquet(indexPath).filter(col("rn") === 1)
    val idx = dropIds.fold(idx0)(d =>
      idx0.join(d.select(col("vec_id")), Seq("vec_id"), "left_anti"))
    val eq = quantizeFrame(queries)
    val cents = quantizerOf(s, indexPath)
    val cellT = idx.schema(idx.schema.fieldIndex("cell")).dataType
    val qlab = queries.select(col("vec_id").as("query_id"),
      col("label").cast("int").as("q_label"))
    val probes = imiRank(eq, cents, "vec_id", 5)
      .filter(col("rn") <= 20)
      .select(col("vec_id").as("query_id"),
        col("cent_id").cast(cellT).as("cell"))
      .join(qlab, "query_id")
    val hits0 = idx.join(broadcast(probes), "cell")
      .filter(col("label") === col("q_label"))
    val hits = (if (excludeSelf) hits0.filter(col("vec_id") =!= col("query_id"))
                else hits0)
      .select(col("query_id"), col("q_label"), col("vec_id").as("neighbor_id"))
    val q = eq.select(col("vec_id").as("query_id"), col("q").as("qa"),
      col("s2").as("sa"))
    val n = quantized(s, dir).select(col("vec_id").as("neighbor_id"),
      col("q").as("qb"), col("s2").as("sb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
    hits.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("q_label").as("label"),
        col("neighbor_id"), col("cos_ppm"), col("rank"))
  }

  /** s04: per-language embedding centroids — element-wise mean pooling
    * over the quantized vectors (embeddings joined to documents by id).
    * Integer sums per (lang, dim) are exact and order-free; the mean is a
    * single integer division. This is the class-centroid / mean-pooling
    * primitive (and the training step IVF's coarse quantizer would use);
    * the dim explode keeps rows narrow and the aggregation map-side
    * combinable. */
  def langCentroids(s: SparkSession, dir: String): DataFrame = {
    val langs = docs(s, dir).select(col("doc_id").as("vec_id"), col("lang"))
    quantized(s, dir)
      .join(langs, "vec_id")
      .select(col("lang"), posexplode(col("q")))
      .select(col("lang"), (col("pos") + 1).as("dim"), col("col").as("v"))
      .groupBy("lang", "dim")
      .agg(count(lit(1)).as("n_vecs"),
        idiv(sum(col("v")), count(lit(1))).as("centroid_ppm"))
  }

  /** s10: embedding-outlier quality filtering — the curation step that
    * sits NEXT TO SemDeDup in an embedding-curated pipeline: SemDeDup
    * (s05/d13) drops what is too CLOSE to a neighbor; this flags what
    * is too FAR from its class — each document scored by the cosine of
    * its embedding to its language's centroid direction, flagged when
    * anti-aligned (cos < 0: mislabeled language, corrupt embedding, or
    * off-distribution content). The centroid is the per-lang integer
    * SUM vector, never the mean: cosine is scale-invariant, so the sum
    * spans the same direction with exact integer arithmetic — the
    * divisionless twin of the ppm-ratio trick, and why both engines
    * agree bit-for-bit.
    *
    * Scale shape: the sum vectors are one dim-grain hash agg (map-side
    * combinable integer sums, s04's shape) collapsed to |langs| array
    * rows and BROADCAST back, so scoring is one codegen DotI64 per
    * document riding the broadcast — the only corpus-grain shuffle is
    * the standard docs⋈embeddings id join every embedding operator
    * pays (co-partitioned at scale). */
  def centroidOutliers(s: SparkSession, dir: String): DataFrame = {
    val langs = docs(s, dir).select(col("doc_id").as("vec_id"), col("lang"))
    val e = quantized(s, dir).join(langs, "vec_id")
    val sumVecs = e.select(col("lang"), posexplode(col("q")))
      .select(col("lang"), col("pos"), col("col").as("v"))
      .groupBy("lang", "pos").agg(sum(col("v")).as("sv"))
      .groupBy("lang")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
        x => x.getField("sv")).as("cq"))
      .withColumn("cs2", DotI64(col("cq"), col("cq")))
    e.join(broadcast(sumVecs), "lang")
      .withColumn("dot", DotI64(col("q"), col("cq")))
      .select(col("vec_id"), col("lang"),
        floor(col("dot") / (sqrt(col("s2")) * sqrt(col("cs2")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("cos_ppm"))
      .withColumn("is_outlier", when(col("cos_ppm") < 0, 1).otherwise(0))
  }

  // ------------------------------------------------------------ text analysis

  /** t01: token counting — whitespace + regex (BPE-ish) + distinct. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      length(col("text")).as("n_chars_measured"),
      size(split(col("text"), " ")).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("n_regex_tokens"),
      size(array_distinct(split(col("text"), " "))).as("n_distinct_tokens"))

  /** t21: n-gram novelty — the corpus-diversity diagnostic curation runs
    * beside dedup: for each document (in ingest/id order), what fraction
    * of its distinct 3-gram shingles was never seen in ANY earlier
    * document? A verbatim copy scores 0; the corpus's novelty decay
    * curve (novelty vs doc_id) is how a growing crawl is monitored for
    * saturation — when marginal novelty flattens, more of the same
    * source stops adding information. Reuses the d02/d03 shingle
    * generator verbatim, so "seen" means exactly what the dedup family
    * means by it.
    *
    * Shape: first-seen is ONE hash agg over the shingle stream
    * (min(doc_id) per shingle — the d11 substring-table idiom), joined
    * back at shingle grain, then a per-doc count agg; shuffles key on
    * shingle then doc_id, no window over the corpus and no pair join
    * anywhere, so it scales like d01, not like d02. At 100 TB the
    * first-seen table is the incrementally-maintained artifact (same
    * delta posture as d10: a new wave's grams min-merge into it);
    * this is the batch form. Docs with < 3 tokens carry n_grams = 0
    * and a NULL novelty (kept by the left join to the corpus spine). */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame =
    ngramNoveltyOfDocs(docs(s, dir))

  /** Frame-grain core of t21 (the streaming/spec-testable form, like
    * [[shinglesOfDocs]]): expects (doc_id, lang, text). */
  private[graft] def ngramNoveltyOfDocs(d: DataFrame): DataFrame = {
    val sh = shinglesOfDocs(d)
    val first = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
    val per = sh.join(first, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
    d.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_grams") > 0, ppm(col("n_novel"), col("n_grams")))
          .as("novelty_ppm"))
  }

  /** t22: t21's INCREMENTAL form — the per-ingest-cycle shape (d10/m05's
    * delta convention: the newest 10% of ids are "the batch"). The corpus
    * first-seen table is the maintained artifact: a delta document's
    * shingles probe it by key join (O(batch + matches), never a re-paid
    * corpus-wide re-aggregation), a shingle absent from the base is novel
    * in the FIRST delta document that carries it (the delta-internal
    * min(doc_id) — exactly-once across a batch, the StreamingDedup
    * new-new posture), and the emitted rows are definitionally t21
    * restricted to the delta (QueriesSpec pins row-for-row equality).
    * After the cycle the batch's grams min-merge into the first-seen
    * table — the same append posture as d10's signature log. */
  def noveltyIncremental(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val cutoff = docs(s, dir).agg((max(col("doc_id")) * 9).as("c9"))
    val shc = sh.crossJoin(broadcast(cutoff))
    val baseFirst = shc.filter(col("doc_id") * 10 <= col("c9"))
      .groupBy("shingle").agg(min("doc_id").as("base_first"))
    val delta = shc.filter(col("doc_id") * 10 > col("c9"))
      .select("doc_id", "shingle")
    val deltaFirst = delta.groupBy("shingle").agg(min("doc_id").as("delta_first"))
    val per = delta.join(baseFirst, Seq("shingle"), "left")
      .join(deltaFirst, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("base_first").isNull &&
          col("delta_first") === col("doc_id"), 1)).as("n_novel"))
    docs(s, dir).select("doc_id").crossJoin(broadcast(cutoff))
      .filter(col("doc_id") * 10 > col("c9"))
      .select("doc_id")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_grams") > 0, ppm(col("n_novel"), col("n_grams")))
          .as("novelty_ppm"))
  }

  /** t23: per-source curation report — the view a crawl operator reads
    * to decide where the next token is worth fetching from: document and
    * token volume, language spread, and AGGREGATE novelty (Σ novel
    * shingles ÷ Σ shingles, in ppm — the token-weighted form, so one
    * giant saturated document cannot hide behind many tiny fresh ones
    * the way a mean-of-ratios would let it). A source whose novelty_ppm
    * decays toward 0 is re-crawling what the corpus already holds —
    * t21's per-document signal rolled up to the acquisition-decision
    * grain. Cost: t21's aggregates + one |sources|-row regroup; nothing
    * new touches the corpus. */
  def sourceStats(s: SparkSession, dir: String): DataFrame =
    sourceRollup(
      docs(s, dir).select(col("doc_id"), col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      ngramNoveltyOfDocs(docs(s, dir)))

  /** t23's rollup factored at frame grain so the maintained-novelty
    * service twin (streaming.CorpusService.sourceStatsReport) aggregates
    * its incrementally-scored log with the identical arithmetic.
    * `d` carries (doc_id, source, lang, n_tokens); `nov` carries t21's
    * per-doc (doc_id, n_grams, n_novel). */
  private[graft] def sourceRollup(d: DataFrame, nov: DataFrame): DataFrame =
    d.join(nov.select("doc_id", "n_grams", "n_novel"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        countDistinct("lang").as("n_langs"),
        sum("n_grams").as("n_grams"),
        sum("n_novel").as("n_novel"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("n_langs"), col("n_grams"), col("n_novel"),
        when(col("n_grams") > 0, ppm(col("n_novel"), col("n_grams")))
          .as("novelty_ppm"))

  /** t02: quality scoring — length/stopword/diversity signals as exact
    * integer ratios. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    toks(s, dir)
      .withColumn("n_tokens", size(col("t")))
      .withColumn("stop_cnt", expr("size(filter(t, x -> x IN ('a', 'the')))"))
      .join(docs(s, dir).select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).as("tok_chars")), "doc_id")
      .select(col("doc_id"),
        col("n_tokens"),
        ppm(col("stop_cnt").cast("long"), col("n_tokens").cast("long"))
          .as("stop_ratio_ppm"),
        ppm(size(array_distinct(col("t"))).cast("long"), col("n_tokens").cast("long"))
          .as("distinct_ratio_ppm"),
        idiv(col("tok_chars").cast("long") * 1000, col("n_tokens").cast("long"))
          .as("avg_token_len_ppk"),
        when(col("n_tokens") >= 20 &&
          ppm(col("stop_cnt").cast("long"), col("n_tokens").cast("long")) < 300000, 1)
          .otherwise(0).as("quality_ok"))

  /** t03: language-ID by n-gram (token) frequency profiles, self-profiled
    * from the labeled corpus; integer ppm weights so scoring is exact.
    * (The testdata langs share one vocabulary, so accuracy is near-chance —
    * the operator demonstrates the mechanism.) */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val tr = tokRows(s, dir)
    val prof = tr.groupBy(col("lang").as("plang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val ptot = prof.groupBy("plang").agg(sum("c").as("tot"))
    val profW = prof.join(ptot, "plang")
      .select(col("plang"), col("tok"), ppm(col("c"), col("tot")).as("w"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("plang").asc)
    tr.select(col("doc_id"), col("lang").as("true_lang"), col("tok"))
      .join(profW, "tok")
      .groupBy(col("doc_id"), col("true_lang"), col("plang"))
      .agg(sum(col("w")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("true_lang"),
        col("plang").as("predicted_lang"), col("score"))
  }

  /** t04: position-weighted document fingerprint — Σ (pos·h32(tok)) mod P. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    tokRows(s, dir).withColumn("h", h32(col("tok")))
      .groupBy("doc_id")
      .agg((sum((col("pos") * col("h")) % lit(P)) % lit(P)).as("fingerprint"),
        count(lit(1)).as("n_tokens"))

  /** t10: TF-IDF top-3 terms per document. The idf is the INTEGER ratio
    * `(n_docs_in_lang * 1e6) // df` rather than a log: libm `ln` is not
    * bit-identical across engines, and the ratio induces the same
    * monotone per-term ordering the selection needs. Grain discipline:
    * tf is (doc, term), df is (lang, term) — both map-side combinable;
    * the final top-k window partitions by doc_id (|docs| partitions,
    * never global). */
  def tfIdfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val tf = tokRows(s, dir)
      .groupBy(col("lang"), col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs(s, dir).groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok").asc)
    tf.join(dfc, Seq("lang", "tok"))
      .join(broadcast(nDocs), Seq("lang"))
      .withColumn("idf_ppm", ppm(col("n_docs"), col("df")))
      .withColumn("tfidf", col("tf") * col("idf_ppm"))
      .withColumn("term_rank", row_number().over(w).cast("int"))
      .filter(col("term_rank") <= 3)
      .select(col("doc_id"), col("term_rank"), col("tok"), col("tf"),
        col("idf_ppm"), col("tfidf"))
  }

  /** t11: temperature-balanced multilingual sampling (τ = 0.5) — the
    * data-mix operator of multilingual training pipelines: high-resource
    * languages are down-sampled so the kept mix follows p_l^τ instead of
    * the raw frequency. Per-language keep probability
    * `p_l = sqrt(n_min / n_l)` (ppm-quantized: sqrt is correctly rounded
    * per IEEE-754, so both engines compute the identical integer), and
    * the keep DECISION is content-hash thresholding — deterministic per
    * document, stable across runs/partitionings, like t06's split. The
    * language stats frame is |langs| rows, broadcast back onto the
    * corpus. */
  def temperatureSample(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("lang"), h32(col("text")).as("h"))
    val counts = d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min("n_docs").as("n_min"))
    val probs = counts.crossJoin(broadcast(minN))
      .withColumn("p_ppm",
        floor(sqrt(col("n_min") / col("n_docs")) * 1000000 + lit(0.5)).cast("long"))
      .select("lang", "n_docs", "p_ppm")
    d.join(broadcast(probs), "lang")
      .groupBy(col("lang"), col("n_docs"), col("p_ppm"))
      .agg(count(when(col("h") % 1000000 < col("p_ppm"), 1)).as("n_kept"))
  }

  /** t18: token-budget mixture balancing — the data-mixing step between
    * curation and training: given a per-language token TARGET (uniform
    * here: total tokens // |langs| — in production the mixture weights
    * are a config), compute each language's keep rate
    * min(1, target/actual) in ppm and the mix that results. Languages
    * under budget keep everything; over-budget languages are
    * down-sampled by content-hash thresholding (t06/t11's deterministic
    * decision — stable across runs, engines, partitionings; no RNG).
    * Complements t11: temperature sampling reshapes by DOC counts with
    * a power law, this hits an absolute TOKEN budget.
    *
    * Scale shape: one narrow scan to (lang, h, n_toks), a |langs|-row
    * agg broadcast back, one final agg — no shuffle at data grain
    * beyond the two-phase aggs. The ppm product caps the corpus at
    * ~2^63/1e6 ≈ 9e12 tokens; beyond that widen to DECIMAL(38,0). */
  def tokenBudgetMix(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("lang"), h32(col("text")).as("h"),
      size(split(col("text"), " ")).cast("long").as("n_toks"))
    val counts = d.groupBy("lang").agg(sum(col("n_toks")).as("lang_toks"))
    val budget = counts
      .agg(idiv(sum(col("lang_toks")), count(lit(1))).as("budget_toks"))
    val rates = counts.crossJoin(broadcast(budget))
      .withColumn("rate_ppm", least(lit(1000000L),
        idiv(col("budget_toks") * lit(1000000L), col("lang_toks"))))
    d.join(broadcast(rates), "lang")
      .groupBy(col("lang"), col("lang_toks"), col("budget_toks"),
        col("rate_ppm"))
      .agg(count(when(col("h") % 1000000 < col("rate_ppm"), 1))
        .as("n_docs_kept"),
        coalesce(sum(when(col("h") % 1000000 < col("rate_ppm"),
          col("n_toks"))), lit(0L)).as("n_toks_kept"))
  }

  /** t12: fixed-size stratified sample — k=10 documents per language,
    * selected by content-hash order (deterministic "reservoir": the
    * sample is a pure function of the corpus, stable across runs,
    * engines and partitionings). Uses the typed MinKByKey Aggregator, so
    * each map task forwards at most k rows per language and the shuffle
    * carries O(|langs|·k) — the `row_number() <= k` window form (the
    * oracle) would funnel the whole table through ≤|langs| reducers. */
  def stratifiedReservoir(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("lang"), h32(col("text")).as("h"), col("doc_id"))
    val mink = udaf(new graft.functions.MinKByKey(10),
      org.apache.spark.sql.Encoders.product[graft.functions.KeyedId])
    d.groupBy("lang")
      .agg(mink(col("h"), col("doc_id")).as("sample"))
      .select(col("lang"), posexplode(col("sample.ids")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("sample_rank"),
        col("col.id").as("doc_id"), col("col.k").as("h"))
  }

  /** m03: chunked payload checksums — the blob-slicing plumbing of
    * multimodal processing: each document's payload split into fixed
    * 1000-unit chunks (a narrow generate-side explode — the payload is
    * NOT replicated per chunk), each chunk checksummed. Chunks are
    * character-addressed here because the oracle's md5 is VARCHAR-only
    * (the corpus is pure ASCII, so characters ≡ bytes; for real binary
    * the same shape runs substr-on-binary + a binary hash kernel). */
  def chunkChecksums(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      // Empty-text contract: zero chunks (idiv truncates toward zero, so
      // len=0 would otherwise yield sequence(0,0) = one empty-chunk row
      // where the oracle's floor-division range yields none).
      .filter(col("len") > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          idiv(col("len") - 1, lit(1000L)))).as("chunk_idx"))
      .withColumn("chunk",
        expr("substring(text, CAST(chunk_idx * 1000 + 1 AS INT), 1000)"))
      .select(col("doc_id"), col("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        h32(col("chunk")).as("checksum32"))

  /** t17: line-level boilerplate removal (the CCNet/RefinedWeb scrub) —
    * the WITHIN-corpus twin of line dedup: segments recurring across
    * documents (headers, footers, navigation chrome, license blurbs)
    * are dropped from every document, keeping the documents themselves.
    * This is a different decision grain from the whole-doc families:
    * d01–d08 drop DOCUMENTS; t17 drops SEGMENTS and reports what each
    * document retains. Segmentation is deterministic 10-token windows
    * (this corpus carries no newlines; on real text the split is '\n' —
    * the pipeline shape is identical), a segment is boilerplate when it
    * occurs verbatim in ≥ 2 distinct documents, and the same segment
    * repeated WITHIN one document is untouched (that is t14's
    * repetition signal, not boilerplate).
    *
    * Scale shape: explode to segment rows (narrow), ONE hash
    * aggregation by segment for document frequency (map-side
    * combinable, d01's cost class), join back at segment grain, one
    * agg by doc — nothing pairwise, no window over the corpus. */
  def boilerplateScrub(s: SparkSession, dir: String): DataFrame = {
    val segs = toks(s, dir).select(col("doc_id"), explode(expr(
      """transform(sequence(0, cast(ceil(size(t) / 10.0) as int) - 1),
        |          i -> concat_ws(' ', slice(t, i * 10 + 1, 10)))"""
        .stripMargin)).as("seg"))
    val df = segs.groupBy("seg")
      .agg(countDistinct(col("doc_id")).as("df"))
    segs.join(df, "seg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("df") < 2, size(split(col("seg"), " ")).cast("long"))
          .otherwise(0L)).as("n_toks_kept"))
  }

  /** t19: t17's scrub as a corpus TRANSFORM — the materialization a
    * training run actually consumes. Where t17 REPORTS what each
    * document would retain, t19 emits the retained text itself:
    * boilerplate segments (verbatim in ≥ 2 distinct documents, t17's
    * exact predicate and segmentation) are removed and the surviving
    * segments are reassembled in original order into `clean_text`.
    * Fully-boilerplate documents survive with empty text (the keep/drop
    * decision on DOCUMENTS belongs to the dedup families, not the
    * scrub), pinned by the left join back to the corpus spine.
    *
    * Scale shape: t17's cost class exactly — narrow segment explode,
    * one map-side-combinable hash agg for document frequency, join back
    * at segment grain, one agg by doc. The reassembly is a per-doc
    * collect_list + array_sort at SEGMENT grain (≤ |doc|/10 rows, each
    * carrying its pos) — bounded by document size, never a window over
    * the corpus. */
  /** The scrub's positional segment frame — (doc_id, pos, seg), t17's
    * exact 10-token segmentation with the ordinal the reassembly needs.
    * Shared with the incremental maintenance path
    * (streaming.IncrementalScrub) so one-shot and maintained scrubs
    * agree bit-for-bit. `d` is (doc_id, text[, ...]). */
  private[graft] def scrubSegments(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, cast(ceil(size(t) / 10.0) as int) - 1),
          |          i -> concat_ws(' ', slice(t, i * 10 + 1, 10)))"""
          .stripMargin)))
      .select(col("doc_id"), col("pos"), col("col").as("seg"))

  /** The scrub's reassembly: surviving (df < 2) segments back into one
    * `clean_text` per document, in original order, empty for docs whose
    * every segment was boilerplate. `segsWithDf` is (doc_id, pos, seg,
    * df); `spine` is the (doc_id) universe to emit. Row-local
    * array_sort inside the hash agg — no corpus-grain window. */
  private[graft] def reassembleClean(segsWithDf: DataFrame,
                                     spine: DataFrame): DataFrame = {
    val kept = segsWithDf.filter(col("df") < 2)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("seg")))),
        x => x.getField("seg")), " ").as("clean_text"))
    spine.select(col("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def scrubbedCorpus(s: SparkSession, dir: String): DataFrame = {
    val segs = scrubSegments(docs(s, dir).select("doc_id", "text"))
    val df = segs.groupBy("seg")
      .agg(countDistinct(col("doc_id")).as("df"))
    reassembleClean(segs.join(df, "seg"), docs(s, dir))
  }

  /** t20: statistical LM quality score — the CCNet/KenLM family's
    * filter, completing the quality suite with its STATISTICAL member
    * (t02 is surface heuristics, t14 repetition, s10 embedding
    * geometry; this one scores each document under a language model
    * trained on the corpus itself): a per-language bigram model, each
    * document's score the mean conditional bigram probability over its
    * token stream. A document of common, well-ordered token
    * transitions scores high; garbled or off-language text pairs rare
    * transitions and sinks — the same signal a KenLM perplexity filter
    * thresholds, up to monotone transform.
    *
    * EXACT INTEGER arithmetic where real perplexity is log-float:
    * p(b|a) in ppm by integer division of corpus counts, the doc score
    * an integer mean of those — cross-engine float log/exp disagreement
    * (the round2p scaladoc's hazard class) cannot arise, and the score
    * is a monotone image of mean likelihood, which is what a threshold
    * consumes. Denominator is the unigram count (including stream-final
    * tokens), documented as the proxy's normalization.
    *
    * Scale shape: successor pairing is ONE per-doc window (lead over
    * pos — doc-partitioned, never corpus-global); the bigram model is
    * one hash agg; scoring joins doc bigram rows to the model at
    * (lang, bigram) grain — t03's "token join" standard shape, where a
    * Zipfian vocabulary's model table broadcasts and a huge one
    * shuffles at collision grain. */
  def bigramLmScore(s: SparkSession, dir: String): DataFrame = {
    val tr = tokRows(s, dir)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val big = tr
      .withColumn("tb", lead(col("tok"), 1).over(w))
      .filter(col("tb").isNotNull)
      .select(col("doc_id"), col("lang"), col("tok").as("ta"), col("tb"))
    val cab = big.groupBy("lang", "ta", "tb").agg(count(lit(1)).as("c"))
    val ca = tr.select(col("lang"), col("tok").as("ta"))
      .groupBy("lang", "ta").agg(count(lit(1)).as("c1"))
    val model = cab.join(ca, Seq("lang", "ta"))
      .select(col("lang"), col("ta"), col("tb"),
        idiv(col("c") * lit(1000000L), col("c1")).as("p_ppm"))
    big.join(model, Seq("lang", "ta", "tb"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        idiv(sum(col("p_ppm")), count(lit(1))).as("lm_score_ppm"))
  }

  /** t38: DSIR-style importance resampling — the published data-SELECTION
    * shape (hashed n-gram importance weights, Xie et al. 2023): score
    * every document by how much its token-bigram distribution looks like
    * a TARGET corpus rather than the raw crawl, then keep the top
    * fraction. The quality gate (t02) names the in-corpus target here —
    * deployments point `targetDocs` at an external trusted corpus
    * (Wikipedia, curated books), which is exactly the frame parameter
    * [[dsirOf]] exposes.
    *
    * Features are HASHED bigrams (1024 buckets via the portable h32 —
    * DSIR's hashed-n-gram device, bounding the feature space regardless
    * of vocabulary size). Where DSIR scores Σ log(p_target/p_raw), the
    * cross-engine-exact surrogate is the mean per-occurrence probability
    * DIFFERENCE in ppm — the same over-represented-in-target contrast
    * with the same sign structure, in exact integer arithmetic (the t20
    * precedent: a monotone-equivalent integer image of the float score a
    * threshold would consume). The sum is shifted by +1e6 per gram
    * before idiv so the division is always non-negative (idiv/`//`
    * disagree on negatives across engines).
    *
    * Selection is EXACT top-`keepPct`% with deterministic tie-break,
    * computed scale-safely: a histogram at SCORE-DOMAIN grain (ppm
    * scores are bounded in [-1e6, 1e6], so the cumulative window runs
    * over ≤ 2e6+1 rows — corpus-size-INDEPENDENT, unlike a global
    * rank-over-docs window), a one-row boundary probe, and a ranking
    * window over only the boundary TIE CLASS (docs sharing the cutoff
    * score), ordered by doc_id. DSIR's Gumbel-noise sampling is the
    * randomized variant of the same weight-ordered keep; the
    * deterministic form is what re-runs and audits need.
    *
    * Scale shape: bigrams from the doc-partitioned lead window (t20);
    * two 1024-bucket hash aggs (map-side combinable) for raw/target
    * counts; the 1024-row probability table broadcasts back; scoring is
    * one per-doc hash agg. Nothing corpus-grain is globally sorted. */
  def dsirSelect(s: SparkSession, dir: String): DataFrame =
    dsirOf(docs(s, dir), qualityOkDocs(docs(s, dir)), DsirKeepPct)

  /** Keep fraction for t38, in percent. */
  private[graft] val DsirKeepPct = 25L

  /** The t02 quality predicate at frame grain — the doc-id set t38's
    * in-corpus target names and the service's weight trainer gates
    * through tombstones (dir-based qualityScore can't drop a tombstone
    * set it doesn't know about). Same predicate as qualityScore's
    * `quality_ok`. */
  private[graft] def qualityOkDocs(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 20 &&
        ppm(expr("size(filter(t, x -> x IN ('a', 'the')))").cast("long"),
          size(col("t")).cast("long")) < 300000)
      .select("doc_id")

  /** One row per bigram OCCURRENCE, hashed into t38's 1024 feature
    * buckets. A pure narrow map (the shinglesOfDocs shape: row-local
    * array transform + explode) — the score only consumes the bigram
    * MULTISET, so no doc-partitioned ordering window is ever needed,
    * and every recompute of this frame is shuffle-free. */
  private[graft] def dsirGramsOf(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(t) < 2 THEN CAST(array() AS array<string>)
          |ELSE transform(sequence(0, size(t) - 2),
          |               i -> concat_ws(' ', t[i], t[i+1])) END"""
          .stripMargin)).as("big"))
      .select(col("doc_id"), pmod(h32(col("big")), lit(1024L)).as("bkt"))

  /** The frozen per-bucket weight table: raw-corpus and target ppm
    * frequencies per hashed-bigram bucket — ≤1024 rows regardless of
    * corpus size (broadcast class; the artifact the corpus service
    * freezes per epoch). Buckets the target never emits carry pt=0. */
  private[graft] def dsirWeightsFrom(documents: DataFrame,
                                     targetDocs: DataFrame): DataFrame =
    dsirWeightsFromGrams(dsirGramsOf(documents), targetDocs)

  private def dsirWeightsFromGrams(grams: DataFrame,
                                   targetDocs: DataFrame): DataFrame = {
    val raw = grams.groupBy("bkt").agg(count(lit(1)).as("cr"))
    val tgt = grams.join(targetDocs, Seq("doc_id"), "left_semi")
      .groupBy("bkt").agg(count(lit(1)).as("ct"))
    raw.join(tgt, Seq("bkt"), "left")
      .crossJoin(broadcast(raw.agg(sum("cr").as("rt"))))
      .crossJoin(broadcast(tgt.agg(sum("ct").as("tt"))))
      .select(col("bkt"), ppm(col("cr"), col("rt")).as("pr"),
        coalesce(ppm(col("ct"), col("tt")), lit(0L)).as("pt"))
  }

  /** Per-doc importance scores under a FROZEN weight table (the serving
    * path: one narrow gram map + a ≤1024-row broadcast join + one
    * per-doc hash agg). Buckets absent from the table — possible only
    * for documents ingested after the freeze — contribute 0, the
    * neutral element of the contrast. */
  private[graft] def dsirScoresUnder(documents: DataFrame,
                                     weights: DataFrame): DataFrame =
    dsirScoresUnderGrams(dsirGramsOf(documents), weights)

  private def dsirScoresUnderGrams(grams: DataFrame,
                                   weights: DataFrame): DataFrame =
    grams.join(broadcast(weights), Seq("bkt"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (idiv(sum(coalesce(col("pt"), lit(0L)) - coalesce(col("pr"), lit(0L)))
          + count(lit(1)) * lit(1000000L),
          count(lit(1))) - lit(1000000L)).as("dsir_score_ppm"))

  /** Frame-grain core of t38: `documents` carries (doc_id, text…);
    * `targetDocs` names the target-distribution doc ids (a subset of
    * `documents` here; an external corpus in deployment). Emits one row
    * per document having ≥1 bigram: (doc_id, n_bigrams, dsir_score_ppm,
    * keep). */
  private[graft] def dsirOf(documents: DataFrame, targetDocs: DataFrame,
                            keepPct: Long): DataFrame = {
    // The gram frame feeds THREE aggregations (raw counts, target
    // counts, scoring); materialize it once — (doc_id, bkt) rows, ~16
    // bytes each — instead of re-tokenizing the corpus per consumer
    // (the d06 eager-checkpoint pattern; serving reuses nothing and
    // skips this).
    val grams = dsirGramsOf(documents).localCheckpoint()
    dsirKeepTop(
      dsirScoresUnderGrams(grams, dsirWeightsFromGrams(grams, targetDocs)),
      keepPct)
  }

  /** Exact top-`keepPct`% of a scored frame with deterministic
    * tie-break: cumulative doc counts down the (bounded) distinct-score
    * axis, one boundary row, ranking only within the cutoff-score tie
    * class. Emits the scored rows plus `keep`. */
  private[graft] def dsirKeepTop(scored: DataFrame,
                                 keepPct: Long): DataFrame = {
    val hist = scored.groupBy("dsir_score_ppm").agg(count(lit(1)).as("cnt"))
    val cw = Window.orderBy(col("dsir_score_ppm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = hist
      .withColumn("cum", sum(col("cnt")).over(cw))
      .crossJoin(broadcast(
        hist.agg(idiv(sum(col("cnt")) * lit(keepPct), lit(100L)).as("n_keep"))))
      .filter(col("cum") >= col("n_keep"))
      .orderBy(col("dsir_score_ppm").desc).limit(1)
      .select(col("dsir_score_ppm").as("s_star"),
        (col("n_keep") - (col("cum") - col("cnt"))).as("take_at"))
    val tieKept = scored
      .join(broadcast(boundary), col("dsir_score_ppm") === col("s_star"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dsir_score_ppm")).orderBy(col("doc_id"))))
      .filter(col("rn") <= col("take_at"))
      .select(col("doc_id"), lit(1).as("kb"))
    scored.crossJoin(broadcast(boundary))
      .join(tieKept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"), col("dsir_score_ppm"),
        when(col("dsir_score_ppm") > col("s_star") || col("kb").isNotNull, 1)
          .otherwise(0).as("keep"))
  }

  /** t39's histogram geometry: TWO-TIER equi-width bins so the sketch
    * stays FIXED-SIZE (≤1024 rows per language) while covering
    * long-document corpora. Tier 1: bins 0..511 of `HistBinW` = 16
    * tokens each, covering [0, 8192) — the body of any web/document
    * corpus, at dashboard-grade resolution. Tier 2: bins 512..1023 of
    * `HistBinW2` = 2048 tokens each, covering [8192, 1 056 768) — the
    * book/transcript tail (a round-12 single-tier cap saturated at
    * 16.4k tokens, silently flooring p99 on long-document corpora).
    * Lengths ≥ ~1.06M tokens saturate into bin 1023 (the one remaining
    * — and documented — regime bound; a corpus whose p99 exceeds a
    * million tokens needs a third tier, not a bigger cap). Accuracy:
    * quantile estimates land within ONE BIN WIDTH of the exact order
    * statistic — 16 tokens in tier 1, 2048 in tier 2 (HistSpec pins
    * both tiers). */
  private[graft] val HistBinW = 16L
  private[graft] val HistTier1Bins = 512L
  private[graft] val HistTier1Cap = HistTier1Bins * HistBinW // 8192
  private[graft] val HistBinW2 = 2048L
  private[graft] val HistMaxBin = 1023L

  /** One (lang, bin, cnt) histogram row set — the mergeable LINEAR
    * sketch itself: per-bucket counts are sums of per-doc
    * contributions, so partial histograms of disjoint batches SUM to
    * the corpus histogram row-for-row (the CMS property, powering the
    * service's per-drain maintenance and purge-by-subtraction). */
  private[graft] def histSketchOf(documents: DataFrame): DataFrame = {
    val n = size(split(col("text"), " ")).cast("long")
    documents.select(col("lang"),
      when(n < lit(HistTier1Cap), idiv(n, lit(HistBinW)))
        .otherwise(least(
          lit(HistTier1Bins) + idiv(n - lit(HistTier1Cap), lit(HistBinW2)),
          lit(HistMaxBin))).as("bin"))
      .groupBy("lang", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Integer quantile estimates off a (lang, bin, cnt) histogram:
    * rank r(q) = ⌈n·q/100⌉ located by a per-lang cumulative sum over
    * the ≤1024-row bin axis, estimate = bin floor + truncated linear
    * interpolation within the bin (tier-dependent floor and width —
    * the inverse of [[histSketchOf]]'s geometry) — all exact integer
    * arithmetic, so the DuckDB twin is hash-identical. The window is
    * partitioned by lang and bounded by the FIXED bin count — never
    * corpus-grain. */
  private[graft] def quantilesOfHist(hist: DataFrame): DataFrame = {
    val tot = hist.groupBy("lang").agg(sum("cnt").as("nd"))
    val cw = Window.partitionBy(col("lang")).orderBy(col("bin"))
    val lowEdge = when(col("bin") < lit(HistTier1Bins),
        col("bin") * lit(HistBinW))
      .otherwise(lit(HistTier1Cap) +
        (col("bin") - lit(HistTier1Bins)) * lit(HistBinW2))
    val width = when(col("bin") < lit(HistTier1Bins), lit(HistBinW))
      .otherwise(lit(HistBinW2))
    hist.withColumn("cum", sum(col("cnt")).over(cw))
      .join(broadcast(tot), "lang")
      .withColumn("q", explode(array(lit(50L), lit(90L), lit(99L))))
      .withColumn("r", idiv(col("nd") * col("q") + lit(99L), lit(100L)))
      .filter(col("cum") - col("cnt") < col("r") && col("r") <= col("cum"))
      .withColumn("est", lowEdge +
        idiv((col("r") - (col("cum") - col("cnt"))) * width, col("cnt")))
      .groupBy("lang")
      .agg(max(col("nd")).as("n_docs"),
        max(when(col("q") === 50, col("est"))).as("p50_est"),
        max(when(col("q") === 90, col("est"))).as("p90_est"),
        max(when(col("q") === 99, col("est"))).as("p99_est"))
  }

  /** t39: per-language document-length quantiles off a MERGEABLE
    * equi-width histogram sketch — the third sketch family (q17's HLL
    * counts distincts, t37's CMS counts frequencies; this one answers
    * ORDER STATISTICS): p50/p90/p99 token-count estimates within one
    * bin width of the exact order statistic — 16 tokens below 8192,
    * 2048 tokens up to ~1.06M (the two-tier geometry; saturating
    * above, see [[HistBinW]]) — from a fixed-size (≤1024 rows/lang)
    * histogram that never re-reads the corpus once built. The curation read: "how long are my documents
    * per language, and is the tail drifting" — the dashboard quantile
    * a t-digest serves in float engines, here exact-integer so it
    * hash-matches DuckDB.
    *
    * Scale shape: ONE map-side-combinable hash agg over the corpus
    * builds the sketch; everything after runs at sketch grain (≤1024
    * rows/lang cumulative window, |langs|-row broadcast). The sketch
    * is LINEAR — disjoint batches' partials sum to the corpus sketch —
    * which is what the service's per-drain maintenance
    * (CorpusService.refreshLengthHistogram) and deletion-by-
    * subtraction ride. */
  def lengthQuantiles(s: SparkSession, dir: String): DataFrame =
    quantilesOfHist(histSketchOf(docs(s, dir)))

  /** d08: fuzzy dedup by edit distance — the modality the hash families
    * (d01–d06) can't see: small character-level edits (typos, OCR noise)
    * that change every shingle. Candidate pairs are BLOCKED by
    * (lang, length-bucket) so the quadratic comparison runs within
    * bounded blocks, never all-pairs, and the Levenshtein runs on a
    * fixed 20-char prefix THROUGH THE THRESHOLDED VARIANT — Spark's
    * 3-arg levenshtein abandons a pair as soon as the running distance
    * exceeds the bound (returns -1), so far-apart pairs (the vast
    * majority) cost O(threshold·len), not O(len²). Distances ≤ the
    * threshold equal the unbounded distance, so the oracle's plain
    * levenshtein + WHERE produces identical rows.
    *
    * Blocking recall contract: each doc is emitted into its own AND its
    * successor length bucket, so any two docs whose buckets differ by at
    * most 1 (|len diff| < 100 guaranteed compared; < 50 always) share a
    * block — a near-pair straddling a bucket boundary (lengths 49/51) is
    * still compared, where naive equal-bucket blocking silently skips it.
    * Pairs whose lengths differ by ≥2 buckets are never compared: that is
    * the stated trade (their edit distance is ≥ the length gap anyway,
    * far above any plausible near-dup threshold for same-prefix docs).
    *
    * The expansion is SINGLE-SIDED: only the probe side explodes into
    * {own, successor} buckets and joins against the unexploded build
    * side on `a.blk = b.lenb` — half the join volume of exploding both
    * sides (which compares doubled blocks against doubled blocks). Each
    * unordered pair matches exactly once: a cross-bucket pair only with
    * the lower-bucket doc as the probe (its successor block = the
    * other's own bucket), an equal-bucket pair gated by id order — both
    * row-local predicates, no dedup shuffle over the candidate set.
    *
    * COST DECOMPOSITION (sf0.1, local[32], 900k candidate pairs,
    * medians of 3): the blocked join alone (literal payload) runs in
    * 0.50 s; with the thresholded levenshtein it is 3.28 s (3.68 s
    * unthresholded — the 20-char prefix keeps both constants small).
    * 85% of d08's time is therefore the verification payload itself at
    * ~3 µs/pair — irreducible without changing the output: every
    * candidate must be exactly verified, the join machinery is already
    * the minor term, and any candidate cap (top-N by length proximity)
    * would drop true ≤10-edit pairs from the report. The cost dial that
    * PRESERVES semantics is the block width (50 chars), which trades
    * Σ|block|² volume against the |len diff| ≥ 100 recall bound. */
  def dedupEditDistance(s: SparkSession, dir: String): DataFrame =
    editDistancePairs(docs(s, dir))

  /** Frame-parameterized core of d08 over (doc_id, lang, text) rows —
    * unit-testable on synthetic corpora (boundary-straddling pairs). */
  def editDistancePairs(documents: DataFrame): DataFrame = {
    val d = documents.select(col("doc_id"), col("lang"),
      substring(col("text"), 1, 20).as("prefix"),
      idiv(length(col("text")).cast("long"), lit(50L)).as("lenb"))
    val blocked = d.withColumn("blk",
      explode(array(col("lenb"), col("lenb") + 1)))
    blocked.as("a").join(d.as("b"),
        col("a.lang") === col("b.lang") && col("a.blk") === col("b.lenb") &&
          (col("a.lenb") < col("b.lenb") || col("a.doc_id") < col("b.doc_id")))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        levenshtein(col("a.prefix"), col("b.prefix"), 10).cast("int")
          .as("edit_dist"))
      .filter(col("edit_dist") >= 0)
  }

  /** d07: canonical-corpus resolution — the dedup family's terminal
    * filter: every document mapped to its cluster's canonical id (the
    * component minimum from d06; itself when not near-duplicated) and a
    * keep/drop decision. This is the row-level operator a pipeline
    * actually applies before training; d01–d06 are its machinery. */
  def canonicalCorpus(s: SparkSession, dir: String): DataFrame =
    canonicalResolution(docs(s, dir).select(col("doc_id"), col("lang")),
      clusterLabels(s, dir))

  /** The LSH cluster-label table, memoized per (context, dir) — the
    * storage-for-recompute swap the Bloom sketch (d09/t16) and the ANN
    * index (s08/s09) already make, applied to the pair-graph fixpoint:
    * d06 IS the build and stays a fresh computation every invocation
    * (its cost is what the benchmark measures for the build path), but
    * its CONSUMERS — d07's resolution and through it t13/t16's corpus
    * materializations — read the labels computed once per corpus
    * instead of re-running a ~3 s checkpointed BSP per query. At
    * 100 TB the label table is a stored artifact maintained
    * incrementally (the corpus service's p.clusters does exactly
    * that); this memo is the batch-dir stand-in with the same
    * staleness contract as every per-dir memo: a corpus that grew
    * needs invalidateClusters first. Keyed by applicationId because
    * the localCheckpoint dies with its SparkContext. */
  private val clusterCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def invalidateClusters(dir: String): Unit = {
    val it = clusterCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.endsWith("@@" + dir)) { freeCkpt(e.getValue); it.remove() }
    }
  }

  private def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    // Expensive-value memo idiom: compute OUTSIDE the map (the CC
    // fixpoint is a multi-second Spark job; computeIfAbsent would hold
    // the bucket lock for its whole duration, serializing unrelated
    // dirs that hash together and deadlocking re-entrant access), then
    // insert with putIfAbsent and free the loser's checkpoint.
    val key = s.sparkContext.applicationId + "@@" + dir
    val cached = clusterCache.get(key)
    if (cached != null) cached
    else {
      val fresh = dedupClusters(s, dir).localCheckpoint()
      val winner = clusterCache.putIfAbsent(key, fresh)
      if (winner != null) { freeCkpt(fresh); winner } else fresh
    }
  }

  /** d07's keep/drop rule at FRAME grain: docs ⟕ cluster labels, keep a
    * doc iff it is its component's minimum (docs in no pair are their
    * own canonical). Shared with the streamed canonical-corpus artifact
    * (CorpusService.refreshCanonicalCorpus) so both resolutions are the
    * same code path by construction. */
  private[graft] def canonicalResolution(docsIdLang: DataFrame,
                                         labels: DataFrame): DataFrame =
    docsIdLang
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("cluster_id"), col("doc_id")).as("canonical_id"))
      .withColumn("is_kept",
        when(col("doc_id") === col("canonical_id"), 1).otherwise(0))

  /** d13: SEMANTIC canonical-corpus resolution — SemDeDup's actual
    * keep/drop decision, which s05 alone stops short of: s05 emits the
    * ≥-threshold cosine PAIRS, d13 clusters them (connected components,
    * d06's machinery) and resolves every document to its semantic
    * cluster's canonical (d07's rule — the component minimum; documents
    * in no pair keep themselves). This is the row-level filter a
    * SemDeDup pipeline applies before training, the semantic twin of
    * d07's verbatim resolution — same clusterPairs / canonicalResolution
    * code paths, only the pair graph differs. Embedding i embeds
    * document i in this corpus, so vec ids ARE doc ids; deployments
    * with distinct id spaces map them first (cf.
    * CorpusService.dedupReport's semIdMap).
    *
    * Scale posture is inherited: the pair graph is cell-collision
    * grain (≪ corpus), the CC loop label grain, the resolution one
    * key-grain left join — and the pair source is s09 (the stored-index
    * form of s05, row-for-row identical by SemDedupIndexSpec), so the
    * corpus-wide assignment is READ, not recomputed: the index build is
    * amortized across every consumer of the cell structure (s05's
    * pairs, this resolution, s08's ANN serving). */
  def semanticCanonical(s: SparkSession, dir: String): DataFrame =
    canonicalResolution(
      docs(s, dir).select(col("doc_id"), col("lang")),
      clusterPairs(semdedupIndexed(s, dir)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))))

  /** t13: the CAPSTONE composition — materialize the training corpus the
    * way a pipeline actually would: keep a document iff it is its
    * near-dup cluster's canonical (d07) AND it passes quality gating
    * (t02), then report the retained mix per (lang, split) with token
    * budgets (t06's content-hash split). Each stage is a key-grain
    * semi-join onto the doc set — the operators compose without any new
    * shuffle shape, which is the point: d01–d08/t01–t12 are not demos,
    * they assemble. */
  def corpusMaterialize(s: SparkSession, dir: String): DataFrame =
    materializeSummary(trainingManifest(s, dir,
      canonicalCorpus(s, dir).filter(col("is_kept") === 1).select("doc_id")))

  /** The doc-grain training-set manifest t13/t16 summarize and the
    * corpus service materializes as its maintained artifact
    * (CorpusService.refreshTrainingSet): every document that survives
    * the canonical keep/drop (`keptDocs` — whichever resolution the
    * caller maintains) AND the quality gate, with its deterministic
    * split and token budget. Both gates are key-grain semi-joins; the
    * only corpus-wide touches are the two narrow scans they ride. */
  private[graft] def trainingManifest(s: SparkSession, dir: String,
                                      keptDocs: DataFrame): DataFrame =
    docSplitToks(s, dir)
      .join(keptDocs, Seq("doc_id"), "left_semi")
      .join(qualityScore(s, dir)
        .filter(col("quality_ok") === 1).select("doc_id"),
        Seq("doc_id"), "left_semi")

  /** (doc_id, lang, split, n_toks) — the manifest's corpus-wide frame:
    * t06's content-hash split plus the whitespace token budget. */
  private[graft] def docSplitToks(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        when(splitBucket < 80, "train").when(splitBucket < 90, "valid")
          .otherwise("test").as("split"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))

  /** The (lang, split) doc/token mix of a manifest — t13/t16's report
    * grain over any doc-grain manifest. */
  private[graft] def materializeSummary(manifest: DataFrame): DataFrame =
    manifest.groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))

  /** Tokens per training sequence for the pack manifest (t28/t30). Small
    * relative to a production context window because the synthetic docs
    * are 30–400 tokens; the arithmetic is length-agnostic. */
  private[graft] val PackCap = 128L

  /** t28: sequence-packing manifest — the trainer-facing operator GPT-class
    * pretraining actually runs: concatenate documents in deterministic
    * doc_id order and split the token stream at every `cap` tokens, so
    * every training sequence is exactly full (no padding waste) and a
    * document crossing a boundary is split, not dropped. The output is a
    * MANIFEST — one row per (document, pack) span with offsets on both
    * sides — because at 100 TB the packer must not rewrite token payloads:
    * the trainer's loader slices the original docs by (doc_start,
    * span_toks) and lays them at pack_start, and the attention-mask /
    * document-boundary structure is exactly these rows.
    *
    * Scale shape — a DISTRIBUTED PREFIX SUM, not a global window: a naive
    * `SUM(n_toks) OVER (ORDER BY doc_id)` funnels the whole corpus through
    * ONE window partition (the classic packing scale cliff). Instead the
    * running offset is computed hierarchically: per-block token subtotals
    * (one shuffle at block grain, |corpus|/blockDocs rows), an offset
    * cumsum over that tiny block frame, then a window PARTITIONED by block
    * (≤ blockDocs rows per partition) plus the broadcast block offset.
    * Block size is invisible in the result (prefix-sum associativity —
    * PackSpec pins block=1 ≡ 4096 ≡ one-block); at 10^11 docs the block
    * frame is ~10^7 rows and the same decomposition applies once more.
    * The span explode is per-doc arithmetic: a doc starting at `strt`
    * covers packs ⌊strt/cap⌋..⌊(strt+n−1)/cap⌋. */
  def packManifest(s: SparkSession, dir: String): DataFrame =
    packSpans(docs(s, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_toks")), PackCap)

  /** t28's core at frame grain — pack any (doc_id, n_toks) frame; t30
    * hands in the gated training manifest, the corpus service its
    * maintained one. `blockDocs` is the prefix-sum block width (result-
    * invariant; parameterized so PackSpec can prove that). */
  private[graft] def packSpans(d: DataFrame, cap: Long,
                               blockDocs: Long = 4096L): DataFrame = {
    val blocks = d.select(col("doc_id"), col("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("blk", expr(s"doc_id div $blockDocs"))
    val wB = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkOff = blocks.groupBy("blk").agg(sum("n_toks").as("blk_toks"))
      .withColumn("blk_off", coalesce(sum("blk_toks").over(wB), lit(0L)))
      .select("blk", "blk_off")
    val wIn = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .join(broadcast(blkOff), "blk")
      .withColumn("strt",
        col("blk_off") + coalesce(sum("n_toks").over(wIn), lit(0L)))
      .withColumn("pack_id", explode(sequence(
        expr(s"strt div $cap"), expr(s"(strt + n_toks - 1) div $cap"))))
      .select(col("doc_id"), col("pack_id"),
        greatest(col("pack_id") * cap - col("strt"), lit(0L)).as("doc_start"),
        greatest(col("strt") - col("pack_id") * cap, lit(0L)).as("pack_start"),
        (least((col("pack_id") + 1L) * cap, col("strt") + col("n_toks")) -
          greatest(col("pack_id") * cap, col("strt"))).as("span_toks"))
  }

  /** t31: PACK-GRAIN SHARD ASSIGNMENT with epoch-seeded visit order —
    * the trainer handoff t28's manifest feeds. Each training sequence
    * (pack) is dealt to one of 8 data-parallel shards by a stable id
    * hash (a pack never migrates between hosts mid-run; t15 balances
    * DOC shards by size, but packs are all exactly `cap` tokens, so
    * plain hashing is already token-balanced), and every epoch gets a
    * fresh deterministic shuffle of each shard's packs via a seeded
    * hash ORDER KEY. Emitting the key instead of a materialized
    * row_number rank is deliberate scale design: ranking within
    * (epoch, shard) would funnel |packs|/shards rows through single
    * window partitions — the cliff t28's prefix sum exists to avoid —
    * while the key is pure projection; the storage layer writes
    * sortWithinPartitions(ord_key) and the loader streams in order. */
  def packShards(s: SparkSession, dir: String): DataFrame =
    packManifest(s, dir).select("pack_id").distinct()
      .withColumn("epoch", explode(array(lit(0L), lit(1L))))
      .select(col("pack_id"), col("epoch"),
        (h32(col("pack_id").cast("string")) % 8).as("shard"),
        h32(concat(lit("e"), col("epoch").cast("string"), lit(":"),
          col("pack_id").cast("string"))).as("ord_key"))

  /** t29: LEAKAGE-SAFE train/valid/test split — assignment at near-dup
    * CLUSTER grain, the repair for the doc-grain content-hash split's
    * blind spot: md5(text) co-splits verbatim copies by construction, but
    * a near-duplicate differing in one token hashes independently, so
    * ~20% of near-dup pairs straddle train/test and the eval split is
    * contaminated before decontamination even runs (SplitSpec measures
    * the leak on this corpus and pins it nonzero). Here every document
    * inherits its d06 component's canonical id (itself when unclustered)
    * and the hash is taken over THAT, so a whole near-dup cluster lands
    * in one split atomically — the keep-all workflow's complement to
    * d07's keep-one (which prevents the same leak by deletion).
    * Cost: the memoized label table + one key-grain left join. */
  def clusterSplit(s: SparkSession, dir: String): DataFrame =
    clusterSplitOf(docs(s, dir).select("doc_id"), clusterLabels(s, dir))

  /** t29 at frame grain — split any doc-id frame by any label frame
    * (the corpus service hands in its maintained cluster labels). */
  private[graft] def clusterSplitOf(docIds: DataFrame,
                                    labels: DataFrame): DataFrame = {
    val bucket = h32(col("canonical_id").cast("string")) % 100
    docIds.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("canonical_id"))
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "valid")
          .otherwise("test"))
  }

  /** t30: the packed training set — the pipeline's terminal artifact,
    * composing the dedup/quality/split machinery into what actually ships
    * to the trainer: canonical keep/drop (d07) ∩ quality gate (t02's
    * rule) ∩ the leakage-safe TRAIN split (t29's cluster-grain rule — for
    * kept docs canonical_id = doc_id, so the same rule governs both the
    * keep-one and keep-all workflows), packed by t28's manifest. All
    * three gates are key-grain semi-joins over narrow scans; the packer
    * adds the block-grain prefix sum and nothing corpus-wide beyond it. */
  def trainingPacks(s: SparkSession, dir: String): DataFrame =
    packSpans(trainSplitToks(s, dir), PackCap)

  /** t30's gated (doc_id, n_toks) frame, factored so the corpus service
    * packs its maintained manifest with the identical gate arithmetic. */
  private[graft] def trainSplitToks(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .join(canonicalCorpus(s, dir).filter(col("is_kept") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .join(qualityScore(s, dir).filter(col("quality_ok") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .join(clusterSplit(s, dir).filter(col("split") === "train")
        .select("doc_id"), Seq("doc_id"), "left_semi")

  /** t16: DECONTAMINATED corpus materialization — t13's capstone with
    * d09's leakage machinery pointed the production direction: TRAINING
    * documents sharing ANY verbatim 8-gram with the held-out test split
    * are dropped before the (lang, split) totals. d09 AUDITS test docs
    * against train grams; decontamination REMOVES train docs against
    * test grams — the eval suite must stay meaningful, so the train
    * side pays.
    *
    * Scale shape, and why the Bloom asymmetry flips here: the TEST
    * split is the SMALL side (10% of this corpus; a fixed eval suite in
    * production), so its distinct grams build the broadcast Bloom
    * (memoized per dir, same machinery as d09) and the unboundedly
    * large TRAIN gram stream is filtered below the exact join — the
    * sketch is sized to the eval corpus, not the 100 TB side. No false
    * negatives (Bloom never rejects a member); false positives are
    * rejected by the exact gram join above it. */
  def corpusDecontaminated(s: SparkSession, dir: String): DataFrame =
    materializeSummary(trainingManifest(s, dir,
      canonicalCorpus(s, dir).filter(col("is_kept") === 1).select("doc_id"))
      .join(contaminatedTrainDocs(s, dir), Seq("doc_id"), "left_anti"))

  /** TRAIN documents sharing any verbatim 8-gram with the held-out test
    * split — t16's drop set, factored so the corpus service's
    * maintained manifest applies the identical decontamination. The
    * broadcast Bloom is built on the TEST grams (the small side) and
    * filters the train gram stream below the exact join. */
  private[graft] def contaminatedTrainDocs(s: SparkSession,
                                           dir: String): DataFrame = {
    val g = grams8(s, dir)
    val testGrams = g.filter(col("bucket") >= 90).select("gram").distinct()
    bloomFiltered(s, dir + "#test8", testGrams, g.filter(col("bucket") < 80))
      .join(testGrams, "gram")
      .select("doc_id").distinct()
  }

  /** d10: INCREMENTAL near-dup detection — the shape a growing corpus
    * actually runs every ingest cycle: only the NEW batch's banded
    * signatures probe the full signature table (new×all: catches
    * new-vs-existing AND new-vs-new), so the per-cycle cost is
    * O(|batch| + collisions), never the O(|corpus|²-ish) full self-join
    * d03 re-pays when run from scratch. Verified exact Jaccard on the
    * candidates, same contract as d03. The "new batch" here is the
    * newest 10% of doc ids (stand-in for a delta load; in the pipeline
    * the batch frame comes straight from the ingest micro-batch).
    * Canonical orientation: the new doc is `new_doc`; a new-new pair is
    * emitted once (smaller id first). */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val banded = bandedSignatures(sh)
    val cutoff = docs(s, dir).agg((max(col("doc_id")) * 9).as("c9"))
    val withCut = banded.crossJoin(broadcast(cutoff))
    val newSide = withCut.filter(col("doc_id") * 10 > col("c9"))
    val cand = newSide.as("a")
      .join(withCut.as("b"), bandEq && col("a.doc_id") =!= col("b.doc_id") &&
        (col("b.doc_id") * 10 <= col("b.c9") ||
          col("a.doc_id") < col("b.doc_id")))
      .select(col("a.doc_id").as("new_doc"), col("b.doc_id").as("other_doc"))
      .distinct()
    verifiedJaccard(cand, sh, "new_doc", "other_doc")
  }

  /** d11: exact-substring duplication detection — the memorization-grade
    * modality (a verbatim 30-token window shared between two documents
    * is training-data duplication even when whole-document similarity is
    * low, so d01–d03 never flag it; the standard treatment uses ~50 BPE
    * tokens, 30 whitespace tokens here sized to the corpus' median
    * length). Shape: distinct per-doc window hashes → ONE hash
    * aggregation by window → emit windows seen in >1 document with the
    * doc-id range. The shuffle carries |distinct windows| hashed keys —
    * the same cost class as d01, nothing pairwise. */
  def substringDupes(s: SparkSession, dir: String): DataFrame = {
    val g = toks(s, dir).select(col("doc_id"), explode(expr(
      """CASE WHEN size(t) < 30 THEN CAST(array() AS array<string>)
        |ELSE transform(sequence(0, size(t) - 30),
        |               i -> concat_ws(' ', slice(t, i + 1, 30))) END"""
        .stripMargin)).as("gram"))
      .distinct()
    // countDistinct, not count: the grain is the 32-bit window hash, and
    // two DIFFERENT windows of one document colliding on h32 must not
    // count that document twice — n_docs is distinct documents per hash.
    g.groupBy(h32(col("gram")).as("gram_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") >= 2)
  }

  /** s05: cell-blocked semantic dedup (the SemDeDup shape) — d05's scale
    * path, standing to it exactly as d03 stands to d02: instead of the
    * all-pairs O(n²) cosine join, every vector is assigned to its nearest
    * coarse-quantizer cell (s03's IVF machinery, broadcast centroids) and
    * only WITHIN-CELL pairs are compared — Σ|cell|² work, shuffled by
    * cell key. Recall bound: a near-dup pair split across two cells is
    * missed (the standard blocking trade; finer cells trade recall for
    * cost like nprobe does in s03). Each vector is MULTI-ASSIGNED to its
    * top-4 cells (the s03 nprobe dial on the indexing side): on the √n
    * quantizer's 32 hash-sampled cells (500 vectors, stride 22), top-3
    * measured 0.572 recall vs the exact d05 pairs on the near-uniform
    * synthetic embeddings, top-4 0.759 (195/257) — DedupSpec pins the
    * 0.6 floor. On clustered production embeddings
    * the same operator concentrates near-dups into one cell and the
    * multi-assignment factor can drop. Emits pairs at the d05 threshold
    * so the two operators' outputs are directly comparable. */
  def semdedupCells(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val assigned = imiRankB(e, coarseBooks(s, dir, e), "vec_id", 2)
      .filter(col("rn") <= 4)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val cand = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("q").as("qa"),
        col("s2").as("sa")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("q").as("qb"),
        col("s2").as("sb")), "vec_b")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .filter(col("cos_ppm") >= 350000)
      .select("vec_a", "vec_b", "cos_ppm")
  }

  /** t26: hard-negative mining — the CONTRASTIVE-TRAINING data
    * operator that rides the same cell structure s05's dedup does: for
    * each document, the k = 3 most-similar same-cell documents BELOW
    * the near-dup threshold (cos < 0.35). Random negatives are easy
    * and teach a model nothing; near-dups are positives (s05 finds
    * those); the band between them — close enough to share a cell,
    * distinct enough to not be a duplicate — is exactly what a
    * contrastive or embedding-finetune pipeline mines ("hard
    * negatives"). Ranked hardest-first (cos desc, ties by negative
    * id); both pair directions count, so every co-located doc gets its
    * own negatives.
    *
    * Scale shape: s05's cost verbatim — the candidate join is
    * cell-blocked (never all-pairs), exact cosine at candidate grain
    * by key join, one window per doc over its ≤cell-sized candidate
    * set. At 100 TB this reads the stored index's thin membership rows
    * exactly as s09 does; the one-shot form here is the oracle-anchor
    * recompute path. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val assigned = imiRankB(e, coarseBooks(s, dir, e), "vec_id", 2)
      .filter(col("rn") <= 4)
      .select(col("vec_id"), col("cent_id").as("cell"))
    hardNegativesFrom(assigned, e)
  }

  /** t26 OFF THE STORED INDEX — the s05→s09 storage-for-recompute swap
    * applied to hard-negative mining: candidate generation self-joins
    * the index's thin (cell, vec_id) membership rows (ALL top-4
    * assignments — exactly t26's multi-assignment) instead of
    * re-deriving the corpus-wide cell assignment per invocation; the
    * below-threshold band filter, exact cosine at candidate grain, both
    * directions, and the top-3 hardest-first window are unchanged
    * (shared [[hardNegativesFrom]], so the two forms cannot drift).
    * Output ≡ t26 row-for-row — same oracle SQL, the s05/s09 pattern.
    *
    * At 100 TB the per-invocation cost drops from assign-the-corpus
    * (n·√n integer dots through the broadcast quantizer — the one
    * deliberate non-equi join in t26's one-shot plan) to a two-column
    * scan of the index plus the cell-grain self-join: the mining job
    * rides the same stored artifact every other cell consumer amortizes
    * (s08 serving, s09 dedup, d13 resolution). PlanSpec pins the
    * indexed plan contains no nested-loop join. */
  def hardNegativesIndexed(s: SparkSession, dir: String): DataFrame =
    hardNegativesAt(s, dir, annIndexPath(s, dir))

  /** [[hardNegativesIndexed]] against an explicit index location — the
    * entry CorpusService.hardNegativesReport serves off its MAINTAINED
    * index (`dir` supplies the full vectors for the exact band
    * scoring; the index supplies the cell membership). `dropIds` is the
    * tombstone dial: deleted docs must appear neither as anchors nor as
    * negatives in the exported training pairs, so the filter lands on
    * BOTH the membership rows (candidate generation) and the quantized
    * vector frame (scoring) — the same immediately-on-delete contract
    * every other served surface honors. */
  def hardNegativesAt(s: SparkSession, dir: String, indexPath: String,
                      dropIds: Option[DataFrame] = None): DataFrame = {
    val idx0 = s.read.parquet(indexPath).select(col("cell"), col("vec_id"))
    val e0 = quantized(s, dir)
    val (idx, e) = dropIds.fold((idx0, e0)) { d =>
      val t = d.select(col(d.columns.head).as("vec_id"))
      (idx0.join(t, Seq("vec_id"), "left_anti"),
        e0.join(t, Seq("vec_id"), "left_anti"))
    }
    hardNegativesFrom(idx, e)
  }

  /** The shared scoring core of t26 and its indexed twin, at ASSIGNMENT
    * grain: `assigned` is any (cell, vec_id) membership frame (recomputed
    * top-4 for the one-shot, the stored index's thin rows for the
    * served form); candidates are cell-blocked (never all-pairs), exact
    * cosine by key join into `e`, kept in the hard-negative band
    * (below the near-dup cut), symmetrized, top-3 hardest-first. */
  private def hardNegativesFrom(assigned: DataFrame, e: DataFrame): DataFrame = {
    val cand = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val scored = cand
      .join(e.select(col("vec_id").as("vec_a"), col("q").as("qa"),
        col("s2").as("sa")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("q").as("qb"),
        col("s2").as("sb")), "vec_b")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .filter(col("cos_ppm") < 350000)
      .select("vec_a", "vec_b", "cos_ppm")
    // Both directions: each doc mines from its own perspective.
    val sym = scored
      .select(col("vec_a").as("doc_id"), col("vec_b").as("negative_id"),
        col("cos_ppm"))
      .unionByName(scored.select(col("vec_b").as("doc_id"),
        col("vec_a").as("negative_id"), col("cos_ppm")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("cos_ppm").desc, col("negative_id").asc)
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "negative_id", "cos_ppm", "rank")
  }

  /** s09: s05's semantic dedup served off the STORED index — the same
    * storage-for-recompute swap s08 makes for ANN serving, applied to
    * the dedup modality. Candidate generation self-joins the index's
    * thin (cell, vec_id) membership rows — ALL top-4 assignments,
    * exactly s05's multi-assignment — instead of re-deriving the
    * corpus-wide assignment per invocation; exact cosine verification
    * at candidate grain is unchanged (full vectors by key join). Output
    * ≡ s05 row-for-row (SemDedupIndexSpec; same oracle SQL).
    *
    * At 100 TB the per-invocation cost drops from assign-the-corpus
    * (n·√n dot products through the broadcast-quantizer cross join —
    * the one deliberate non-equi join in s05's plan) to a two-column
    * scan of the index plus the collision-grain self-join: the
    * assignment work is paid once at build/append time and amortized
    * across every consumer of the cell structure (s05's pairs, d13's
    * resolution, s08's serving). PlanSpec pins the difference: s09's
    * plan contains NO nested-loop join at all. */
  def semdedupIndexed(s: SparkSession, dir: String): DataFrame = {
    val a = annIndex(s, dir).select(col("cell"), col("vec_id"))
    val e = quantized(s, dir)
    val cand = a.as("x").join(a.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("q").as("qa"),
        col("s2").as("sa")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("q").as("qb"),
        col("s2").as("sb")), "vec_b")
      .withColumn("dot", dot)
      .withColumn("cos_ppm", cosPpm)
      .filter(col("cos_ppm") >= 350000)
      .select("vec_a", "vec_b", "cos_ppm")
  }

  /** d09: train/test contamination check — the evaluation-integrity pass
    * of a training pipeline: does any TEST document share a long n-gram
    * with any TRAIN document (benchmark leakage)? Splits are t06's
    * content-hash assignment, n-grams are 8 tokens (3-gram overlap is
    * ubiquitous natural language; 8-gram overlap is evidence of copying).
    * Shape: distinct train 8-grams (one hash agg) equi-joined to test
    * 8-gram rows — a hash join on the shingle key, never a doc×doc
    * comparison; output is per-test-doc hit counts.
    *
    * Bloom pre-pass: before the equi-join, test gram rows are filtered
    * through a broadcast Bloom filter built over the distinct train
    * grams (fpp 1%). Correctness is unaffected — a Bloom filter has no
    * false negatives, and its ~1% false positives are exactly what the
    * equi-join already rejects — but the join's shuffle now carries only
    * true hits plus 1% of the misses. At 100 TB the overwhelming
    * majority of test grams are NOT contaminated, so this cuts the
    * test-side shuffle by ~the non-hit fraction (PlanSpec pins the
    * filter sits below the join). The sketch itself is sized from the
    * measured train-gram count (~1.2 GB per 10⁹ distinct grams at 1% —
    * a broadcast-scale object; raise fpp to shrink it). */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val grams = grams8(s, dir)
    val trainGrams = grams.filter(col("bucket") < 80)
      .select("gram").distinct()
    // The sketch is a pure function of `dir`'s (static) train split, so
    // it is built ONCE per dir and memoized: rebuilding per invocation
    // cost three driver actions per bench iteration and leaked a new
    // session-lifetime broadcast each time (the deployed shape builds
    // the sketch once per corpus refresh too). Build = two bounded
    // actions over the persisted train grams, then the cache releases —
    // the returned plan's exact join recomputes trainGrams once, as it
    // did before the pre-pass.
    val bloomB = bloomCache.computeIfAbsent(bloomKey(s, dir), { _ =>
      trainGrams.persist()
      val bloom = try {
        val n = trainGrams.count()
        trainGrams.stat.bloomFilter("gram", math.max(n, 1000L), 0.01)
      } finally trainGrams.unpersist()
      s.sparkContext.broadcast(bloom)
    })
    val mightContain = udf((g: String) =>
      g != null && bloomB.value.mightContainString(g))
      .withName("bloom_might_contain")
    grams.filter(col("bucket") >= 90)
      .filter(mightContain(col("gram")))
      .join(trainGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_8grams"))
  }

  /** t14: repetition-based quality gating (the Gopher-rule family):
    * per-document duplicate-bigram fraction and top-bigram fraction —
    * boilerplate and generation loops show up as repeated n-grams long
    * before they show up in t02's stopword/length heuristics. Two
    * stacked hash aggs ((doc, bigram) counts → per-doc moments), all
    * ratios integer ppm. Docs with fewer than 2 tokens have no bigrams
    * and drop out (same contract in the oracle). */
  def repetitionQuality(s: SparkSession, dir: String): DataFrame = {
    val bg = toks(s, dir).select(col("doc_id"), explode(expr(
      """CASE WHEN size(t) < 2 THEN CAST(array() AS array<string>)
        |ELSE transform(sequence(0, size(t) - 2),
        |               i -> concat_ws(' ', t[i], t[i+1])) END"""
        .stripMargin)).as("g"))
    bg.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("c")).as("top_c"))
      .select(col("doc_id"),
        col("n_bigrams"),
        col("n_distinct_bigrams"),
        ppm(col("n_bigrams") - col("n_distinct_bigrams"), col("n_bigrams"))
          .as("dup_bigram_ppm"),
        ppm(col("top_c"), col("n_bigrams")).as("top_bigram_ppm"))
      .withColumn("repetition_ok",
        when(col("dup_bigram_ppm") < 200000 &&
          col("top_bigram_ppm") < 100000, 1).otherwise(0))
  }

  /** t15: token-balanced output sharding — the write-side twin of t09's
    * packing: every document assigned to one of 8 output shards such
    * that per-shard token totals stay balanced. Round-robin by global
    * size rank (descending) is the parallelizable approximation of LPT
    * greedy: consecutive ranks go to different shards, so each shard
    * gets one doc from every size stratum. The global ordinal uses the
    * q24 recomposition — histogram rank + tie-group position — so no
    * unpartitioned window ever touches the data grain and the plan
    * stays in whole-stage codegen. Output is the per-shard manifest
    * (doc/token totals) a writer would fan out on. */
  def shardAssign(s: SparkSession, dir: String): DataFrame = {
    val t = toks(s, dir)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
    val hw = Window.orderBy(col("n_tokens").desc)
    val hist = t.groupBy("n_tokens").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk0",
        coalesce(sum(col("cnt")).over(hw.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)) + lit(1L))
      .drop("cnt")
    val tieW = Window.partitionBy(col("n_tokens")).orderBy(col("doc_id").asc)
    t.join(broadcast(hist), Seq("n_tokens"))
      .withColumn("rn",
        col("rnk0") - lit(1L) + row_number().over(tieW).cast("long"))
      .withColumn("shard_id", (col("rn") - lit(1L)) % lit(8L))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
  }

  /** t05: text normalization — strip non-alphanumerics, collapse runs of
    * spaces, trim, lowercase; emit the normalized text, its portable hash
    * and length. Narrow codegen'd map, the canonical pre-dedup cleanup
    * pass of a training-data pipeline. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    val norm = lower(trim(regexp_replace(
      regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""), " +", " ")))
    docs(s, dir).select(col("doc_id"), norm.as("norm_text"),
      h32(norm).as("norm_hash"),
      length(norm).as("n_chars_norm"))
  }

  /** t06: deterministic stratified train/valid/test split — the split is a
    * pure function of the content hash (h32 mod 100: 80/10/10), not an RNG,
    * so membership is stable across runs, engines and repartitionings (the
    * property a reproducible training pipeline needs; rand(seed) sampling
    * is partition-order-dependent). Output: per (lang, split) counts. */
  def stratifiedSplit(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"),
        when(splitBucket < 80, "train").when(splitBucket < 90, "valid")
          .otherwise("test").as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"))

  /** t07: corpus length profile — token-count histogram in buckets of 10.
    * One narrow map + hash agg; the profiling pass that sizes
    * truncation/packing decisions upstream of training. */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame =
    toks(s, dir)
      .select((idiv(size(col("t")).cast("long"), lit(10L)) * 10).as("bucket_lo"))
      .groupBy("bucket_lo")
      .agg(count(lit(1)).as("n_docs"))

  /** t08: vocabulary building — top-20 tokens per language by frequency
    * (ties by token) — the vocab-induction pass of a tokenizer pipeline.
    * The per-lang window runs over (lang, token) counts, already one row
    * per distinct token: |vocab| grain, not |tokens|. */
  def vocabTopK(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("tok").asc)
    tokRows(s, dir).groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
      .select(col("lang"), col("rnk").cast("int").as("rnk"),
        col("tok"), col("c"))
  }

  /** t09: sequence packing — sequential fill of documents into
    * 2048-token context bins per language stratum: bin = floor(tokens
    * packed before this doc / budget) over a deterministic
    * (n_tokens desc, doc_id) order. The running sum is per-lang, so the
    * window is partitioned (packing globally would be the single-partition
    * anti-pattern; strata are how a distributed packer shards anyway).
    * Sequential fill is the standard parallelizable approximation of
    * greedy first-fit. */
  def packBins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    toks(s, dir)
      .select(col("doc_id"), col("lang"), size(col("t")).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        idiv(col("cum_before"), lit(2048L)).as("bin_id"))
  }

  // -------------------------------------------------- BPE tokenizer induction

  /** Merge rounds learned by t32/t33 — the vocab-size dial. 12 keeps the
    * unrolled DuckDB oracle twin the d13 size class; production would set
    * vocab_size − |alphabet|. */
  private[graft] val BpeRounds = 12

  /** Corpus word-frequency table with each word's initial symbol sequence
    * (characters + a `</w>` end-of-word marker — the Sennrich BPE
    * alphabet). This is the trainer's ONLY corpus-grain step: one hash
    * agg collapses the 100 TB token stream to the distinct-word table
    * (Heaps-law — millions of rows, not billions), and every merge round
    * after it runs at word grain. The char explode uses an explicit
    * substring transform, not split(word, ''), whose trailing-empty
    * behavior differs across engines. */
  private[graft] def bpeWords(d: DataFrame): DataFrame =
    d.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("seq", expr(
        "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))"))

  /** Adjacent symbol pairs weighted by word frequency — the per-round
    * merge-candidate statistics. Overlapping occurrences count (zip
    * adjacency), exactly as the reference BPE's get_stats does. */
  private def bpePairs(words: DataFrame): DataFrame =
    words.select(col("cnt"), explode(expr(
        """CASE WHEN size(seq) < 2 THEN CAST(array() AS array<struct<l:string,r:string>>)
          |ELSE transform(sequence(1, size(seq) - 1),
          |               i -> named_struct('l', seq[i-1], 'r', seq[i])) END"""
          .stripMargin)).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** One greedy merge application: every leftmost non-overlapping (l, r)
    * adjacency becomes the fused symbol, as a left fold over the symbol
    * array. The fold IS the reference semantics: it never chains onto a
    * symbol it just produced (l+r = l is impossible), and for runs of a
    * self-pair (l = r) it takes every other occurrence from the run head
    * — note a string replace(' l r ', ' lr ') would NOT (consecutive
    * occurrences share their separator space, so runs ≥ 5 regroup).
    * Deliberately no size guard: the fold is correct on 0/1-element
    * arrays, and referencing `seqCol` exactly once keeps a CHAIN of
    * applications (bpeTokensUnder folds the whole merge list into one
    * expression) linear — a guard's second reference would blow the
    * nested tree up 3^rounds. */
  private def bpeApply(seqCol: Column, l: String, r: String): Column =
    aggregate(seqCol, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Distributed BPE trainer: the learned merge list plus the word table
    * tokenized under all of it. Each round is one tiny weighted
    * pair-count agg, a ONE-ROW argmax collect (count desc, then (l, r)
    * lexicographic — the scalar decision every distributed BPE trainer
    * makes per round), and a narrow fold over the word table,
    * localCheckpoint-ed so round k+1's lineage doesn't replay rounds
    * 1..k; superseded rounds' blocks are freed eagerly and the caller
    * owns (and may free) the returned frame's. Stops early if the corpus
    * runs out of pairs. */
  private[graft] def bpeTrain(d: DataFrame, rounds: Int = BpeRounds)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var words = bpeWords(d).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= rounds && !exhausted) {
      val best = bpePairs(words)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((k, l, r, c))
        val next = words.withColumn("seq", bpeApply(col("seq"), l, r)).localCheckpoint()
        freeCkpt(words)
        words = next
        k += 1
      }
    }
    (merges.toSeq, words)
  }

  /** t32: distributed BPE vocabulary induction — the tokenizer-training
    * operator a pre-training pipeline runs before anything tokenizes.
    * Output is the learned merge table (rank, lhs, rhs, merged,
    * pair_count at merge time), ~rounds rows. The oracle twin unrolls
    * the identical greedy fold per round in DuckDB (bpeVocabOracle). */
  def bpeVocab(s: SparkSession, dir: String): DataFrame = {
    val (merges, fin) = bpeTrain(docs(s, dir))
    freeCkpt(fin)
    import s.implicits._
    merges.toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("pair_count"))
      .orderBy(col("rank"))
  }

  /** t33: BPE token counting — every document tokenized under the t32
    * vocabulary, reported as whitespace-token vs subword counts plus the
    * integer subwords-per-word ratio. The per-word subword table is the
    * broadcast side (Heaps-law small against the corpus), so the corpus
    * pass is one broadcast join + hash agg — the token-budget accounting
    * shape (t09/t18/t28 consume counts like these). */
  def bpeTokens(s: SparkSession, dir: String): DataFrame = {
    val (_, fin) = bpeTrain(docs(s, dir))
    val perWord = fin.select(col("word"), size(col("seq")).cast("long").as("n_sub"))
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(perWord), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ws_tokens"), sum(col("n_sub")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_tokens"),
        ppm(col("n_bpe_tokens"), col("n_ws_tokens")).as("bpe_per_word_ppm"))
  }

  /** t32's storage half: persist the learned merge table as the
    * TOKENIZER ARTIFACT — the rank-ordered merge list is exactly what a
    * trained tokenizer ships (merges.txt), and unlike a word→subwords
    * table it tokenizes words the training corpus never saw. One file:
    * the artifact is `rounds` rows. */
  private[graft] def buildBpeVocab(s: SparkSession, d: DataFrame,
                                   path: String,
                                   rounds: Int = BpeRounds): Unit = {
    val (merges, fin) = bpeTrain(d, rounds)
    freeCkpt(fin)
    import s.implicits._
    merges.toDF("rank", "lhs", "rhs", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Materialized tokenizer locations, one per corpus dir (built once
    * per JVM — the offline tokenizer-training job; queries read). Same
    * staleness contract as annIndexCache: a corpus that grew needs
    * invalidation, though a FROZEN vocab stays valid for serving — new
    * words still tokenize; retraining is a quality event, not a
    * correctness one (the quantizer-epoch asymmetry). */
  private val bpeVocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def invalidateBpeVocab(dir: String): Unit =
    bpeVocabCache.remove(dir)

  private[graft] def bpeVocabPath(s: SparkSession, dir: String): String =
    bpeVocabCache.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-bpevocab")
        .toFile.getAbsolutePath
      buildBpeVocab(s, docs(s, dir), p)
      p
    })

  /** The stored merge list, rank-ordered — driver-side tokenizer config
    * (the broadcast-ADC-lookup size class: `rounds` rows, never corpus
    * grain). */
  private[graft] def bpeMergesAt(s: SparkSession, path: String): Seq[(String, String)] =
    s.read.parquet(path).orderBy(col("rank"))
      .select(col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Tokenize a text frame under a FROZEN merge list: distinct words
    * fold through the merges in learned rank order (the reference BPE's
    * apply loop), occurrences broadcast-join back, one hash agg per
    * doc. This is the every-day serving shape — the corpus pass never
    * retrains — and it handles unseen words, which is why the artifact
    * stores merges and not a word table. */
  /** FULL tokenization (the subword sequences, not just counts) of an
    * arbitrary text frame under a FROZEN merge list — the request-path
    * primitive behind CorpusService.tokenize: one row per word
    * occurrence, positioned, carrying the word's subword array from
    * the rank-ordered greedy fold. Distinct words fold ONCE and
    * broadcast back onto occurrences (the bpeOccCounts shape), so the
    * per-request cost is |distinct words| folds + one narrow join —
    * unseen words are simply distinct words whose fold finds fewer
    * merges, never an error (the frozen-artifact contract). */
  private[graft] def bpeTokenizeUnder(d: DataFrame,
                                      merges: Seq[(String, String)])
      : DataFrame = {
    val occ = d.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val init = expr(
      "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))")
    val folded = merges.foldLeft(init) { case (c, (l, r)) => bpeApply(c, l, r) }
    val perWord = occ.select(col("word")).distinct()
      .select(col("word"), folded.as("subwords"))
    occ.join(broadcast(perWord), "word")
      .select(col("doc_id"), col("pos"), col("word"), col("subwords"))
  }

  private[graft] def bpeTokensUnder(d: DataFrame,
                                    merges: Seq[(String, String)]): DataFrame =
    bpeOccCounts(d, merges)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ws_tokens"), sum(col("n_sub")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_tokens"),
        ppm(col("n_bpe_tokens"), col("n_ws_tokens")).as("bpe_per_word_ppm"))

  /** Word occurrences of `d` carrying their per-word subword count
    * under `merges`: the distinct words fold once, occurrences
    * broadcast-join the result — the shared corpus pass under every
    * frozen-vocab consumer (t34's doc grain, t36's lang grain). */
  private def bpeOccCounts(d: DataFrame,
                           merges: Seq[(String, String)]): DataFrame = {
    val keys = col("doc_id") +:
      (if (d.columns.contains("lang")) Seq(col("lang")) else Nil)
    val occ = d.select(keys :+ explode(split(col("text"), " ")).as("word"): _*)
      .filter(col("word") =!= "")
    val init = expr(
      "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))")
    val folded = merges.foldLeft(init) { case (c, (l, r)) => bpeApply(c, l, r) }
    val perWord = occ.select(col("word")).distinct()
      .select(col("word"), size(folded).cast("long").as("n_sub"))
    occ.join(broadcast(perWord), "word")
  }

  /** t34: BPE token counting OFF THE STORED TOKENIZER — t33's serving
    * twin (the s05→s09 / t26→t27 move): the merge list is read from the
    * persisted artifact and applied frozen; no per-invocation training.
    * Same oracle text as t33 — BpeSpec pins them row-for-row, so the
    * fold-under-stored-merges path provably reproduces the trained word
    * table. */
  def bpeTokensStored(s: SparkSession, dir: String): DataFrame =
    bpeTokensUnder(docs(s, dir), bpeMergesAt(s, bpeVocabPath(s, dir)))

  /** t36: tokenizer FERTILITY by language — subwords-per-word under the
    * stored vocab, the standard tokenizer-quality audit: a language
    * whose fertility spikes is under-merged (its scripts never won a
    * merge round) and pays more context budget per word, which is the
    * number vocab-size and data-mixture decisions are actually made on.
    * Same frozen-vocab serving pass as t34, aggregated at (lang) grain
    * — |langs| output rows. */
  def bpeFertility(s: SparkSession, dir: String): DataFrame =
    bpeOccCounts(docs(s, dir), bpeMergesAt(s, bpeVocabPath(s, dir)))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
      .select(col("lang"), col("n_words"), col("n_subwords"),
        ppm(col("n_subwords"), col("n_words")).as("fertility_ppm"))

  /** t37: Count-Min-Sketch heavy hitters — the second SKETCH-family
    * operator (q17's HLL counts distincts; CMS counts frequencies):
    * token frequencies estimated from a d×w = 4×256 integer table that
    * never grows with the corpus, which is what a streaming ingest
    * monitor keeps per shard where the exact t08 agg would keep the
    * whole vocabulary. The estimate is min over d md5-bucketed rows
    * (never an undercount); the report carries the exact count next to
    * it so the overestimate is auditable, and keeps tokens whose
    * ESTIMATE clears total/50 — the sketch, not the oracle, makes the
    * cut, exactly as it would online. Exact-integer md5 bucketing =
    * hash-identical DuckDB twin. Scale: one 4×-exploded hash agg builds
    * the sketch; candidates probe it by BROADCAST (1024 rows). */
  /** CMS geometry: depth 4 rows × width 256 buckets. */
  private[graft] val CmsDepth = 4

  private[graft] def cmsBucket(jc: Column, tok: Column): Column =
    pmod(h32(concat(jc.cast("string"), lit(":"), tok)), lit(256L))

  /** The (j, b, c) partial sketch of a docs frame. CMS is a LINEAR
    * sketch: partial sketches of disjoint doc sets SUM to the union's
    * sketch row-for-row, which is exactly what lets every shard (or
    * every service drain) keep a 4×256 table and the monitor merge
    * them — the property CorpusService.refreshTokenSketch builds on. */
  private[graft] def cmsSketchOf(d: DataFrame): DataFrame =
    d.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("tok"), explode(lit((0 until CmsDepth).toArray)).as("j"))
      .select(col("j"), cmsBucket(col("j"), col("tok")).as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))

  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val occ = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val sketch = cmsSketchOf(docs(s, dir))
    val total = occ.agg(count(lit(1)).as("t"))
    val cand = occ.groupBy("tok").agg(count(lit(1)).as("exact_count"))
    cand.select(col("tok"), col("exact_count"),
        explode(lit((0 until CmsDepth).toArray)).as("j"))
      .withColumn("b", cmsBucket(col("j"), col("tok")))
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy("tok", "exact_count").agg(min(col("c")).as("est_count"))
      .crossJoin(broadcast(total))
      .filter(col("est_count") >= idiv(col("t"), lit(50L)))
      .select(col("tok"), col("est_count"), col("exact_count"),
        (col("est_count") - col("exact_count")).as("overcount"))
  }

  /** t35: sequence packing in SUBWORD truth — t28's block-hierarchical
    * packer driven by the stored tokenizer's counts instead of
    * whitespace counts. A trainer's context window is measured in
    * TOKENS, so the real pack boundaries come from the tokenizer; the
    * whitespace-count manifest (t28) is the approximation a pipeline
    * runs only before it has a vocab. Composition, no new shuffle
    * shape: frozen-merge fold over distinct words → broadcast join →
    * per-doc agg → the same prefix-sum packer. */
  def bpePacks(s: SparkSession, dir: String): DataFrame =
    packSpans(bpeTokensStored(s, dir)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_toks")), PackCap)

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

  // --------------------------------------------------------------- oracle SQL

  private val docCtes: String =
    """WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |tokrows AS (SELECT doc_id, lang, pos, t[pos] AS tok
      |            FROM toks, UNNEST(range(1, len(t) + 1)) u(pos)),
      |sh AS (SELECT DISTINCT doc_id, lang,
      |              t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |       FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) u(i)),
      |shc AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |shh AS (SELECT doc_id, lang, shingle,
      |               ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh)
      |""".stripMargin

  /** MinHash signature chain alone (mh → 16-col sig), shared with the
    * incremental variant (d10), whose candidate join differs. */
  private val sigCtes: String =
    """, mh AS (
      |  SELECT doc_id, j,
      |         min(((2 * j + 1) * h + 1000003 * j) % 2147483647) AS mh
      |  FROM shh, UNNEST(range(0, 16)) u(j) GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |    max(CASE WHEN j = 0 THEN mh END) m0, max(CASE WHEN j = 1 THEN mh END) m1,
      |    max(CASE WHEN j = 2 THEN mh END) m2, max(CASE WHEN j = 3 THEN mh END) m3,
      |    max(CASE WHEN j = 4 THEN mh END) m4, max(CASE WHEN j = 5 THEN mh END) m5,
      |    max(CASE WHEN j = 6 THEN mh END) m6, max(CASE WHEN j = 7 THEN mh END) m7,
      |    max(CASE WHEN j = 8 THEN mh END) m8, max(CASE WHEN j = 9 THEN mh END) m9,
      |    max(CASE WHEN j = 10 THEN mh END) m10, max(CASE WHEN j = 11 THEN mh END) m11,
      |    max(CASE WHEN j = 12 THEN mh END) m12, max(CASE WHEN j = 13 THEN mh END) m13,
      |    max(CASE WHEN j = 14 THEN mh END) m14, max(CASE WHEN j = 15 THEN mh END) m15
      |  FROM mh GROUP BY 1)
      |""".stripMargin

  /** The full d03 chain (sig → banded cand → verified common-shingle
    * counts), shared by the d03 oracle and the terminal dedup oracles
    * (d06/d07/t13) so the LSH graph they cluster is textually identical
    * to the one d03 verifies. */
  private val minhashCtes: String = sigCtes +
    """, cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
      |    (a.m0 = b.m0 AND a.m1 = b.m1 AND a.m2 = b.m2 AND a.m3 = b.m3) OR
      |    (a.m4 = b.m4 AND a.m5 = b.m5 AND a.m6 = b.m6 AND a.m7 = b.m7) OR
      |    (a.m8 = b.m8 AND a.m9 = b.m9 AND a.m10 = b.m10 AND a.m11 = b.m11) OR
      |    (a.m12 = b.m12 AND a.m13 = b.m13 AND a.m14 = b.m14 AND a.m15 = b.m15))),
      |common AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS c
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      |  GROUP BY 1, 2)
      |""".stripMargin

  /** Oracle twin of `connectedComponents(lshPairs(...))`: LSH-verified
    * pairs → symmetric edges → recursive transitive closure →
    * component-min labels. */
  private val ccCtes: String =
    docCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + minhashCtes +
    """, pairs AS (
      |  SELECT c.doc_a, c.doc_b
      |  FROM cand c
      |  LEFT JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
      |  JOIN shc x ON x.doc_id = c.doc_a
      |  JOIN shc y ON y.doc_id = c.doc_b
      |  WHERE (COALESCE(cm.c, 0) * 1000000) // (x.n_sh + y.n_sh - COALESCE(cm.c, 0)) >= 800000),
      |e AS (SELECT doc_a, doc_b FROM pairs
      |      UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, lab) AS (
      |  SELECT doc_a, doc_a FROM e
      |  UNION
      |  SELECT e.doc_a, r.lab FROM e JOIN reach r ON r.doc_id = e.doc_b),
      |labels AS (SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1)
      |""".stripMargin

  /** t28/t30's packing arithmetic in SQL, over a prior CTE `pd(doc_id,
    * n_toks)`: the oracle computes the running offset as ONE global
    * cumsum window — the associativity-equivalent of the Spark side's
    * block-hierarchical prefix sum (PackSpec pins the equivalence across
    * block sizes), exact because every value is BIGINT. */
  private val packSqlTail: String =
    """c AS (SELECT doc_id, n_toks,
      |        CAST(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
      |      FROM pd WHERE n_toks > 0)
      |SELECT doc_id, CAST(u.p AS BIGINT) AS pack_id,
      |       GREATEST(u.p * 128 - strt, 0) AS doc_start,
      |       GREATEST(strt - u.p * 128, 0) AS pack_start,
      |       LEAST((u.p + 1) * 128, strt + n_toks) - GREATEST(u.p * 128, strt) AS span_toks
      |FROM c, UNNEST(range(strt // 128, (strt + n_toks - 1) // 128 + 1)) u(p)
      |""".stripMargin

  private val embCtes: String =
    """WITH qe AS (SELECT vec_id,
      |        list_transform(embedding,
      |          v -> CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS q
      |       FROM embeddings),
      |ev AS (SELECT vec_id, i, q[i] AS v FROM qe, UNNEST(range(1, len(q) + 1)) u(i)),
      |sq AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS s2 FROM ev GROUP BY 1)
      |""".stripMargin

  /** The IVF ∘ prefix oracle, shared by s07 (assignment recomputed per
    * invocation) and s08 (assignment read from the materialized index):
    * the two strategies answer the same query and must agree
    * row-for-row, so one SQL text serves both. */
  /** The prefix-then-rerank IVF chain as a reusable CTE block (ends at
    * `scored` — the exact cosine over the ~100 rerank survivors);
    * ivfPrefixOracle adds the top-5 cut, s24's audit joins it against
    * the exact scan instead. */
  private val ivfChainCtes: String = embCtes + ", " + imiAssignProbeCtes(12) +
    """ccand AS (
      |  SELECT DISTINCT p.query_id, a.neighbor_id
      |  FROM probes p JOIN assigned a ON a.cell = p.cell
      |  WHERE a.neighbor_id <> p.query_id),
      |psq AS (
      |  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS sp
      |  FROM ev WHERE i <= 32 GROUP BY 1),
      |pdots AS (
      |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS pdot
      |  FROM ccand c
      |  JOIN ev a ON a.vec_id = c.query_id AND a.i <= 32
      |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
      |  GROUP BY 1, 2),
      |pscored AS (
      |  SELECT d.query_id, d.neighbor_id,
      |         CAST(floor(d.pdot / (sqrt(x.sp) * sqrt(y.sp)) * 1000000 + 0.5) AS BIGINT) AS pcos
      |  FROM pdots d
      |  JOIN psq x ON x.vec_id = d.query_id
      |  JOIN psq y ON y.vec_id = d.neighbor_id),
      |cand AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |                ORDER BY pcos DESC, neighbor_id) AS prn
      |    FROM pscored) t WHERE prn <= 100),
      |cdots AS (
      |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM cand c
      |  JOIN ev a ON a.vec_id = c.query_id
      |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.query_id, d.neighbor_id,
      |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
      |  FROM cdots d
      |  JOIN sq x ON x.vec_id = d.query_id
      |  JOIN sq y ON y.vec_id = d.neighbor_id)
      |""".stripMargin

  private val ivfPrefixOracle: String = ivfChainCtes +
    """SELECT query_id, neighbor_id, cos_ppm, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM scored) t
      |WHERE rank <= 5""".stripMargin

  /** s24's oracle: the IVF chain's top-5 against the exact scan's
    * top-5, joined to per-query hit counts — recall in ppm with the
    * truncating-div idiom. */
  private val recallAuditOracle: String = ivfChainCtes.stripSuffix("\n") +
    """,
      |itop AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |                ORDER BY cos_ppm DESC, neighbor_id) AS rn
      |    FROM scored) t WHERE rn <= 5),
      |qdots AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
      |  GROUP BY 1, 2),
      |escored AS (
      |  SELECT d.query_id, d.neighbor_id,
      |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
      |  FROM qdots d
      |  JOIN sq x ON x.vec_id = d.query_id
      |  JOIN sq y ON y.vec_id = d.neighbor_id),
      |etop AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |                ORDER BY cos_ppm DESC, neighbor_id) AS rn
      |    FROM escored) t WHERE rn <= 5),
      |hits AS (
      |  SELECT e.query_id, count(*) AS c
      |  FROM etop e JOIN itop i
      |    ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
      |  GROUP BY 1),
      |ek AS (SELECT query_id, count(*) AS k FROM etop GROUP BY 1)
      |SELECT ek.query_id, COALESCE(h.c, 0) AS n_hit, ek.k,
      |       (COALESCE(h.c, 0) * 1000000) // ek.k AS recall_ppm
      |FROM ek LEFT JOIN hits h ON h.query_id = ek.query_id""".stripMargin

  /** The filtered-IVF oracle, shared by s11 (assignment + label
    * joined per invocation) and s12 (both read from the stored
    * index): two strategies, one answer, one SQL text — the s07/s08
    * sharing pattern. */
  private val filteredIvfOracle: String = embCtes + ", " + imiAssignProbeCtes(20) +
      """cand AS (
        |  SELECT p.query_id, lq.label, a.neighbor_id
        |  FROM probes p JOIN assigned a ON a.cell = p.cell
        |  JOIN embeddings lq ON lq.vec_id = p.query_id
        |  JOIN embeddings ln ON ln.vec_id = a.neighbor_id
        |  WHERE a.neighbor_id <> p.query_id AND ln.label = lq.label),
        |cdots AS (
        |  SELECT c.query_id, c.label, c.neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT d.query_id, d.label, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, label, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin


  /** The cell-blocked semantic-dedup oracle, shared by s05 (assignment
    * recomputed per invocation) and s09 (assignment read from the
    * materialized index): the two strategies answer the same query and
    * must agree row-for-row, so one SQL text serves both — the same
    * contract the s07/s08 pair carries via ivfPrefixOracle. */
  /** The IVF∘SQ8 oracle text shared by s15 (recompute) and s17
    * (index-served) — the ivfPrefixOracle sharing pattern: DuckDB
    * cannot tell where the codes came from, only that the pruned,
    * code-scored, exactly-reranked top-5 is right. */
  private val ivfSq8Oracle: String = embCtes + ", " + imiAssignProbeCtes(12) +
      """ccand AS (
        |  SELECT DISTINCT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON a.cell = p.cell
        |  WHERE a.neighbor_id <> p.query_id),
        |dim AS (SELECT i, min(v) AS mn, max(v) - min(v) AS r
        |        FROM ev GROUP BY 1),
        |code AS (
        |  SELECT e.vec_id, e.i,
        |    CASE WHEN d.r = 0 THEN 255 * d.mn
        |         ELSE 255 * d.mn + (((e.v - d.mn) * 510 + d.r) // (2 * d.r)) * d.r
        |    END AS vh
        |  FROM ev e JOIN dim d ON d.i = e.i),
        |csq AS (SELECT vec_id, CAST(SUM(vh * vh) AS BIGINT) AS ss
        |        FROM code GROUP BY 1),
        |qdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.vh * b.vh) AS BIGINT) AS adot
        |  FROM ccand c
        |  JOIN code a ON a.vec_id = c.query_id
        |  JOIN code b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |qscored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.adot / (sqrt(x.ss) * sqrt(y.ss)) * 1000000 + 0.5) AS BIGINT) AS acos
        |  FROM qdots d
        |  JOIN csq x ON x.vec_id = d.query_id
        |  JOIN csq y ON y.vec_id = d.neighbor_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY acos DESC, neighbor_id) AS arn
        |    FROM qscored) t WHERE arn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin

  private val semdedupOracleSql: String = embCtes + ", " + imiAssign4Ctes +
    """cand AS (
      |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      |  FROM assigned x
      |  JOIN assigned y ON y.cell = x.cell AND x.vec_id < y.vec_id),
      |pdots AS (
      |  SELECT c.vec_a, c.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM cand c
      |  JOIN ev a ON a.vec_id = c.vec_a
      |  JOIN ev b ON b.vec_id = c.vec_b AND b.i = a.i
      |  GROUP BY 1, 2)
      |SELECT vec_a, vec_b, cos_ppm FROM (
      |  SELECT p.vec_a, p.vec_b,
      |         CAST(floor(p.dot / (sqrt(sx.s2) * sqrt(sy.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
      |  FROM pdots p
      |  JOIN sq sx ON sx.vec_id = p.vec_a
      |  JOIN sq sy ON sy.vec_id = p.vec_b) t
      |WHERE cos_ppm >= 350000""".stripMargin

  // t26's oracle = s05's cell-blocked scoring chain with the OPPOSITE
  // threshold filter (the hard-negative band sits below the near-dup
  // cut), symmetrized, top-3 per doc. MATERIALIZED where referenced
  // twice (assigned; the scored pair frame feeds both directions).
  // Shared verbatim by the indexed twin (the s05/s09 pattern): the two
  // Spark forms are semantically identical by contract, so they check
  // against identical SQL.
  private val hardNegativesOracleSql: String =
    Seq("ev", "sq").foldLeft(embCtes)((acc, c) =>
      acc.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " + imiAssign4Ctes +
    """cand AS MATERIALIZED (
      |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      |  FROM assigned x
      |  JOIN assigned y ON y.cell = x.cell AND x.vec_id < y.vec_id),
      |pdots AS MATERIALIZED (
      |  SELECT c.vec_a, c.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM cand c
      |  JOIN ev a ON a.vec_id = c.vec_a
      |  JOIN ev b ON b.vec_id = c.vec_b AND b.i = a.i
      |  GROUP BY 1, 2),
      |neg AS MATERIALIZED (
      |  SELECT vec_a, vec_b, cos_ppm FROM (
      |    SELECT p.vec_a, p.vec_b,
      |           CAST(floor(p.dot / (sqrt(sx.s2) * sqrt(sy.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
      |    FROM pdots p
      |    JOIN sq sx ON sx.vec_id = p.vec_a
      |    JOIN sq sy ON sy.vec_id = p.vec_b) t
      |  WHERE cos_ppm < 350000),
      |sym AS (
      |  SELECT vec_a AS doc_id, vec_b AS negative_id, cos_ppm FROM neg
      |  UNION ALL
      |  SELECT vec_b AS doc_id, vec_a AS negative_id, cos_ppm FROM neg)
      |SELECT doc_id, negative_id, cos_ppm, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |              ORDER BY cos_ppm DESC, negative_id) AS INTEGER) AS rank
      |  FROM sym) t
      |WHERE rank <= 3""".stripMargin

  /** Unrolled DuckDB twin of bpeTrain: w0 is the word-frequency table
    * with char+`</w>` symbol sequences; each round k derives pair counts
    * (p_k), the deterministic argmax (b_k), and the merged word table
    * (w_k) via the SAME leftmost non-overlapping greedy fold —
    * list_reduce over single-element lists so the accumulator type
    * unifies. A string-replace formulation would diverge on runs ≥ 5 of
    * a self-pair (consecutive occurrences share their separator), which
    * is why both engines fold. Multi-referenced CTEs are MATERIALIZED
    * (each w_k feeds p_{k+1} and w_{k+1}; inlining re-runs the whole
    * chain multiplicatively — the d13 lesson). */
  private def bpeCtes(rounds: Int): String = {
    val w0 =
      """WITH w0 AS MATERIALIZED (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
        |         string_split(word, '') || ['</w>'] AS seq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin
    val roundCtes = (1 to rounds).map { k =>
      s"""p$k AS (
         |  SELECT z[1] AS l, z[2] AS r, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest(list_zip(seq, seq[2:])) AS z FROM w${k - 1})
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT word, cnt,
         |    CASE WHEN len(seq) < 2 THEN seq ELSE
         |      list_reduce(list_transform(seq, x -> [x]),
         |        (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b$k.l AND x[1] = b$k.r
         |                         THEN acc[1:len(acc)-1] || [b$k.l || b$k.r]
         |                         ELSE acc || x END) END AS seq
         |  FROM w${k - 1}, b$k)""".stripMargin
    }
    (w0 +: roundCtes).mkString(",\n")
  }

  private val bpeVocabOracle: String = {
    val unions = (1 to BpeRounds).map { k =>
      s"  SELECT CAST($k AS INTEGER) AS rank, l AS lhs, r AS rhs, l || r AS merged, c AS pair_count FROM b$k"
    }.mkString("\n  UNION ALL\n")
    bpeCtes(BpeRounds) +
      s"\nSELECT rank, lhs, rhs, merged, pair_count FROM (\n$unions) ORDER BY rank"
  }

  private val bpeTokensOracle: String =
    bpeCtes(BpeRounds) +
      s""",
         |docw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT d.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_ws_tokens,
         |  CAST(sum(len(ww.seq)) AS BIGINT) AS n_bpe_tokens,
         |  (CAST(sum(len(ww.seq)) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS bpe_per_word_ppm
         |FROM docw d JOIN w$BpeRounds ww ON ww.word = d.word
         |WHERE d.word <> ''
         |GROUP BY d.doc_id""".stripMargin

  private val bpePacksOracle: String =
    bpeCtes(BpeRounds) +
      s""",
         |docw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |pd AS (
         |  SELECT d.doc_id, CAST(sum(len(ww.seq)) AS BIGINT) AS n_toks
         |  FROM docw d JOIN w$BpeRounds ww ON ww.word = d.word
         |  WHERE d.word <> '' GROUP BY d.doc_id),
         |""".stripMargin + packSqlTail

  private val bpeFertilityOracle: String =
    bpeCtes(BpeRounds) +
      s""",
         |docw AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(len(ww.seq)) AS BIGINT) AS n_subwords,
         |  (CAST(sum(len(ww.seq)) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS fertility_ppm
         |FROM docw d JOIN w$BpeRounds ww ON ww.word = d.word
         |WHERE d.word <> ''
         |GROUP BY lang""".stripMargin

  private val cmsOracle: String =
    """WITH occ AS (
      |  SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |                   FROM documents) WHERE tok <> ''),
      |rb AS (
      |  SELECT tok, j,
      |         ('0x' || substr(md5(j || ':' || tok), 1, 8))::BIGINT % 256 AS b
      |  FROM occ, UNNEST(range(0, 4)) u(j)),
      |sketch AS (SELECT j, b, CAST(count(*) AS BIGINT) AS c FROM rb GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM occ),
      |cand AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
      |         FROM occ GROUP BY 1),
      |probes AS (
      |  SELECT tok, exact_count, j,
      |         ('0x' || substr(md5(j || ':' || tok), 1, 8))::BIGINT % 256 AS b
      |  FROM cand, UNNEST(range(0, 4)) u(j)),
      |est AS (
      |  SELECT p.tok, p.exact_count, min(s.c) AS est_count
      |  FROM probes p JOIN sketch s ON s.j = p.j AND s.b = p.b
      |  GROUP BY 1, 2)
      |SELECT tok, est_count, exact_count,
      |       est_count - exact_count AS overcount
      |FROM est, tot WHERE est_count >= t // 50""".stripMargin

  // ------------------------------------------------------------------- specs

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("d01_dedup_exact", dedupExact, Some(
      """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin)),

    QuerySpec("d02_dedup_ngram_jaccard", dedupNgramJaccard, Some(docCtes +
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       count(*) AS common_shingles,
        |       (count(*) * 1000000) // (x.n_sh + y.n_sh - count(*)) AS jaccard_ppm
        |FROM sh a
        |JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
        |JOIN shc x ON x.doc_id = a.doc_id
        |JOIN shc y ON y.doc_id = b.doc_id
        |GROUP BY 1, 2, x.n_sh, y.n_sh
        |HAVING (count(*) * 1000000) // (x.n_sh + y.n_sh - count(*)) >= 800000""".stripMargin)),

    // d14 = d02's job-callable twin: SAME oracle SQL (the block is
    // lossless), so the registry carries the exact-anchor (d02, never
    // wired into a job) and the production form side by side.
    QuerySpec("d14_dedup_jaccard_blocked", dedupNgramJaccardBlocked,
      Some(docCtes +
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       count(*) AS common_shingles,
        |       (count(*) * 1000000) // (x.n_sh + y.n_sh - count(*)) AS jaccard_ppm
        |FROM sh a
        |JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
        |JOIN shc x ON x.doc_id = a.doc_id
        |JOIN shc y ON y.doc_id = b.doc_id
        |GROUP BY 1, 2, x.n_sh, y.n_sh
        |HAVING (count(*) * 1000000) // (x.n_sh + y.n_sh - count(*)) >= 800000""".stripMargin)),

    QuerySpec("d03_dedup_minhash_lsh", dedupMinhashLsh, Some(docCtes +
      minhashCtes +
      """SELECT c.doc_a, c.doc_b,
        |       (COALESCE(cm.c, 0) * 1000000) // (x.n_sh + y.n_sh - COALESCE(cm.c, 0)) AS jaccard_ppm
        |FROM cand c
        |LEFT JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
        |JOIN shc x ON x.doc_id = c.doc_a
        |JOIN shc y ON y.doc_id = c.doc_b""".stripMargin)),

    QuerySpec("d04_dedup_simhash", dedupSimhash, Some(docCtes +
      """, tokc AS (
        |  SELECT doc_id, tok, count(*) AS c,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        |  FROM tokrows GROUP BY doc_id, tok),
        |bitsum AS (
        |  SELECT doc_id, bit, (1::BIGINT << CAST(bit AS INT)) AS p2,
        |         SUM(c * (2 * ((h // (1::BIGINT << CAST(bit AS INT))) % 2) - 1)) AS sgn
        |  FROM tokc, UNNEST(range(0, 32)) u(bit) GROUP BY 1, 2, 3)
        |SELECT doc_id,
        |       CAST(SUM(CASE WHEN sgn > 0 THEN p2 ELSE 0 END) AS BIGINT) AS simhash
        |FROM bitsum GROUP BY 1""".stripMargin)),

    QuerySpec("d05_dedup_embedding", dedupEmbedding, Some(embCtes +
      """, dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT vec_a, vec_b, cos_ppm FROM (
        |  SELECT d.vec_a, d.vec_b,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM dots d
        |  JOIN sq x ON x.vec_id = d.vec_a
        |  JOIN sq y ON y.vec_id = d.vec_b) t
        |WHERE cos_ppm >= 350000""".stripMargin)),

    QuerySpec("s01_ann_cosine_topk", annCosineTopK, Some(embCtes +
      """, qdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM qdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s02_ann_lsh_buckets", annLshBuckets, Some(embCtes +
      """, w AS (
        |  SELECT p, i,
        |         ((('0x' || substr(md5(p || '_' || i), 1, 8))::BIGINT % 2001) - 1000) AS wv
        |  FROM UNNEST(range(0, 32)) a(p), UNNEST(range(1, 65)) b(i)),
        |planes AS (
        |  SELECT ev.vec_id, w.p, SUM(ev.v * w.wv) AS sgn
        |  FROM ev JOIN w ON ev.i = w.i GROUP BY 1, 2),
        |buckets AS (
        |  SELECT vec_id, CAST(p // 4 AS INT) AS t,
        |         CAST(SUM(CASE WHEN sgn > 0 THEN (1::BIGINT << CAST(p % 4 AS INT)) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM planes GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
        |  FROM buckets q JOIN buckets n
        |    ON q.t = n.t AND q.bucket = n.bucket AND q.vec_id < 10 AND n.vec_id <> q.vec_id),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("t01_token_stats", tokenStats, Some(
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_measured,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_regex_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens
        |FROM documents""".stripMargin)),

    QuerySpec("t02_quality_score", qualityScore, Some(
      """SELECT doc_id,
        |  CAST(len(t) AS INTEGER) AS n_tokens,
        |  (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) AS stop_ratio_ppm,
        |  (len(list_distinct(t)) * 1000000) // len(t) AS distinct_ratio_ppm,
        |  (length(replace(text, ' ', '')) * 1000) // len(t) AS avg_token_len_ppk,
        |  CASE WHEN len(t) >= 20
        |        AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000
        |       THEN 1 ELSE 0 END AS quality_ok
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) d""".stripMargin)),

    QuerySpec("t03_lang_id", langId, Some(docCtes +
      """, prof AS (
        |  SELECT lang AS plang, tok, count(*) AS c FROM tokrows GROUP BY 1, 2),
        |ptot AS (SELECT plang, CAST(SUM(c) AS BIGINT) AS tot FROM prof GROUP BY 1),
        |profw AS (
        |  SELECT p.plang, p.tok, (p.c * 1000000) // t.tot AS w
        |  FROM prof p JOIN ptot t ON p.plang = t.plang),
        |scores AS (
        |  SELECT d.doc_id, d.lang AS true_lang, p.plang,
        |         CAST(SUM(p.w) AS BIGINT) AS score
        |  FROM tokrows d JOIN profw p ON d.tok = p.tok
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, true_lang, plang AS predicted_lang, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |              ORDER BY score DESC, plang ASC) AS rn
        |  FROM scores) t
        |WHERE rn = 1""".stripMargin)),

    QuerySpec("t04_fingerprint", fingerprint, Some(docCtes +
      """SELECT doc_id,
        |  CAST(SUM((pos * ('0x' || substr(md5(tok), 1, 8))::BIGINT) % 2147483647)
        |       % 2147483647 AS BIGINT) AS fingerprint,
        |  count(*) AS n_tokens
        |FROM tokrows GROUP BY 1""".stripMargin)),

    // octet_length(encode(..)) = UTF-8 byte length, matching the Spark
    // side's encode(text,'UTF-8').length — length(text) would count
    // characters and diverge on any non-ASCII document.
    QuerySpec("m01_multimodal_features", multimodalFeatures, Some(
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  ('0x' || substr(md5(text), 1, 8))::BIGINT AS checksum32,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS frame_width,
        |  CAST(octet_length(encode(text)) // 1000 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin)),

    // True connected components: the oracle's recursive CTE enumerates every
    // (node, reachable-node) pair of the symmetric edge set and takes the
    // minimum — exact for ANY component diameter, matching the Spark side's
    // run-to-fixpoint label propagation. Both sides cluster the LSH-verified
    // candidate graph (ccCtes ≡ connectedComponents(lshPairs)).
    QuerySpec("d06_dedup_clusters", dedupClusters,
      Some(ccCtes + "SELECT doc_id, cluster_id FROM labels")),

    QuerySpec("d07_canonical_corpus", canonicalCorpus,
      Some(ccCtes +
      """SELECT d.doc_id, d.lang,
        |  COALESCE(l.cluster_id, d.doc_id) AS canonical_id,
        |  CASE WHEN COALESCE(l.cluster_id, d.doc_id) = d.doc_id
        |       THEN 1 ELSE 0 END AS is_kept
        |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id""".stripMargin)),

    QuerySpec("t10_tfidf_topterms", tfIdfTopTerms, Some(docCtes +
      """, tf AS (
        |  SELECT lang, doc_id, tok, count(*) AS tf FROM tokrows GROUP BY 1, 2, 3),
        |dfc AS (SELECT lang, tok, count(*) AS df FROM tf GROUP BY 1, 2),
        |nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id, t.tok, t.tf,
        |         (n.n_docs * 1000000) // d.df AS idf_ppm,
        |         t.tf * ((n.n_docs * 1000000) // d.df) AS tfidf
        |  FROM tf t
        |  JOIN dfc d ON d.lang = t.lang AND d.tok = t.tok
        |  JOIN nd n ON n.lang = t.lang)
        |SELECT doc_id, term_rank, tok, tf, idf_ppm, tfidf FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |              ORDER BY tfidf DESC, tok ASC) AS INTEGER) AS term_rank
        |  FROM scored) x
        |WHERE term_rank <= 3""".stripMargin)),

    QuerySpec("d08_edit_distance_pairs", dedupEditDistance, Some(
      """WITH d AS (
        |  SELECT doc_id, lang, substr(text, 1, 20) AS prefix,
        |         length(text) // 50 AS lenb
        |  FROM documents),
        |blocked AS (
        |  SELECT doc_id, lang, prefix, lenb, lenb AS blk FROM d
        |  UNION ALL
        |  SELECT doc_id, lang, prefix, lenb, lenb + 1 AS blk FROM d),
        |cand AS (
        |  SELECT least(a.doc_id, b.doc_id) AS doc_a,
        |         greatest(a.doc_id, b.doc_id) AS doc_b,
        |         a.prefix AS pa, b.prefix AS pb
        |  FROM blocked a
        |  JOIN d b ON a.lang = b.lang AND a.blk = b.lenb
        |          AND (a.lenb < b.lenb OR a.doc_id < b.doc_id))
        |SELECT doc_a, doc_b,
        |  CAST(levenshtein(pa, pb) AS INTEGER) AS edit_dist
        |FROM cand
        |WHERE levenshtein(pa, pb) <= 10""".stripMargin)),

    QuerySpec("t12_stratified_reservoir", stratifiedReservoir, Some(
      """WITH d AS (
        |  SELECT lang, doc_id,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |  FROM documents)
        |SELECT lang, sample_rank, doc_id, h FROM (
        |  SELECT lang, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY lang
        |          ORDER BY h ASC, doc_id ASC) AS INTEGER) AS sample_rank
        |  FROM d) x
        |WHERE sample_rank <= 10""".stripMargin)),

    QuerySpec("m03_chunk_checksums", chunkChecksums, Some(
      """WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) > 0),
        |ch AS (
        |  SELECT doc_id, i AS chunk_idx,
        |         substr(text, CAST(i * 1000 + 1 AS INT), 1000) AS chunk
        |  FROM d, UNNEST(range(0, (len - 1) // 1000 + 1)) u(i))
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(length(chunk) AS BIGINT) AS chunk_len,
        |  ('0x' || substr(md5(chunk), 1, 8))::BIGINT AS checksum32
        |FROM ch""".stripMargin)),

    QuerySpec("m04_phash_neardup", mediaPhashPairs, Some(
      """WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) >= 64),
        |w AS (
        |  SELECT doc_id, substr(text, CAST(k * 16 + 1 AS INT), 64) AS win
        |  FROM d, UNNEST(range(0, (len - 64) // 16 + 1)) u(k)),
        |wh AS (
        |  SELECT doc_id, win,
        |         ('0x' || substr(md5(win), 1, 8))::BIGINT AS h0,
        |         ('0x' || substr(md5('w1#' || win), 1, 8))::BIGINT AS h1
        |  FROM w),
        |bitsum AS (
        |  SELECT doc_id, bit,
        |         CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
        |              ELSE (1::BIGINT << CAST(bit AS INT)) END AS p2,
        |         SUM(2 * (((CASE WHEN bit < 32 THEN h0 ELSE h1 END)
        |                   // (1::BIGINT << CAST(bit % 32 AS INT))) % 2) - 1) AS sgn
        |  FROM wh, UNNEST(range(0, 64)) u(bit) GROUP BY 1, 2, 3),
        |sigs AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN sgn > 0 THEN p2 ELSE 0 END) AS BIGINT) AS sig
        |  FROM bitsum GROUP BY 1),
        |banded AS (
        |  SELECT b.band, ((s.sig >> CAST(16 * b.band AS INT)) & 65535) AS bkey,
        |         s.doc_id, s.sig
        |  FROM sigs s, UNNEST(range(0, 4)) b(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.sig AS sig_a, b.sig AS sig_b
        |  FROM banded a JOIN banded b
        |    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |       CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3""".stripMargin)),

    QuerySpec("m05_phash_incremental", phashIncremental, Some(
      """WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) >= 64),
        |w AS (
        |  SELECT doc_id, substr(text, CAST(k * 16 + 1 AS INT), 64) AS win
        |  FROM d, UNNEST(range(0, (len - 64) // 16 + 1)) u(k)),
        |wh AS (
        |  SELECT doc_id, win,
        |         ('0x' || substr(md5(win), 1, 8))::BIGINT AS h0,
        |         ('0x' || substr(md5('w1#' || win), 1, 8))::BIGINT AS h1
        |  FROM w),
        |bitsum AS (
        |  SELECT doc_id, bit,
        |         CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
        |              ELSE (1::BIGINT << CAST(bit AS INT)) END AS p2,
        |         SUM(2 * (((CASE WHEN bit < 32 THEN h0 ELSE h1 END)
        |                   // (1::BIGINT << CAST(bit % 32 AS INT))) % 2) - 1) AS sgn
        |  FROM wh, UNNEST(range(0, 64)) u(bit) GROUP BY 1, 2, 3),
        |sigs AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN sgn > 0 THEN p2 ELSE 0 END) AS BIGINT) AS sig
        |  FROM bitsum GROUP BY 1),
        |cut AS (SELECT max(doc_id) * 9 AS c9 FROM documents),
        |banded AS (
        |  SELECT b.band, ((s.sig >> CAST(16 * b.band AS INT)) & 65535) AS bkey,
        |         s.doc_id, s.sig
        |  FROM sigs s, UNNEST(range(0, 4)) b(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS other_doc,
        |         a.sig AS sa, b.sig AS sb
        |  FROM banded a JOIN banded b
        |    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id <> b.doc_id,
        |    cut
        |  WHERE a.doc_id * 10 > cut.c9
        |    AND (b.doc_id * 10 <= cut.c9 OR a.doc_id < b.doc_id))
        |SELECT new_doc, other_doc,
        |       CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin)),

    QuerySpec("t13_corpus_materialize", corpusMaterialize,
      Some(ccCtes +
      """, kept AS (
        |  SELECT d.doc_id FROM documents d
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |  WHERE COALESCE(l.cluster_id, d.doc_id) = d.doc_id),
        |quality AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, string_split(text, ' ') AS t FROM documents) q
        |  WHERE len(t) >= 20
        |    AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000)
        |SELECT d.lang,
        |  CASE WHEN ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100 < 90 THEN 'valid'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents d
        |JOIN kept k ON k.doc_id = d.doc_id
        |JOIN quality q ON q.doc_id = d.doc_id
        |GROUP BY 1, 2""".stripMargin)),

    // 64-bit twin of d04's 32-bit signature SQL: bits 32..63 from the
    // salted second hash; bit 63's power-of-two spelled as INT64 min
    // (DuckDB refuses both `1 << 63` and the raw negative literal);
    // 4 × 16-bit block keys (the radius+1 minimum — see simhashPairsAt)
    // via (sig >> 16k) & 65535, which is sign-safe where the 32-bit
    // form's `// 2^8k % 256` would diverge on negative signatures
    // (integer division truncates toward zero, the shift toward -inf).
    QuerySpec("d12_simhash_pairs", dedupSimhashPairs, Some(docCtes +
      """, tokc AS (
        |  SELECT doc_id, tok, count(*) AS c,
        |         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h0,
        |         ('0x' || substr(md5('w1#' || tok), 1, 8))::BIGINT AS h1
        |  FROM tokrows GROUP BY doc_id, tok),
        |bitsum AS (
        |  SELECT doc_id, bit,
        |         CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
        |              ELSE (1::BIGINT << CAST(bit AS INT)) END AS p2,
        |         SUM(c * (2 * (((CASE WHEN bit < 32 THEN h0 ELSE h1 END)
        |                        // (1::BIGINT << CAST(bit % 32 AS INT))) % 2) - 1)) AS sgn
        |  FROM tokc, UNNEST(range(0, 64)) u(bit) GROUP BY 1, 2, 3),
        |sigs AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN sgn > 0 THEN p2 ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bitsum GROUP BY 1),
        |banded AS (
        |  SELECT b.band,
        |         ((s.simhash >> CAST(16 * b.band AS INT)) & 65535) AS bkey,
        |         s.doc_id, s.simhash
        |  FROM sigs s, UNNEST(range(0, 4)) b(band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.simhash AS sig_a, b.simhash AS sig_b
        |  FROM banded a JOIN banded b
        |    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |       CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3""".stripMargin)),

    // d13's oracle = s05's cell-blocked pair chain feeding an ITERATIVE
    // min-label connected-components unroll and d07's resolution tail —
    // the same composition the Spark side makes out of shared code
    // paths. A WITH RECURSIVE closure (rounds 5-9) computed the full
    // (node, reachable-label) relation with UNION dedup — quadratic in
    // component size, >120 s at sf0.1, which forced the sweep to skip
    // this query. The unroll below is the Spark fixpoint's own shape:
    // each round keeps ONE label per node (min over self, neighbors,
    // and the label's label — pointer jumping, so coverage grows
    // super-linearly; measured convergence is 9 rounds at BOTH sf0.01
    // and sf0.1 under the flat quantizer; the IMI cell structure has a
    // longer-diameter component at sf0.001, measured 14 — unrolled to
    // 16 for margin at ~zero marginal cost),
    // linear work per round. Depth is guarded, not assumed: a 13th
    // round feeds a sentinel row (doc_id -1, lang 'NONCONVERGED')
    // emitted only if any label still moves — the compare then fails
    // loudly instead of silently passing stale labels. The whole pair
    // chain is marked MATERIALIZED (here only — the shared embCtes stay
    // untouched for the other oracles): spairs feeds e's two-direction
    // union and scand reads assigned twice, so default inlining re-runs
    // the full embedding chain multiplicatively (measured 192 s at
    // sf0.1 vs 33 s materialized).
    QuerySpec("d13_semantic_canonical", semanticCanonical,
      Some(Seq("ev", "sq").foldLeft(embCtes)((s, c) =>
        s.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " + imiAssign4Ctes +
      """scand AS MATERIALIZED (
        |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
        |  FROM assigned x
        |  JOIN assigned y ON y.cell = x.cell AND x.vec_id < y.vec_id),
        |sdots AS MATERIALIZED (
        |  SELECT c.vec_a, c.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM scand c
        |  JOIN ev a ON a.vec_id = c.vec_a
        |  JOIN ev b ON b.vec_id = c.vec_b AND b.i = a.i
        |  GROUP BY 1, 2),
        |spairs AS MATERIALIZED (
        |  SELECT vec_a AS doc_a, vec_b AS doc_b FROM (
        |    SELECT p.vec_a, p.vec_b,
        |           CAST(floor(p.dot / (sqrt(sx.s2) * sqrt(sy.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |    FROM sdots p
        |    JOIN sq sx ON sx.vec_id = p.vec_a
        |    JOIN sq sy ON sy.vec_id = p.vec_b) t
        |  WHERE cos_ppm >= 350000),
        |e AS MATERIALIZED (SELECT doc_a, doc_b FROM spairs
        |      UNION ALL SELECT doc_b, doc_a FROM spairs),
        |l0 AS MATERIALIZED (SELECT DISTINCT doc_a AS doc_id, doc_a AS lab FROM e),
        |""".stripMargin + (1 to 17).map(ccRoundSql).mkString +
      """labels AS (SELECT doc_id, lab AS cluster_id FROM l16)
        |SELECT d.doc_id, d.lang,
        |  COALESCE(l.cluster_id, d.doc_id) AS canonical_id,
        |  CASE WHEN COALESCE(l.cluster_id, d.doc_id) = d.doc_id
        |       THEN 1 ELSE 0 END AS is_kept
        |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS doc_id, 'NONCONVERGED' AS lang,
        |       CAST(-1 AS BIGINT) AS canonical_id, 0 AS is_kept
        |FROM (SELECT 1 AS x) one
        |WHERE EXISTS (SELECT 1 FROM l16 a JOIN l17 b
        |              ON b.doc_id = a.doc_id AND b.lab <> a.lab)""".stripMargin)),

    QuerySpec("t16_decontaminated_corpus", corpusDecontaminated,
      Some(ccCtes +
      """, kept AS (
        |  SELECT d.doc_id FROM documents d
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |  WHERE COALESCE(l.cluster_id, d.doc_id) = d.doc_id),
        |quality AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, string_split(text, ' ') AS t FROM documents) q
        |  WHERE len(t) >= 20
        |    AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000),
        |gd AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
        |         string_split(text, ' ') AS t
        |  FROM documents),
        |grams16 AS (
        |  SELECT DISTINCT doc_id, bucket,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |         t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS gram
        |  FROM gd, UNNEST(range(1, greatest(len(t) - 6, 1))) u(i)),
        |testg AS (SELECT DISTINCT gram FROM grams16 WHERE bucket >= 90),
        |badtrain AS (
        |  SELECT DISTINCT g.doc_id
        |  FROM grams16 g JOIN testg tg ON tg.gram = g.gram
        |  WHERE g.bucket < 80)
        |SELECT d.lang,
        |  CASE WHEN ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100 < 90 THEN 'valid'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents d
        |JOIN kept k ON k.doc_id = d.doc_id
        |JOIN quality q ON q.doc_id = d.doc_id
        |LEFT JOIN badtrain b ON b.doc_id = d.doc_id
        |WHERE b.doc_id IS NULL
        |GROUP BY 1, 2""".stripMargin)),

    QuerySpec("t20_bigram_lm_score", bigramLmScore, Some(
      """WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |tokrows AS (SELECT doc_id, lang, pos, t[pos] AS tok
        |            FROM toks, UNNEST(range(1, len(t) + 1)) u(pos)),
        |big AS (
        |  SELECT a.doc_id, a.lang, a.tok AS ta, b.tok AS tb
        |  FROM tokrows a JOIN tokrows b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |cab AS (SELECT lang, ta, tb, count(*) AS c FROM big GROUP BY 1, 2, 3),
        |ca AS (SELECT lang, tok AS ta, count(*) AS c1 FROM tokrows GROUP BY 1, 2),
        |model AS (
        |  SELECT cab.lang, cab.ta, cab.tb, (cab.c * 1000000) // ca.c1 AS p_ppm
        |  FROM cab JOIN ca ON ca.lang = cab.lang AND ca.ta = cab.ta)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  CAST(SUM(m.p_ppm) // count(*) AS BIGINT) AS lm_score_ppm
        |FROM big b JOIN model m
        |  ON m.lang = b.lang AND m.ta = b.ta AND m.tb = b.tb
        |GROUP BY 1""".stripMargin)),

    QuerySpec("t21_ngram_novelty", ngramNovelty, Some(docCtes + ", " +
      """fs AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
        |per AS (
        |  SELECT s.doc_id, count(*) AS n_grams,
        |         count(CASE WHEN f.first_doc = s.doc_id THEN 1 END) AS n_novel
        |  FROM sh s JOIN fs f ON f.shingle = s.shingle
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(p.n_grams, 0) AS n_grams,
        |  COALESCE(p.n_novel, 0) AS n_novel,
        |  CASE WHEN p.n_grams > 0
        |       THEN (p.n_novel * 1000000) // p.n_grams END AS novelty_ppm
        |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id""".stripMargin)),

    QuerySpec("t22_novelty_incremental", noveltyIncremental, Some(docCtes + ", " +
      """cut AS (SELECT max(doc_id) * 9 AS c9 FROM documents),
        |basef AS (
        |  SELECT shingle, min(doc_id) AS base_first
        |  FROM sh, cut WHERE doc_id * 10 <= c9 GROUP BY 1),
        |delta AS (
        |  SELECT s.doc_id, s.shingle FROM sh s, cut WHERE s.doc_id * 10 > c9),
        |deltaf AS (SELECT shingle, min(doc_id) AS delta_first
        |           FROM delta GROUP BY 1),
        |per AS (
        |  SELECT d.doc_id, count(*) AS n_grams,
        |         count(CASE WHEN b.base_first IS NULL
        |                     AND f.delta_first = d.doc_id THEN 1 END) AS n_novel
        |  FROM delta d
        |  LEFT JOIN basef b ON b.shingle = d.shingle
        |  JOIN deltaf f ON f.shingle = d.shingle
        |  GROUP BY 1)
        |SELECT dd.doc_id,
        |  COALESCE(p.n_grams, 0) AS n_grams,
        |  COALESCE(p.n_novel, 0) AS n_novel,
        |  CASE WHEN p.n_grams > 0
        |       THEN (p.n_novel * 1000000) // p.n_grams END AS novelty_ppm
        |FROM documents dd CROSS JOIN cut
        |LEFT JOIN per p ON p.doc_id = dd.doc_id
        |WHERE dd.doc_id * 10 > cut.c9""".stripMargin)),

    QuerySpec("t23_source_stats", sourceStats, Some(docCtes + ", " +
      """fs AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
        |per AS (
        |  SELECT s.doc_id, count(*) AS n_grams,
        |         count(CASE WHEN f.first_doc = s.doc_id THEN 1 END) AS n_novel
        |  FROM sh s JOIN fs f ON f.shingle = s.shingle
        |  GROUP BY 1),
        |nov AS (
        |  SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
        |         COALESCE(p.n_novel, 0) AS n_novel
        |  FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS total_tokens,
        |  count(DISTINCT d.lang) AS n_langs,
        |  CAST(SUM(n.n_grams) AS BIGINT) AS n_grams,
        |  CAST(SUM(n.n_novel) AS BIGINT) AS n_novel,
        |  CASE WHEN SUM(n.n_grams) > 0
        |       THEN CAST((SUM(n.n_novel) * 1000000) // SUM(n.n_grams) AS BIGINT)
        |  END AS novelty_ppm
        |FROM documents d JOIN nov n ON n.doc_id = d.doc_id
        |GROUP BY 1""".stripMargin)),

    QuerySpec("t17_boilerplate_scrub", boilerplateScrub, Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |segs AS (
        |  SELECT t.doc_id,
        |         array_to_string(tk[(u.i * 10 + 1):(u.i * 10 + 10)], ' ') AS seg
        |  FROM t, UNNEST(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) u(i)),
        |f AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY 1)
        |SELECT s.doc_id,
        |  count(*) AS n_segments,
        |  CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(SUM(CASE WHEN f.df < 2 THEN len(string_split(s.seg, ' ')) ELSE 0 END) AS BIGINT) AS n_toks_kept
        |FROM segs s JOIN f ON f.seg = s.seg
        |GROUP BY 1""".stripMargin)),

    QuerySpec("t19_scrubbed_corpus", scrubbedCorpus, Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |segs AS (
        |  SELECT t.doc_id, u.i,
        |         array_to_string(tk[(u.i * 10 + 1):(u.i * 10 + 10)], ' ') AS seg
        |  FROM t, UNNEST(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) u(i)),
        |f AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY 1),
        |k AS (
        |  SELECT s.doc_id, string_agg(s.seg, ' ' ORDER BY s.i) AS clean_text
        |  FROM segs s JOIN f ON f.seg = s.seg
        |  WHERE f.df < 2
        |  GROUP BY 1)
        |SELECT d.doc_id, COALESCE(k.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN k ON k.doc_id = d.doc_id""".stripMargin)),

    QuerySpec("t18_token_budget_mix", tokenBudgetMix, Some(
      """WITH d AS (
        |  SELECT lang, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (SELECT lang, CAST(SUM(n_toks) AS BIGINT) AS lang_toks
        |      FROM d GROUP BY 1),
        |b AS (SELECT CAST(SUM(lang_toks) AS BIGINT) // count(*) AS budget_toks
        |      FROM c),
        |r AS (SELECT c.lang, c.lang_toks, b.budget_toks,
        |        CAST(least(1000000, (b.budget_toks * 1000000) // c.lang_toks) AS BIGINT) AS rate_ppm
        |      FROM c, b)
        |SELECT r.lang, r.lang_toks, r.budget_toks, r.rate_ppm,
        |  count(CASE WHEN d.h % 1000000 < r.rate_ppm THEN 1 END) AS n_docs_kept,
        |  CAST(COALESCE(SUM(CASE WHEN d.h % 1000000 < r.rate_ppm THEN d.n_toks END), 0) AS BIGINT) AS n_toks_kept
        |FROM d JOIN r ON r.lang = d.lang
        |GROUP BY 1, 2, 3, 4""".stripMargin)),

    QuerySpec("t11_temperature_sample", temperatureSample, Some(
      """WITH d AS (
        |  SELECT lang, ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |  FROM documents),
        |c AS (SELECT lang, count(*) AS n_docs FROM d GROUP BY 1),
        |m AS (SELECT min(n_docs) AS n_min FROM c),
        |p AS (SELECT c.lang, c.n_docs,
        |        CAST(floor(sqrt(m.n_min / c.n_docs) * 1000000 + 0.5) AS BIGINT) AS p_ppm
        |      FROM c, m)
        |SELECT p.lang, p.n_docs, p.p_ppm,
        |  count(CASE WHEN d.h % 1000000 < p.p_ppm THEN 1 END) AS n_kept
        |FROM d JOIN p ON p.lang = d.lang
        |GROUP BY 1, 2, 3""".stripMargin)),

    QuerySpec("s03_ann_ivf", annIvf, Some(embCtes + ", " + imiAssignProbeCtes(12) +
      """cand AS (
        |  SELECT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON a.cell = p.cell
        |  WHERE a.neighbor_id <> p.query_id),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s11_ann_filtered", annIvfFiltered,
      Some(filteredIvfOracle)),

    QuerySpec("s12_ann_filtered_indexed", annIvfFilteredIndexed,
      Some(filteredIvfOracle)),

    QuerySpec("t06_stratified_split", stratifiedSplit, Some(
      """SELECT lang,
        |  CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 90 THEN 'valid'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin)),

    QuerySpec("t07_length_histogram", lengthHistogram, Some(
      """SELECT (CAST(len(string_split(text, ' ')) AS BIGINT) // 10) * 10 AS bucket_lo,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin)),

    QuerySpec("s04_lang_centroids", langCentroids, Some(embCtes +
      """SELECT d.lang, e.i AS dim, count(*) AS n_vecs,
        |  CAST(SUM(e.v) AS BIGINT) // count(*) AS centroid_ppm
        |FROM ev e JOIN documents d ON d.doc_id = e.vec_id
        |GROUP BY 1, 2""".stripMargin)),

    QuerySpec("s10_centroid_outliers", centroidOutliers, Some(embCtes +
      """, el AS (
        |  SELECT e.vec_id, e.i, e.v, d.lang
        |  FROM ev e JOIN documents d ON d.doc_id = e.vec_id),
        |cs AS (SELECT lang, i, CAST(SUM(v) AS BIGINT) AS sv
        |       FROM el GROUP BY 1, 2),
        |cs2 AS (SELECT lang, CAST(SUM(sv * sv) AS BIGINT) AS cs2
        |        FROM cs GROUP BY 1),
        |dots AS (
        |  SELECT el.vec_id, el.lang, CAST(SUM(el.v * c.sv) AS BIGINT) AS dot
        |  FROM el JOIN cs c ON c.lang = el.lang AND c.i = el.i
        |  GROUP BY 1, 2)
        |SELECT vec_id, lang, cos_ppm,
        |  CASE WHEN cos_ppm < 0 THEN 1 ELSE 0 END AS is_outlier
        |FROM (
        |  SELECT d.vec_id, d.lang,
        |         CAST(floor(d.dot / (sqrt(s.s2) * sqrt(c.cs2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM dots d
        |  JOIN sq s ON s.vec_id = d.vec_id
        |  JOIN cs2 c ON c.lang = d.lang) t""".stripMargin)),

    QuerySpec("t08_vocab_topk", vocabTopK, Some(docCtes +
      """SELECT lang, rnk, tok, c FROM (
        |  SELECT lang, tok, count(*) AS c,
        |    CAST(row_number() OVER (PARTITION BY lang
        |          ORDER BY count(*) DESC, tok ASC) AS INTEGER) AS rnk
        |  FROM tokrows GROUP BY lang, tok) t
        |WHERE rnk <= 20""".stripMargin)),

    QuerySpec("t09_pack_bins", packBins, Some(
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY lang
        |             ORDER BY n_tokens DESC, doc_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS BIGINT), 0) // 2048 AS bin_id
        |FROM d""".stripMargin)),

    QuerySpec("t05_text_normalize", textNormalize, Some(
      """SELECT doc_id, norm_text,
        |  ('0x' || substr(md5(norm_text), 1, 8))::BIGINT AS norm_hash,
        |  CAST(length(norm_text) AS INTEGER) AS n_chars_norm
        |FROM (SELECT doc_id,
        |        lower(trim(regexp_replace(
        |          regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), ' +', ' ', 'g')))
        |          AS norm_text
        |      FROM documents) t""".stripMargin)),

    QuerySpec("m02_frame_sample", frameSample, Some(
      """SELECT doc_id, u.frame_id, u.frame_id * 1000 AS frame_offset,
        |  ('0x' || substr(md5(doc_id || ':' || u.frame_id), 1, 8))::BIGINT AS frame_sig
        |FROM (SELECT doc_id, octet_length(encode(text)) // 1000 + 1 AS n_frames
        |      FROM documents) m,
        |  UNNEST(range(0, m.n_frames, 3)) u(frame_id)""".stripMargin)),

    QuerySpec("s05_semdedup_cells", semdedupCells, Some(semdedupOracleSql)),

    // s09 is s05 with the assignment READ from the stored index instead
    // of recomputed — semantically identical by contract, so it is
    // checked against the IDENTICAL oracle SQL (and SemDedupIndexSpec
    // pins the two Spark plans row-for-row equal).
    QuerySpec("s09_semdedup_indexed", semdedupIndexed, Some(semdedupOracleSql)),

    QuerySpec("s06_ann_truncated", annTruncated, Some(embCtes +
      """, psq AS (
        |  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS sp
        |  FROM ev WHERE i <= 32 GROUP BY 1),
        |pdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS pdot
        |  FROM ev a JOIN ev b ON a.i = b.i AND a.i <= 32
        |   AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |pscored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.pdot / (sqrt(x.sp) * sqrt(y.sp)) * 1000000 + 0.5) AS BIGINT) AS pcos
        |  FROM pdots d
        |  JOIN psq x ON x.vec_id = d.query_id
        |  JOIN psq y ON y.vec_id = d.neighbor_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY pcos DESC, neighbor_id) AS prn
        |    FROM pscored) t WHERE prn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s13_ann_sq8", annSq8, Some(embCtes +
      """, dim AS (SELECT i, min(v) AS mn, max(v) - min(v) AS r
        |         FROM ev GROUP BY 1),
        |code AS (
        |  SELECT e.vec_id, e.i,
        |    CASE WHEN d.r = 0 THEN 255 * d.mn
        |         ELSE 255 * d.mn + (((e.v - d.mn) * 510 + d.r) // (2 * d.r)) * d.r
        |    END AS vh
        |  FROM ev e JOIN dim d ON d.i = e.i),
        |csq AS (SELECT vec_id, CAST(SUM(vh * vh) AS BIGINT) AS ss
        |        FROM code GROUP BY 1),
        |adots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.vh * b.vh) AS BIGINT) AS adot
        |  FROM code a JOIN code b ON a.i = b.i
        |   AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |ascored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.adot / (sqrt(x.ss) * sqrt(y.ss)) * 1000000 + 0.5) AS BIGINT) AS acos
        |  FROM adots d
        |  JOIN csq x ON x.vec_id = d.query_id
        |  JOIN csq y ON y.vec_id = d.neighbor_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY acos DESC, neighbor_id) AS arn
        |    FROM ascored) t WHERE arn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s07_ann_ivf_prefix", annIvfPrefix, Some(ivfPrefixOracle)),

    // s08 answers the SAME query as s07 from the materialized index —
    // one oracle text, two engine-side strategies that must agree
    // row-for-row (AnnIndexSpec pins the frames identical too).
    QuerySpec("s08_ann_ivf_indexed", annIvfIndexed, Some(ivfPrefixOracle)),

    QuerySpec("d09_contamination", contamination, Some(
      """WITH d AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 AS bucket,
        |         string_split(text, ' ') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, bucket,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |         t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS gram
        |  FROM d, UNNEST(range(1, greatest(len(t) - 6, 1))) u(i)),
        |train AS (SELECT DISTINCT gram FROM grams WHERE bucket < 80)
        |SELECT g.doc_id, count(*) AS n_shared_8grams
        |FROM grams g JOIN train tr ON tr.gram = g.gram
        |WHERE g.bucket >= 90
        |GROUP BY 1""".stripMargin)),

    QuerySpec("d10_dedup_incremental", dedupIncremental, Some(docCtes +
      sigCtes +
      """, mx AS (SELECT max(doc_id) * 9 AS c9 FROM documents),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS other_doc
        |  FROM sig a, sig b, mx
        |  WHERE a.doc_id * 10 > mx.c9
        |    AND a.doc_id <> b.doc_id
        |    AND (b.doc_id * 10 <= mx.c9 OR a.doc_id < b.doc_id)
        |    AND ((a.m0 = b.m0 AND a.m1 = b.m1 AND a.m2 = b.m2 AND a.m3 = b.m3) OR
        |         (a.m4 = b.m4 AND a.m5 = b.m5 AND a.m6 = b.m6 AND a.m7 = b.m7) OR
        |         (a.m8 = b.m8 AND a.m9 = b.m9 AND a.m10 = b.m10 AND a.m11 = b.m11) OR
        |         (a.m12 = b.m12 AND a.m13 = b.m13 AND a.m14 = b.m14 AND a.m15 = b.m15))),
        |common AS (
        |  SELECT c.new_doc, c.other_doc, count(*) AS c
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.new_doc
        |  JOIN sh b ON b.doc_id = c.other_doc AND b.shingle = a.shingle
        |  GROUP BY 1, 2)
        |SELECT c.new_doc, c.other_doc,
        |       (COALESCE(cm.c, 0) * 1000000) // (x.n_sh + y.n_sh - COALESCE(cm.c, 0)) AS jaccard_ppm
        |FROM cand c
        |LEFT JOIN common cm ON cm.new_doc = c.new_doc AND cm.other_doc = c.other_doc
        |JOIN shc x ON x.doc_id = c.new_doc
        |JOIN shc y ON y.doc_id = c.other_doc""".stripMargin)),

    QuerySpec("d11_substring_dupes", substringDupes, Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(t[i:i+29], ' ') AS gram
        |  FROM t, UNNEST(range(1, greatest(len(t) - 28, 1))) u(i))
        |SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT AS gram_hash,
        |       count(DISTINCT doc_id) AS n_docs,
        |       min(doc_id) AS first_doc,
        |       max(doc_id) AS last_doc
        |FROM g
        |GROUP BY 1
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin)),

    QuerySpec("t15_shard_assign", shardAssign, Some(
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM d)
        |SELECT CAST((rn - 1) % 8 AS BIGINT) AS shard_id,
        |       count(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM r GROUP BY 1""".stripMargin)),

    QuerySpec("t14_repetition_quality", repetitionQuality, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        |       FROM toks, UNNEST(range(1, len(t))) u(i)),
        |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  count(*) AS n_distinct_bigrams,
        |  CAST(((SUM(c) - count(*)) * 1000000) // SUM(c) AS BIGINT) AS dup_bigram_ppm,
        |  CAST((MAX(c) * 1000000) // SUM(c) AS BIGINT) AS top_bigram_ppm,
        |  CASE WHEN ((SUM(c) - count(*)) * 1000000) // SUM(c) < 200000
        |        AND (MAX(c) * 1000000) // SUM(c) < 100000
        |       THEN 1 ELSE 0 END AS repetition_ok
        |FROM bgc GROUP BY 1""".stripMargin)),

    QuerySpec("s14_kmeans_refine", kmeansRefine, Some(embCtes + ", " + centsCte +
      """a0 AS (
        |  SELECT a.vec_id, b.vec_id AS cent_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON b.i = a.i JOIN cents c ON c.vec_id = b.vec_id
        |  GROUP BY 1, 2),
        |s0 AS (
        |  SELECT d.vec_id, d.cent_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM a0 d
        |  JOIN sq x ON x.vec_id = d.vec_id
        |  JOIN sq y ON y.vec_id = d.cent_id),
        |asg1 AS (
        |  SELECT vec_id, cent_id AS cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |                ORDER BY cos_ppm DESC, cent_id ASC) AS rn
        |    FROM s0) t WHERE rn = 1),
        |c1 AS (
        |  SELECT g.cell, e.i, CAST(SUM(e.v) AS BIGINT) AS csum
        |  FROM asg1 g JOIN ev e ON e.vec_id = g.vec_id
        |  GROUP BY 1, 2),
        |c1s AS (
        |  SELECT cell, CAST(SUM(csum * csum) AS BIGINT) AS sc
        |  FROM c1 GROUP BY 1 HAVING SUM(csum * csum) > 0),
        |a1 AS (
        |  SELECT e.vec_id, c.cell, CAST(SUM(e.v * c.csum) AS BIGINT) AS dot
        |  FROM ev e JOIN c1 c ON c.i = e.i
        |  JOIN c1s s ON s.cell = c.cell
        |  GROUP BY 1, 2),
        |s1 AS (
        |  SELECT d.vec_id, d.cell,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(s.sc)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM a1 d
        |  JOIN sq x ON x.vec_id = d.vec_id
        |  JOIN c1s s ON s.cell = d.cell),
        |asg2 AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |                ORDER BY cos_ppm DESC, cell ASC) AS rn
        |    FROM s1) t WHERE rn = 1)
        |SELECT g.cell AS cent_id, CAST(e.i AS INTEGER) AS i,
        |       CAST(SUM(e.v) AS BIGINT) AS csum, count(*) AS n_members
        |FROM asg2 g
        |JOIN ev e ON e.vec_id = g.vec_id
        |GROUP BY 1, 2""".stripMargin)),

    QuerySpec("s15_ann_ivf_sq8", annIvfSq8, Some(ivfSq8Oracle)),

    // s17 = s15 served off the stored index: one oracle text, two
    // engine paths — the s07/s08 sharing pattern. The DuckDB twin
    // cannot tell recompute from storage; AnnIndexSpec pins the two
    // Spark paths row-identical, PlanSpec pins s17's pruned-read shape.
    QuerySpec("s17_ann_ivf_sq8_indexed", annIvfSq8Indexed,
      Some(ivfSq8Oracle)),


    QuerySpec("s16_hybrid_rrf", hybridRrf, Some(embCtes +
      """, vdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON b.i = a.i
        |   AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |vrank AS (
        |  SELECT query_id, neighbor_id, rank_v FROM (
        |    SELECT d.query_id, d.neighbor_id,
        |           row_number() OVER (PARTITION BY d.query_id ORDER BY
        |             CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) DESC,
        |             d.neighbor_id) AS rank_v
        |    FROM vdots d
        |    JOIN sq x ON x.vec_id = d.query_id
        |    JOIN sq y ON y.vec_id = d.neighbor_id) t
        |  WHERE rank_v <= 20),
        |tf AS (
        |  SELECT doc_id, t[i] AS tok, count(*) AS tf
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x,
        |       UNNEST(range(1, len(t) + 1)) u(i)
        |  GROUP BY 1, 2),
        |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT count(*) AS n_docs FROM documents),
        |lex AS (
        |  SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id,
        |         CAST(SUM(d.tf * ((nn.n_docs * 1000000) // dfx.df)) AS BIGINT) AS lex_score
        |  FROM tf q
        |  JOIN tf d ON d.tok = q.tok AND d.doc_id <> q.doc_id
        |  JOIN dfx ON dfx.tok = q.tok
        |  CROSS JOIN nn
        |  WHERE q.doc_id < 10
        |  GROUP BY 1, 2),
        |lrank AS (
        |  SELECT query_id, neighbor_id, rank_l FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY lex_score DESC, neighbor_id) AS rank_l
        |    FROM lex) t
        |  WHERE rank_l <= 20),
        |fused AS (
        |  SELECT COALESCE(v.query_id, l.query_id) AS query_id,
        |         COALESCE(v.neighbor_id, l.neighbor_id) AS neighbor_id,
        |         COALESCE(1000000 // (60 + v.rank_v), 0) +
        |         COALESCE(1000000 // (60 + l.rank_l), 0) AS rrf_ppm
        |  FROM vrank v
        |  FULL JOIN lrank l
        |    ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id)
        |SELECT query_id, neighbor_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm, rank
        |FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY rrf_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM fused) t
        |WHERE rank <= 10""".stripMargin)),

    QuerySpec("t24_cluster_sample", clusterSample, Some(embCtes + ", " +
      imiCtes + imiCellsCte("acells", 1) +
      """asg1 AS (SELECT vec_id, cell FROM acells WHERE rn = 1)
        |SELECT cell, vec_id, smp_rank FROM (
        |  SELECT cell, vec_id,
        |         CAST(row_number() OVER (PARTITION BY cell
        |              ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
        |                       vec_id) AS INTEGER) AS smp_rank
        |  FROM asg1) t
        |WHERE smp_rank <= 8""".stripMargin)),

    QuerySpec("t25_chunk_docs", chunkDocs, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        |       CAST(LEAST(64, len(t) - k * 48) AS BIGINT) AS n_tokens,
        |       md5(array_to_string(t[k * 48 + 1:k * 48 + 64], ' ')) AS chunk_hash
        |FROM toks, UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k)""".stripMargin)),

    // s22's oracle: the exact top-20 pool + its internal similarity
    // frame, then the 5 greedy MMR rounds unrolled (mmrRoundSql — the
    // d13 pattern), everything MATERIALIZED.
    QuerySpec("s22_mmr_diversified", mmrDiversified, Some(
      Seq("ev", "sq").foldLeft(embCtes)((acc, c) =>
        acc.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " +
      """vdots AS MATERIALIZED (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM ev a JOIN ev b ON b.i = a.i
        |   AND a.vec_id < 10 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2),
        |pool AS MATERIALIZED (
        |  SELECT query_id, neighbor_id AS cand, cos_ppm AS rel FROM (
        |    SELECT d.query_id, d.neighbor_id,
        |           CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm,
        |           row_number() OVER (PARTITION BY d.query_id ORDER BY
        |             CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) DESC,
        |             d.neighbor_id) AS rnk
        |    FROM vdots d
        |    JOIN sq x ON x.vec_id = d.query_id
        |    JOIN sq y ON y.vec_id = d.neighbor_id) t
        |  WHERE rnk <= 20),
        |pdots AS MATERIALIZED (
        |  SELECT pa.query_id, pa.cand AS a, pb.cand AS b,
        |         CAST(SUM(ea.v * eb.v) AS BIGINT) AS dot
        |  FROM pool pa
        |  JOIN pool pb ON pb.query_id = pa.query_id AND pb.cand <> pa.cand
        |  JOIN ev ea ON ea.vec_id = pa.cand
        |  JOIN ev eb ON eb.vec_id = pb.cand AND eb.i = ea.i
        |  GROUP BY 1, 2, 3),
        |ps AS MATERIALIZED (
        |  SELECT d.query_id, d.a, d.b,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS sim
        |  FROM pdots d
        |  JOIN sq x ON x.vec_id = d.a
        |  JOIN sq y ON y.vec_id = d.b),
        |sel1 AS MATERIALIZED (
        |  SELECT query_id, cand, rel, 1 AS mmr_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY rel DESC, cand) AS rn
        |    FROM pool) t WHERE rn = 1),
        |selall1 AS MATERIALIZED (SELECT * FROM sel1),
        |""".stripMargin + (2 to 5).map(mmrRoundSql).mkString +
      """final_sel AS (SELECT * FROM selall5)
        |SELECT query_id, cand AS neighbor_id, rel AS cos_ppm,
        |       CAST(mmr_rank AS INTEGER) AS mmr_rank
        |FROM final_sel""".stripMargin)),

    QuerySpec("t26_hard_negatives", hardNegatives,
      Some(hardNegativesOracleSql)),

    // t27 is t26 with the assignment READ from the stored index instead
    // of recomputed — semantically identical by contract, so it is
    // checked against the IDENTICAL oracle SQL (and QueriesSpec pins
    // the two Spark plans row-for-row equal), the s05/s09 pattern.
    QuerySpec("t27_hard_negatives_indexed", hardNegativesIndexed,
      Some(hardNegativesOracleSql)),

    QuerySpec("d15_chunk_dupes", chunkDupes, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |         md5(array_to_string(t[k * 48 + 1:k * 48 + 64], ' ')) AS chunk_hash
        |  FROM toks, UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k))
        |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
        |       count(*) AS n_chunks, min(doc_id) AS first_doc
        |FROM ch GROUP BY 1
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin)),

    // s20's oracle recomputes the full PQ chain in SQL: hash-sampled
    // codebooks, exact-L2 assignment per (vector, subspace), ADC dots
    // of the raw query against reconstructions, exact rerank. Every
    // multi-referenced CTE MATERIALIZED (the d13 inlining lesson).
    QuerySpec("s20_ann_pq", annPq, Some(
      Seq("ev", "sq").foldLeft(embCtes)((acc, c) =>
        acc.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " +
      """strideq AS MATERIALIZED (
        |  SELECT GREATEST(1, count(*) // 256) AS st FROM embeddings),
        |csel AS MATERIALIZED (
        |  SELECT vec_id AS cent_id FROM embeddings
        |  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
        |        % (SELECT st FROM strideq) = 0),
        |cev AS MATERIALIZED (
        |  SELECT c.cent_id, (e.i - 1) // 16 AS sub, e.i, e.v
        |  FROM ev e JOIN csel c ON c.cent_id = e.vec_id),
        |vs AS MATERIALIZED (
        |  SELECT vec_id, (i - 1) // 16 AS sub, CAST(SUM(v * v) AS BIGINT) AS ss
        |  FROM ev GROUP BY 1, 2),
        |cs AS MATERIALIZED (
        |  SELECT cent_id, sub, CAST(SUM(v * v) AS BIGINT) AS scs
        |  FROM cev GROUP BY 1, 2),
        |ad AS MATERIALIZED (
        |  SELECT e.vec_id, c.sub, c.cent_id, CAST(SUM(e.v * c.v) AS BIGINT) AS dot
        |  FROM ev e JOIN cev c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |code AS MATERIALIZED (
        |  SELECT vec_id, sub, cent_id FROM (
        |    SELECT a.vec_id, a.sub, a.cent_id,
        |           row_number() OVER (PARTITION BY a.vec_id, a.sub
        |             ORDER BY vs.ss + cs.scs - 2 * a.dot ASC, a.cent_id ASC) AS rn
        |    FROM ad a
        |    JOIN vs ON vs.vec_id = a.vec_id AND vs.sub = a.sub
        |    JOIN cs ON cs.cent_id = a.cent_id AND cs.sub = a.sub) t
        |  WHERE rn = 1),
        |rnorm AS MATERIALIZED (
        |  SELECT k.vec_id, CAST(SUM(cs.scs) AS BIGINT) AS ssr
        |  FROM code k JOIN cs ON cs.cent_id = k.cent_id AND cs.sub = k.sub
        |  GROUP BY 1),
        |adc AS MATERIALIZED (
        |  SELECT q.vec_id AS query_id, k.vec_id AS neighbor_id,
        |         CAST(SUM(q.v * c.v) AS BIGINT) AS adot
        |  FROM code k
        |  JOIN cev c ON c.cent_id = k.cent_id AND c.sub = k.sub
        |  JOIN ev q ON q.i = c.i AND q.vec_id < 10 AND q.vec_id <> k.vec_id
        |  GROUP BY 1, 2),
        |qsc AS (
        |  SELECT a.query_id, a.neighbor_id,
        |         CAST(floor(a.adot / (sqrt(sq.s2) * sqrt(r.ssr)) * 1000000 + 0.5) AS BIGINT) AS acos
        |  FROM adc a
        |  JOIN sq ON sq.vec_id = a.query_id
        |  JOIN rnorm r ON r.vec_id = a.neighbor_id),
        |cand AS MATERIALIZED (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY acos DESC, neighbor_id) AS arn
        |    FROM qsc) t WHERE arn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    // s21's oracle = s15's IVF skeleton (probes → cell candidates) ∘
    // s20's PQ chain (codebooks → exact-L2 codes → ADC) restricted to
    // those candidates, with the family's exact-rerank tail. Fully
    // MATERIALIZED (the d13 lesson).
    QuerySpec("s21_ann_ivf_pq_indexed", annIvfPqIndexed, Some(
      Seq("ev", "sq").foldLeft(embCtes)((acc, c) =>
        acc.replace(c + " AS (", c + " AS MATERIALIZED (")) + ", " + imiAssignProbeCtes(12) +
      """ccand AS MATERIALIZED (
        |  SELECT DISTINCT p.query_id, a.neighbor_id
        |  FROM probes p JOIN assigned a ON a.cell = p.cell
        |  WHERE a.neighbor_id <> p.query_id),
        |strideq AS MATERIALIZED (
        |  SELECT GREATEST(1, count(*) // 256) AS st FROM embeddings),
        |csel AS MATERIALIZED (
        |  SELECT vec_id AS cent_id FROM embeddings
        |  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
        |        % (SELECT st FROM strideq) = 0),
        |cev AS MATERIALIZED (
        |  SELECT c.cent_id, (e.i - 1) // 16 AS sub, e.i, e.v
        |  FROM ev e JOIN csel c ON c.cent_id = e.vec_id),
        |vs AS MATERIALIZED (
        |  SELECT vec_id, (i - 1) // 16 AS sub, CAST(SUM(v * v) AS BIGINT) AS ss
        |  FROM ev GROUP BY 1, 2),
        |cs AS MATERIALIZED (
        |  SELECT cent_id, sub, CAST(SUM(v * v) AS BIGINT) AS scs
        |  FROM cev GROUP BY 1, 2),
        |ad AS MATERIALIZED (
        |  SELECT e.vec_id, c.sub, c.cent_id, CAST(SUM(e.v * c.v) AS BIGINT) AS dot
        |  FROM ev e JOIN cev c ON c.i = e.i
        |  GROUP BY 1, 2, 3),
        |code AS MATERIALIZED (
        |  SELECT vec_id, sub, cent_id FROM (
        |    SELECT a.vec_id, a.sub, a.cent_id,
        |           row_number() OVER (PARTITION BY a.vec_id, a.sub
        |             ORDER BY vs.ss + cs.scs - 2 * a.dot ASC, a.cent_id ASC) AS rn
        |    FROM ad a
        |    JOIN vs ON vs.vec_id = a.vec_id AND vs.sub = a.sub
        |    JOIN cs ON cs.cent_id = a.cent_id AND cs.sub = a.sub) t
        |  WHERE rn = 1),
        |rnorm AS MATERIALIZED (
        |  SELECT k.vec_id, CAST(SUM(cs.scs) AS BIGINT) AS ssr
        |  FROM code k JOIN cs ON cs.cent_id = k.cent_id AND cs.sub = k.sub
        |  GROUP BY 1),
        |adc AS MATERIALIZED (
        |  SELECT cc.query_id, cc.neighbor_id,
        |         CAST(SUM(q.v * cb.v) AS BIGINT) AS adot
        |  FROM ccand cc
        |  JOIN code k ON k.vec_id = cc.neighbor_id
        |  JOIN cev cb ON cb.cent_id = k.cent_id AND cb.sub = k.sub
        |  JOIN ev q ON q.i = cb.i AND q.vec_id = cc.query_id
        |  GROUP BY 1, 2),
        |qsc AS (
        |  SELECT a.query_id, a.neighbor_id,
        |         CAST(floor(a.adot / (sqrt(sq.s2) * sqrt(r.ssr)) * 1000000 + 0.5) AS BIGINT) AS acos
        |  FROM adc a
        |  JOIN sq ON sq.vec_id = a.query_id
        |  JOIN rnorm r ON r.vec_id = a.neighbor_id),
        |cand AS MATERIALIZED (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY acos DESC, neighbor_id) AS arn
        |    FROM qsc) t WHERE arn <= 100),
        |cdots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN ev a ON a.vec_id = c.query_id
        |  JOIN ev b ON b.vec_id = c.neighbor_id AND b.i = a.i
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN sq x ON x.vec_id = d.query_id
        |  JOIN sq y ON y.vec_id = d.neighbor_id)
        |SELECT query_id, neighbor_id, cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin)),

    QuerySpec("s19_bm25_topk", bm25TopK, Some(
      """WITH tf AS MATERIALIZED (
        |  SELECT doc_id, t[i] AS tok, count(*) AS tf
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x,
        |       UNNEST(range(1, len(t) + 1)) u(i)
        |  GROUP BY 1, 2),
        |dlen AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dlen
        |         FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(dlen) AS BIGINT) AS total_toks,
        |               count(*) AS n_docs FROM dlen),
        |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |terms AS (
        |  SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id,
        |         (tot.n_docs * 1000000) // dfx.df AS idf_ppm,
        |         (d.tf * 2200000 * 1000000) //
        |           (d.tf * 1000000 +
        |            (1200000 * (250000 +
        |              (750000 * ((dl.dlen * tot.n_docs * 1000000)
        |                         // tot.total_toks)) // 1000000))
        |             // 1000000) AS sat_ppm
        |  FROM tf q
        |  JOIN tf d ON d.tok = q.tok AND d.doc_id <> q.doc_id
        |  JOIN dfx ON dfx.tok = q.tok
        |  JOIN dlen dl ON dl.doc_id = d.doc_id
        |  CROSS JOIN tot
        |  WHERE q.doc_id < 10),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(SUM(((idf_ppm // 1000) * sat_ppm) // 1000) AS BIGINT)
        |           AS bm25_ppm
        |  FROM terms GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, bm25_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY bm25_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 10""".stripMargin)),

    // s18's oracle recomputes the whole chunk→vector→MaxSim chain in
    // SQL: t25's tiling, the h32-derived chunk dims, integer chunk
    // dots, and the max-chunk doc rollup. MATERIALIZED on the per-dim
    // frame — it feeds both the norm agg and both sides of the pair
    // join (the d13 inlining lesson).
    QuerySpec("s18_chunk_ann", chunkAnn, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |cht AS (
        |  SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        |         md5(array_to_string(t[k * 48 + 1:k * 48 + 64], ' ')) AS chunk_hash
        |  FROM toks, UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k)),
        |cev AS MATERIALIZED (
        |  SELECT doc_id, doc_id * 4096 + chunk_id AS vec_id, CAST(i AS INTEGER) AS i,
        |         (('0x' || substr(md5(chunk_hash || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
        |          % 2001) - 1000 AS v
        |  FROM cht, UNNEST(range(1, 65)) u(i)),
        |csq AS MATERIALIZED (
        |  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS s2 FROM cev GROUP BY 1),
        |cdots AS (
        |  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
        |         a.vec_id AS va, b.vec_id AS vb,
        |         CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cev a JOIN cev b ON b.i = a.i
        |   AND a.doc_id < 10 AND b.doc_id <> a.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |scored AS (
        |  SELECT d.query_id, d.neighbor_id,
        |         CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |  FROM cdots d
        |  JOIN csq x ON x.vec_id = d.va
        |  JOIN csq y ON y.vec_id = d.vb),
        |rolled AS (
        |  SELECT query_id, neighbor_id, MAX(cos_ppm) AS max_cos_ppm
        |  FROM scored GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, max_cos_ppm, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY max_cos_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM rolled) t
        |WHERE rank <= 5""".stripMargin)),

    // s23's oracle: the full chunk-grain hybrid in SQL — t25's tiling
    // feeding BOTH rankers (the hash-derived chunk vectors for the
    // MaxSim side, the overlapping-window token rows for the BM25
    // side), s19's exact integer BM25 chain at chunk grain, s16's RRF
    // fusion. MATERIALIZED on every frame referenced twice.
    QuerySpec("s23_chunk_hybrid", chunkHybrid, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |cht AS (
        |  SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        |         md5(array_to_string(t[k * 48 + 1:k * 48 + 64], ' ')) AS chunk_hash
        |  FROM toks, UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k)),
        |cev AS MATERIALIZED (
        |  SELECT doc_id, doc_id * 4096 + chunk_id AS vec_id, CAST(i AS INTEGER) AS i,
        |         (('0x' || substr(md5(chunk_hash || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
        |          % 2001) - 1000 AS v
        |  FROM cht, UNNEST(range(1, 65)) u(i)),
        |csq AS MATERIALIZED (
        |  SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS s2 FROM cev GROUP BY 1),
        |cdots AS (
        |  SELECT a.doc_id AS query_id, b.vec_id AS neighbor_id,
        |         a.vec_id AS va, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM cev a JOIN cev b ON b.i = a.i
        |   AND a.doc_id < 10 AND b.doc_id <> a.doc_id
        |  GROUP BY 1, 2, 3),
        |chunkbest AS (
        |  SELECT query_id, neighbor_id, MAX(cos_ppm) AS best_cos_ppm FROM (
        |    SELECT d.query_id, d.neighbor_id,
        |           CAST(floor(d.dot / (sqrt(x.s2) * sqrt(y.s2)) * 1000000 + 0.5) AS BIGINT) AS cos_ppm
        |    FROM cdots d
        |    JOIN csq x ON x.vec_id = d.va
        |    JOIN csq y ON y.vec_id = d.neighbor_id) s
        |  GROUP BY 1, 2),
        |vrank AS (
        |  SELECT query_id, neighbor_id, rank_v FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY best_cos_ppm DESC, neighbor_id) AS rank_v
        |    FROM chunkbest) t
        |  WHERE rank_v <= 20),
        |ctf AS MATERIALIZED (
        |  SELECT doc_id * 4096 + k AS cid, t[k * 48 + j] AS tok, count(*) AS tf
        |  FROM toks,
        |       UNNEST(range(0, GREATEST((len(t) - 17) // 48, 0) + 1)) u(k),
        |       UNNEST(range(1, LEAST(64, len(t) - k * 48) + 1)) w(j)
        |  GROUP BY 1, 2),
        |dlen AS MATERIALIZED (
        |  SELECT cid, CAST(SUM(tf) AS BIGINT) AS dlen FROM ctf GROUP BY 1),
        |tot AS (SELECT CAST(SUM(dlen) AS BIGINT) AS total_toks,
        |               count(*) AS n_docs FROM dlen),
        |dfx AS (SELECT tok, count(*) AS df FROM ctf GROUP BY 1),
        |qt AS (SELECT DISTINCT doc_id AS query_id, t[i] AS tok
        |       FROM toks, UNNEST(range(1, len(t) + 1)) u(i)
        |       WHERE doc_id < 10),
        |terms AS (
        |  SELECT q.query_id, d.cid AS neighbor_id,
        |         (tot.n_docs * 1000000) // dfx.df AS idf_ppm,
        |         (d.tf * 2200000 * 1000000) //
        |           (d.tf * 1000000 +
        |            (1200000 * (250000 +
        |              (750000 * ((dl.dlen * tot.n_docs * 1000000)
        |                         // tot.total_toks)) // 1000000))
        |             // 1000000) AS sat_ppm
        |  FROM qt q
        |  JOIN ctf d ON d.tok = q.tok AND d.cid // 4096 <> q.query_id
        |  JOIN dfx ON dfx.tok = q.tok
        |  JOIN dlen dl ON dl.cid = d.cid
        |  CROSS JOIN tot),
        |lrank AS (
        |  SELECT query_id, neighbor_id, rank_l FROM (
        |    SELECT query_id, neighbor_id,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY bm25_ppm DESC, neighbor_id) AS rank_l
        |    FROM (SELECT query_id, neighbor_id,
        |                 CAST(SUM(((idf_ppm // 1000) * sat_ppm) // 1000) AS BIGINT) AS bm25_ppm
        |          FROM terms GROUP BY 1, 2) s) t
        |  WHERE rank_l <= 20),
        |fused AS (
        |  SELECT COALESCE(v.query_id, l.query_id) AS query_id,
        |         COALESCE(v.neighbor_id, l.neighbor_id) AS neighbor_id,
        |         COALESCE(1000000 // (60 + v.rank_v), 0) +
        |         COALESCE(1000000 // (60 + l.rank_l), 0) AS rrf_ppm
        |  FROM vrank v
        |  FULL JOIN lrank l
        |    ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id)
        |SELECT query_id, neighbor_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm, rank
        |FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY rrf_ppm DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM fused) t
        |WHERE rank <= 10""".stripMargin)),

    QuerySpec("s24_recall_audit", recallAudit, Some(recallAuditOracle)),

    QuerySpec("t28_pack_manifest", packManifest, Some(
      """WITH pd AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |""".stripMargin + packSqlTail)),

    // t29's oracle: the d06 label table (single reference — no
    // MATERIALIZED needed), split bucket hashed over the CANONICAL id.
    QuerySpec("t29_cluster_split", clusterSplit, Some(ccCtes +
      """SELECT d.doc_id,
        |  COALESCE(l.cluster_id, d.doc_id) AS canonical_id,
        |  CASE WHEN ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id""".stripMargin)),

    // t30: all three gates folded into ONE labels reference (kept ⇒
    // canonical = doc_id, so the split hash reads the same coalesce),
    // then t28's packing tail over the gated frame.
    QuerySpec("t30_training_packs", trainingPacks, Some(ccCtes +
      """, quality AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, string_split(text, ' ') AS t FROM documents) q
        |  WHERE len(t) >= 20
        |    AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000),
        |pd AS (
        |  SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents d
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |  JOIN quality q ON q.doc_id = d.doc_id
        |  WHERE COALESCE(l.cluster_id, d.doc_id) = d.doc_id
        |    AND ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 100 < 80),
        |""".stripMargin + packSqlTail)),

    // t31's oracle: pack ids are dense 0..ceil(T/cap)-1 by t28's
    // construction, so the oracle enumerates them from the token total
    // instead of re-running the packing CTE chain.
    QuerySpec("t31_pack_shards", packShards, Some(
      """WITH tot AS (
        |  SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t
        |  FROM documents),
        |p AS (
        |  SELECT CAST(u.p AS BIGINT) AS pack_id
        |  FROM tot, UNNEST(range(0, (t + 127) // 128)) u(p)),
        |e AS (
        |  SELECT pack_id, CAST(u.e AS BIGINT) AS epoch
        |  FROM p, UNNEST(range(0, 2)) u(e))
        |SELECT pack_id, epoch,
        |       ('0x' || substr(md5(CAST(pack_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
        |       ('0x' || substr(md5('e' || epoch || ':' || pack_id), 1, 8))::BIGINT AS ord_key
        |FROM e""".stripMargin)),

    QuerySpec("t32_bpe_vocab", bpeVocab, Some(bpeVocabOracle)),
    QuerySpec("t33_bpe_tokens", bpeTokens, Some(bpeTokensOracle)),
    // t34 shares t33's oracle text — the s05/s09 pattern: one SQL truth,
    // two plans (retrain-per-call vs fold under the stored merge list).
    QuerySpec("t34_bpe_tokens_stored", bpeTokensStored, Some(bpeTokensOracle)),
    QuerySpec("t35_bpe_packs", bpePacks, Some(bpePacksOracle)),
    QuerySpec("t36_bpe_fertility", bpeFertility, Some(bpeFertilityOracle)),
    QuerySpec("t37_cms_heavy_hitters", cmsHeavyHitters, Some(cmsOracle)),

    QuerySpec("t38_dsir_select", dsirSelect, Some(
      """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |tokrows AS (SELECT doc_id, pos, t[pos] AS tok
        |            FROM toks, UNNEST(range(1, len(t) + 1)) u(pos)),
        |big AS MATERIALIZED (
        |  SELECT a.doc_id,
        |         ('0x' || substr(md5(a.tok || ' ' || b.tok), 1, 8))::BIGINT % 1024 AS bkt
        |  FROM tokrows a JOIN tokrows b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |q AS (SELECT doc_id FROM toks
        |      WHERE len(t) >= 20
        |        AND (len(list_filter(t, x -> x IN ('a', 'the'))) * 1000000) // len(t) < 300000),
        |raw AS MATERIALIZED (SELECT bkt, count(*) AS cr FROM big GROUP BY 1),
        |tgt AS MATERIALIZED (
        |  SELECT bkt, count(*) AS ct FROM big
        |  WHERE doc_id IN (SELECT doc_id FROM q) GROUP BY 1),
        |probs AS (
        |  SELECT r.bkt,
        |         (r.cr * 1000000) // (SELECT SUM(cr) FROM raw) AS pr,
        |         COALESCE((t.ct * 1000000) // (SELECT SUM(ct) FROM tgt), 0) AS pt
        |  FROM raw r LEFT JOIN tgt t ON t.bkt = r.bkt),
        |scored AS MATERIALIZED (
        |  SELECT g.doc_id, count(*) AS n_bigrams,
        |         CAST((SUM(p.pt - p.pr) + count(*) * 1000000) // count(*)
        |              - 1000000 AS BIGINT) AS dsir_score_ppm
        |  FROM big g JOIN probs p ON p.bkt = g.bkt GROUP BY 1),
        |hist AS MATERIALIZED (
        |  SELECT dsir_score_ppm AS sc, count(*) AS cnt FROM scored GROUP BY 1),
        |nk AS MATERIALIZED (SELECT CAST((SUM(cnt) * 25) // 100 AS BIGINT) AS n_keep FROM hist),
        |bo AS MATERIALIZED (
        |  SELECT sc AS s_star,
        |         (SELECT n_keep FROM nk) - (cum - cnt) AS take_at
        |  FROM (SELECT sc, cnt, SUM(cnt) OVER (ORDER BY sc DESC) AS cum FROM hist)
        |  WHERE cum >= (SELECT n_keep FROM nk)
        |  ORDER BY sc DESC LIMIT 1),
        |kb AS (
        |  SELECT doc_id FROM (
        |    SELECT s.doc_id, row_number() OVER (ORDER BY s.doc_id) AS rn
        |    FROM scored s JOIN bo ON s.dsir_score_ppm = bo.s_star)
        |  WHERE rn <= (SELECT take_at FROM bo))
        |SELECT s.doc_id, s.n_bigrams, s.dsir_score_ppm,
        |       CASE WHEN s.dsir_score_ppm > (SELECT s_star FROM bo)
        |              OR s.doc_id IN (SELECT doc_id FROM kb)
        |            THEN 1 ELSE 0 END AS keep
        |FROM scored s""".stripMargin)),

    QuerySpec("t39_length_quantiles", lengthQuantiles, Some(
      """WITH d AS (
        |  SELECT lang,
        |         CASE WHEN nt < 8192 THEN nt // 16
        |              ELSE least(512 + (nt - 8192) // 2048, 1023) END AS bin
        |  FROM (SELECT lang, len(string_split(text, ' ')) AS nt
        |        FROM documents)),
        |hist AS MATERIALIZED (
        |  SELECT lang, bin, count(*) AS cnt FROM d GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS nd FROM hist GROUP BY 1),
        |cum AS (
        |  SELECT lang, bin, cnt,
        |         SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum
        |  FROM hist),
        |qs AS (
        |  SELECT c.lang, u.q, t.nd,
        |         (CASE WHEN c.bin < 512 THEN c.bin * 16
        |               ELSE 8192 + (c.bin - 512) * 2048 END)
        |         + ((((t.nd * u.q + 99) // 100) - (c.cum - c.cnt))
        |            * (CASE WHEN c.bin < 512 THEN 16 ELSE 2048 END))
        |           // c.cnt AS est
        |  FROM cum c JOIN tot t USING (lang), UNNEST([50, 90, 99]) u(q)
        |  WHERE c.cum - c.cnt < (t.nd * u.q + 99) // 100
        |    AND (t.nd * u.q + 99) // 100 <= c.cum)
        |SELECT lang, MAX(nd) AS n_docs,
        |       CAST(MAX(CASE WHEN q = 50 THEN est END) AS BIGINT) AS p50_est,
        |       CAST(MAX(CASE WHEN q = 90 THEN est END) AS BIGINT) AS p90_est,
        |       CAST(MAX(CASE WHEN q = 99 THEN est END) AS BIGINT) AS p99_est
        |FROM qs GROUP BY 1""".stripMargin))
  )
}
