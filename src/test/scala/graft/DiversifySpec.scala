package graft

import graft.queries.Extensions
import graft.streaming.CorpusService
import org.apache.spark.sql.functions._

/** The MMR re-ranker on the request path and the indexed hard-negative
  * miner — round 11's service-side closures: the served diversified
  * top-5 must equal one-shot s22 row-for-row on the exact-vector dial
  * (the shared mmrSelect core makes drift impossible; this pins the
  * wiring), the diversify dials must actually break a planted
  * monoculture on the hybrid and chunk paths, the greedy core must not
  * leak checkpoint blocks across serving calls, and t26's indexed twin
  * must equal the one-shot both as a query and through the service's
  * maintained index. */
class DiversifySpec extends SparkSpec {

  test("service diversified retrieval (exact dial) ≡ one-shot s22 row-for-row") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-div").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    Tables.t(spark, src, "embeddings").select("vec_id", "embedding")
      .write.parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)
    CorpusService.drainAvailable(spark, p, index = true)
    val queries = Tables.t(spark, base, "embeddings")
      .filter(col("vec_id") < 10).select("vec_id", "embedding")
    // vectorExact builds s22's pool bit-for-bit (s01's exact scan) and
    // the greedy core is the SAME code path — so served ≡ one-shot.
    assertSameRows(
      CorpusService.diversifiedTopKFor(spark, p, queries,
        excludeSelf = true, vectorExact = true),
      Extensions.mmrDiversified(spark, base),
      "served diversified top-5 (exact dial) vs one-shot s22")
    // The index-served pool (the scale path) inherits the cell-probe
    // family's recall; the pin is overlap against the exact dial — the
    // AnnRecallSpec idiom (floor from measurement, headroom below).
    val exact = Extensions.mmrDiversified(spark, base).persist()
    val served = CorpusService.diversifiedTopKFor(spark, p, queries,
      excludeSelf = true).persist()
    try {
      val inter = served.join(exact, Seq("query_id", "neighbor_id"),
        "left_semi").count()
      val total = exact.count()
      info(s"indexed-pool diversified overlap@5 vs exact: $inter/$total")
      // MMR amplifies pool differences (one diverging pick shifts every
      // later round's penalty), so the floor sits below the raw ANN
      // retrieval floors: measured 0.58 at round 11, headroom below.
      assert(inter * 100 >= total * 40,
        s"indexed-pool diversified overlap@5 $inter/$total below 0.40 floor " +
          "(measured 0.58 at round 11)")
    } finally { exact.unpersist(); served.unpersist() }
  }

  /** A corpus where BOTH rankers are controlled: docs 1–3 are verbatim
    * copies (one shared embedding, one shared text whose tokens are the
    * most distinctive match for the query), docs 4–8 are distinct
    * plausible candidates. The fixture-data corpus can't serve here:
    * its 31-token vocabulary makes lexical rank uncorrelated with text
    * identity, and its planted semantic near-dups make any natural doc
    * part of somebody's monoculture. */
  private def monocultureCorpus(p: CorpusService.Paths): Unit = {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma delta", "en"),
      (3L, "alpha beta gamma delta", "en"),
      (4L, "alpha epsilon zeta eta", "en"),
      (5L, "beta theta iota kappa", "en"),
      (6L, "gamma lambda mu nu", "en"),
      (7L, "delta xi omicron pi", "en"),
      (8L, "rho sigma tau upsilon", "en"))
      .toDF("doc_id", "text", "lang")
    // 64-dim embeddings: copies share v0; the rest point elsewhere with
    // moderate mutual cosine (a shared base component + an own axis).
    def vec(axis: Int): Array[Float] = {
      val a = Array.fill(64)(0.1f)
      a(axis) = 1.0f
      a
    }
    val emb = Seq(
      1L -> vec(0), 2L -> vec(0), 3L -> vec(0),
      4L -> vec(8), 5L -> vec(16), 6L -> vec(24),
      7L -> vec(32), 8L -> vec(40))
      .toDF("vec_id", "embedding")
    docs.coalesce(1).write.parquet(p.docs)
    emb.coalesce(1).write.parquet(p.embeddings)
  }

  test("hybrid diversify dial breaks a planted paraphrase monoculture") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-divhyb").toString
    val p = CorpusService.Paths(base)
    monocultureCorpus(p)
    assert(CorpusService.maintainPostings(spark, p) > 0)
    // External request carrying the monoculture's text + vector.
    val ext = Tables.t(spark, base, "documents").filter(col("doc_id") === 1)
      .select(lit(900001L).as("vec_id"), col("text"))
      .join(Tables.t(spark, base, "embeddings").filter(col("vec_id") === 1)
          .select(lit(900001L).as("vec_id"), col("embedding")),
        "vec_id")
    val cultSet = Set(1L, 2L, 3L)
    // Plain hybrid: the copies own the head of BOTH rankers (cos 1e6;
    // the most matched rare tokens), so they own the fused top-3 — each
    // pick past the first adding nothing.
    val plain = CorpusService.hybridTopKFor(spark, p, ext,
        vectorExact = true)
      .filter(col("rank") <= 3).collect()
      .map(_.getAs[Long]("neighbor_id")).toSet
    assert(plain == cultSet,
      s"planted copies should own the plain top-3: $plain")
    // Diversified: exactly ONE representative survives — its siblings
    // carry max-sim 1e6 to the first pick, and 7·rrf − 3e6 loses to
    // any non-duplicate candidate.
    val div = CorpusService.hybridTopKFor(spark, p, ext,
        vectorExact = true, diversify = true).collect()
    assert(div.length == 5 &&
      div.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5),
      s"diversified hybrid must keep the top-5 shape: ${div.toSeq}")
    val picked = div.map(_.getAs[Long]("neighbor_id")).toSet
    assert((picked & cultSet).size == 1,
      s"diversified picks did not break the monoculture: $picked")
    // Relevance-first still holds: rank 1 is a monoculture member (the
    // most relevant candidate), diversity only shapes what FOLLOWS.
    assert(cultSet(div.find(_.getAs[Int]("rank") == 1)
      .get.getAs[Long]("neighbor_id")),
      s"rank 1 must stay the most relevant pick: ${div.toSeq}")
  }

  test("chunk diversify dial surfaces distinct docs past a passage monoculture") {
    val base = java.nio.file.Files.createTempDirectory("graft-divchunk").toString
    val p = CorpusService.Paths(base)
    monocultureCorpus(p)
    assert(CorpusService.maintainChunks(spark, p) > 0)
    assert(CorpusService.maintainChunkVectors(spark, p) > 0)
    CorpusService.refreshChunkIndex(spark, p)
    val ext = Tables.t(spark, base, "documents").filter(col("doc_id") === 1)
      .select(lit(900001L).as("vec_id"), col("text"))
    val cultSet = Set(1L, 2L, 3L)
    val plain = CorpusService.chunkTopKFor(spark, p, ext)
      .filter(col("rank") <= 3).collect()
      .map(_.getAs[Long]("neighbor_id")).toSet
    assert(plain == cultSet,
      s"planted copies should own the plain chunk top-3: $plain")
    val div = CorpusService.chunkTopKFor(spark, p, ext, diversify = true)
      .collect()
    assert(div.map(_.getAs[Int]("rank")).sorted.toSeq ==
      (1 to div.length).toSeq,
      s"diversified chunk ranks must be dense from 1: ${div.toSeq}")
    val picked = div.map(_.getAs[Long]("neighbor_id")).toSet
    assert((picked & cultSet).size == 1,
      s"diversified chunk picks did not break the monoculture: $picked")
    // The chosen representative still carries the exact-twin MaxSim.
    assert(div.find(r => cultSet(r.getAs[Long]("neighbor_id")))
      .get.getAs[Long]("max_cos_ppm") == 1000000L,
      "the surviving monoculture pick lost its exact-twin score")
  }

  test("mmrSelect frees every superseded checkpoint block") {
    val dir = sf("sf0.001")
    // Warm the per-dir memos so the measured delta is the re-ranker's.
    Extensions.mmrDiversified(spark, dir).count()
    val before = spark.sparkContext.getPersistentRDDs.size
    Extensions.mmrDiversified(spark, dir).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // Serving-sized pools take the driver loop (pool checkpoint freed
    // after the collect, nothing else created); the distributed rounds
    // free pool, sims, and the intermediate selections — only the
    // returned frame's final checkpoint may remain on that path.
    assert(after - before <= 1,
      s"mmrSelect retained ${after - before} checkpoint RDDs per call " +
        "(pool/sims/intermediate selections must be freed)")
    val beforeD = spark.sparkContext.getPersistentRDDs.size
    val e = Extensions.quantizeFrame(Tables.t(spark, dir, "embeddings"))
    val q0 = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qa"),
        col("s2").as("sa"))
    val pool = Extensions.vecRankExact(e, q0.select(
        col("query_id").as("vec_id"), col("qa").as("q"), col("sa").as("s2")),
      excludeSelf = true, k = 20)
      .select(col("query_id"), col("neighbor_id").as("cand"),
        col("cos_ppm").as("rel"))
    Extensions.mmrSelectDistributed(pool,
      p => Extensions.poolSimsFrom(p, e)).count()
    val afterD = spark.sparkContext.getPersistentRDDs.size
    assert(afterD - beforeD <= 1,
      s"mmrSelectDistributed retained ${afterD - beforeD} checkpoint RDDs")
  }

  test("driver-side MMR ≡ the distributed greedy rounds") {
    // The under-cap driver loop against the retained distributed
    // anchor: same pool, same sims builder, identical picks and ranks —
    // including the missing-sim-means-0 rule and (score desc, cand asc)
    // tie order the two paths must share.
    val dir = sf("sf0.001")
    val e = Extensions.quantizeFrame(Tables.t(spark, dir, "embeddings"))
    val q0 = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("vec_id"), col("q"), col("s2"))
    val pool = Extensions.vecRankExact(e, q0, excludeSelf = true, k = 20)
      .select(col("query_id"), col("neighbor_id").as("cand"),
        col("cos_ppm").as("rel"))
    val local = Extensions.mmrSelect(pool,
      p => Extensions.poolSimsFrom(p, e))
    val dist = Extensions.mmrSelectDistributed(pool,
      p => Extensions.poolSimsFrom(p, e))
    assertSameRows(local, dist, "driver-side MMR vs distributed rounds")
    assert(local.count() > 0, "empty pool makes the pin vacuous")
  }

  test("driver route is gated on the QUADRATIC sims axis, not pool rows alone") {
    // What the driver route collects is the all-pairs sims frame
    // (Σ_q n_q·(n_q−1)), quadratic per query — so a single
    // 10k-candidate pool (well under the 100k ROW cap, ~10^8 sim rows)
    // must route distributed, while the serving shape (many queries,
    // tens of candidates each) stays driver-side.
    assert(!Extensions.mmrDriverEligible(
      poolRows = 10000L, simsBound = 10000L * 9999L),
      "one 10k-candidate pool must go distributed (sims axis)")
    assert(Extensions.mmrDriverEligible(
      poolRows = 2500L * 20L, simsBound = 2500L * 20L * 19L),
      "2.5k serving pools of 20 stay driver-side")
    // The sims cap deliberately excludes the full-row-cap shape
    // (100k rows × 20/query ⇒ 1.9M sims ≈ hundreds of MB boxed — the
    // round-15 advisory's point): over it, distributed is the right
    // route even though rows fit.
    assert(!Extensions.mmrDriverEligible(
      poolRows = 5000L * 20L, simsBound = 5000L * 20L * 19L),
      "1.9M-sims shape exceeds the collect budget; goes distributed")
    assert(!Extensions.mmrDriverEligible(
      poolRows = MmrOverRows, simsBound = MmrOverRows * 19L),
      "the row cap still binds on its own axis")
    assert(Extensions.mmrDriverEligible(0L, 0L), "empty pool is trivially eligible")

    // End-to-end: an over-sims-cap pool takes the distributed rounds
    // and still produces exactly the distributed answer (routing must
    // never change the result — only where it computes).
    val n = 1100 // 1100·1099 ≈ 1.21M > MmrDriverSimsCap with rows ≪ row cap
    assert(!Extensions.mmrDriverEligible(n.toLong, n.toLong * (n - 1)))
    val pool = spark.range(n)
      .select(lit(7L).as("query_id"), col("id").as("cand"),
        (col("id") % 97).as("rel"))
    // Sims builder keyed on candidate distance — cheap but non-trivial,
    // so greedy picks actually depend on it.
    def sims(p: org.apache.spark.sql.DataFrame) =
      p.select(col("query_id"), col("cand").as("a"))
        .join(p.select(col("query_id"), col("cand").as("b")), "query_id")
        .filter(col("a") =!= col("b"))
        .withColumn("sim", lit(1000000L) - abs(col("a") - col("b")) * lit(900L))
        .select("query_id", "a", "b", "sim")
    val routed = Extensions.mmrSelect(pool, sims)
    val dist = Extensions.mmrSelectDistributed(pool, sims)
    assertSameRows(routed, dist, "over-sims-cap pool: routed ≡ distributed")
  }
  private val MmrOverRows = Extensions.MmrDriverPoolCap + 1

  test("hard negatives off the stored index ≡ one-shot t26, as query and service") {
    val src = sf("sf0.001")
    // The registered t27 form against the one-shot (same corpus, the
    // s05≡s09 pin at the miner's grain).
    assertSameRows(
      Extensions.hardNegativesIndexed(spark, src),
      Extensions.hardNegatives(spark, src),
      "t27 (stored-index membership) vs one-shot t26")
    // Through the service's MAINTAINED index, built under the service
    // quantizer on its own corpus copy.
    val base = java.nio.file.Files.createTempDirectory("graft-hneg").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    Tables.t(spark, src, "embeddings").select("vec_id", "embedding")
      .write.parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)
    CorpusService.drainAvailable(spark, p, index = true)
    assertSameRows(
      CorpusService.hardNegativesReport(spark, p),
      Extensions.hardNegatives(spark, base),
      "service hard-negative report vs one-shot t26 on the same corpus")
  }
}
