package graft.queries

// NOTE: lives under src/main/scala/graft/tools (excluded from the
// bench's QueryPathSpec — harness tooling, not query code) but in the
// queries package so it can time private helper legs in isolation.

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leg-level profiler for the round-17 optimization targets — the
  * StageProfile method (cumulative legs, min of N, cleared cache + GC
  * per iteration) applied to the queries the round's baseline bench
  * put on top: d16 (fixture gen → signatures → candidates → routed
  * verify), s20 (PQ codebook/encode → ADC → rerank), and any query
  * named on the command line as a whole.
  *
  * Usage: runMain graft.queries.OptProfile [legset...]
  *   legsets: d16, s20 (default: all)
  *   env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_ITERS. */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val sets = if (args.isEmpty) Set("d16", "s20") else args.toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val E = Extensions

    // Warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()
    E.docs(spark, sfDir).limit(1).collect()

    def time(label: String)(build: () => DataFrame): Double = {
      val ts = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val df = build()
        df.write.format("noop").mode("overwrite").save()
        E.freeCkptFresh(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[optprofile] $label%-28s min=${ts.min}%6.2f  med=${ts.sorted.apply(ts.size / 2)}%6.2f")
      ts.min
    }

    if (sets("d16")) {
      time("d16 corpus gen")(() => E.longdocFixtureCorpus(spark, sfDir))
      time("d16 +banded sigs")(() =>
        E.bandedSignaturesOfDocs(E.longdocFixtureCorpus(spark, sfDir)))
      time("d16 +cand distinct")(() => {
        val corpus = E.longdocFixtureCorpus(spark, sfDir)
        val banded = E.bandedSignaturesOfDocs(corpus)
        banded.as("a")
          .join(banded.as("b"), E.bandEq && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
      })
      time("d16 full (routed)")(() => E.dedupLongdocRouted(spark, sfDir))
      time("d16 full (kernel)")(() =>
        E.dedupLongdocRoutedMode(spark, sfDir, Some(false)))
      time("d16 full (frame)")(() =>
        E.dedupLongdocRoutedMode(spark, sfDir, Some(true)))
    }

    if (sets("topk")) {
      // Window vs native MinKLongs top-k over the SAME coarse frame
      // (s01's scoring join: |Q|·|corpus| rows) — the decisive probe
      // for rolling the native form out to the ANN coarse passes.
      import org.apache.spark.sql.expressions.Window
      val e = E.quantized(spark, sfDir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qa"),
          col("s2").as("sa"))
      val b = e.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("s2").as("sb"))
      def scored() = q.join(b, col("query_id") =!= col("neighbor_id"))
        .withColumn("dot", E.dot)
        .withColumn("cos_ppm", E.cosPpm)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_ppm").desc, col("neighbor_id").asc)
      time("s01-shape window top5")(() =>
        scored().withColumn("rank", org.apache.spark.sql.functions
            .row_number().over(w))
          .filter(col("rank") <= 5)
          .select("query_id", "neighbor_id", "cos_ppm", "rank"))
      time("s01-shape native top5")(() =>
        E.topKPerGroup(scored(), "query_id", col("cos_ppm"),
            "neighbor_id", 5, "cos_ppm", "rank")
          .select("query_id", "neighbor_id", "cos_ppm", "rank"))
      time("s01-shape window top100")(() =>
        scored().withColumn("rank", org.apache.spark.sql.functions
            .row_number().over(w))
          .filter(col("rank") <= 100)
          .select("query_id", "neighbor_id"))
      time("s01-shape native top100")(() =>
        E.topKPerGroup(scored(), "query_id", col("cos_ppm"),
            "neighbor_id", 100)
          .select("query_id", "neighbor_id"))
    }

    if (sets("t26")) {
      val e = E.quantized(spark, sfDir)
      def assigned() = E.imiRankB(e, E.coarseBooks(spark, sfDir, e), "vec_id", 2)
        .filter(col("rn") <= 4)
        .select(col("vec_id"), col("cent_id").as("cell"))
      def cand() = assigned().as("a")
        .join(assigned().as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
      def scored() = cand()
        .join(e.select(col("vec_id").as("vec_a"), col("q").as("qa"),
          col("s2").as("sa")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("q").as("qb"),
          col("s2").as("sb")), "vec_b")
        .withColumn("dot", E.dot)
        .withColumn("cos_ppm", E.cosPpm)
        .filter(col("cos_ppm") < 350000)
        .select("vec_a", "vec_b", "cos_ppm")
      println("[optprofile] t26 cand rows = " + cand().count() +
        ", scored rows = " + scored().count())
      time("t26 cand distinct")(() => cand())
      time("t26 +scored")(() => scored())
      time("t26 full")(() => E.hardNegatives(spark, sfDir))
    }

    if (sets("s20")) {
      val n: Long = E.corpusCount.computeIfAbsent(sfDir,
        _ => graft.Tables.t(spark, sfDir, "embeddings").count())
      time("s20 subvectors")(() => E.pqSubvectors(E.quantized(spark, sfDir)))
      time("s20 +codebooks")(() =>
        E.pqCodebooks(E.quantized(spark, sfDir), n))
      time("s20 +encode")(() => {
        val e = E.quantized(spark, sfDir)
        E.pqEncodeWith(e, E.pqCodebooks(e, n))
      })
      time("s20 full")(() => E.annPq(spark, sfDir))
    }

    spark.stop()
  }
}
