package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through full execution with the `noop` sink —
  * `count()` would let Catalyst skip computing projected columns, which
  * under-measures report-style queries. One trivial warm-up job runs first
  * so JIT/codegen compilation isn't billed to the first query.
  *
  * Each query runs SPARK_GRAFT_ITERS times (default 3) and reports the
  * MEDIAN: a single shot in a shared JVM cannot tell a plan regression
  * from a GC pause or a codegen-cache eviction — medians over ≥3 runs
  * make per-query comparisons across rounds meaningful. SUB-SECOND
  * queries get extra iterations (to SPARK_GRAFT_ITERS_SUB1 total,
  * default 7): at that scale per-job scheduling noise is the same order
  * as the measurement, and a 3-sample median still swings 2-3× across
  * rounds on an unchanged plan — a wider median is the fix, applied
  * only where it's cheap by construction (the query is sub-second).
  *
  * Output formatting is part of the contract: per-query seconds are
  * rounded to milliseconds so the single JSON line stays small enough
  * for tail-windowed log capture (sub-ms digits are pure noise here),
  * and the line is the LAST stdout write.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: JIT the code paths every query shares — parquet scan,
    // hash-aggregate shuffle, noop sink — on a tiny table, so that cost
    // is not billed to whichever query happens to run first.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    // A failed query must be visible IN the JSON (not only stderr): its
    // per-query seconds are negated as a sentinel and its message goes into
    // an "errors" object. A query enters "errors" only when EVERY iteration
    // failed (one entry, the first message — duplicate JSON keys are
    // invalid); a query failing on SOME iterations keeps its positive
    // median but is surfaced in a "flaky" object (name → failed-iteration
    // count) so partial failures can't hide behind a good median.
    val subSecIters = sys.env.getOrElse("SPARK_GRAFT_ITERS_SUB1", "7")
      .toInt.max(iters)
    var errors = Vector.empty[(String, String)]
    var flaky = Vector.empty[(String, Int)]
    val results = SparkEntry.specs.map { spec =>
      var firstErr: Option[String] = None
      def runOnce(): Double = {
        val t0 = System.nanoTime()
        val ok =
          try {
            spec.build(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] ${spec.name} failed: ${e.getMessage}")
              if (firstErr.isEmpty)
                firstErr = Some(String.valueOf(e.getMessage)
                  .replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200))
              false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        if (ok) elapsed else -elapsed
      }
      def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
      val base = (1 to iters).map(_ => runOnce())
      val baseGood = base.filter(_ >= 0)
      // Sub-second and not erroring → widen the sample before judging.
      val times =
        if (baseGood.nonEmpty && median(baseGood) < 1.0)
          base ++ (1 to (subSecIters - iters)).map(_ => runOnce())
        else base
      // Median of the successful runs; if every run failed, the negated
      // first attempt survives as the error sentinel.
      val good = times.filter(_ >= 0)
      if (good.isEmpty) firstErr.foreach(m => errors :+= (spec.name -> m))
      else if (good.size < times.size)
        flaky :+= (spec.name -> (times.size - good.size))
      spec.name -> (if (good.isEmpty) times.head else median(good))
    }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) => "\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val flakyJson = flaky.map { case (k, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val total = r3(results.collect { case (_, v) if v >= 0 => v }.sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"flaky":$flakyJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
