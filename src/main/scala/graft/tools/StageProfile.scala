package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage profiler for the composed curation pipeline (t40) — VERDICT
  * r15 #6: attribute t40's ~4 s across its legs (canonical/quality/
  * split gates, contamination anti-join, DSIR semi-join, packer,
  * shard deal) so the next optimization lands on the leg that owns the
  * time, or the floor is recorded and the chase stops.
  *
  * Method: each stage is timed as a CUMULATIVE plan (gate → +contam →
  * +dsir → +pack → full t40) because the legs share scans and
  * exchanges — timing a leg in isolation would double-count the shared
  * corpus scan that Spark reuses inside the one composed plan. The
  * deltas between consecutive rows are therefore each leg's marginal
  * cost in situ. Memoized frames (cluster labels, Bloom sketches) are
  * built once in a warm-up pass so every timed row prices the steady
  * state the bench's min grain reports. min of SPARK_GRAFT_ITERS
  * (default 3) runs per row.
  *
  * Usage: runMain graft.tools.StageProfile
  *   env SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *   SPARK_GRAFT_CPUS (default 32). Prints one line per stage. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val E = graft.queries.Extensions

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
      println(f"$label%-22s min=${ts.min}%6.2f  med=${ts.sorted.apply(ts.size / 2)}%6.2f")
      ts.min
    }

    // Warm-up: build the memoized frames (cluster cache, Bloom sketch)
    // and JIT the shared paths, so stage rows price the steady state.
    E.curationManifest(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val gate = () => E.trainSplitToks(spark, sfDir)
    val contam = () => gate()
      .join(E.contaminatedTrainDocs(spark, sfDir), Seq("doc_id"), "left_anti")
    val dsir = () => contam()
      .join(E.dsirSelect(spark, sfDir).filter(col("keep") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi")

    time("gate(t30 semi-joins)")(gate)
    time("+contamination")(contam)
    time("+dsir")(dsir)
    time("+pack(full t40)")(() => E.curationManifest(spark, sfDir))
    // The components the gate fans in, priced standalone for reference.
    time("  canonicalCorpus")(() => E.canonicalCorpus(spark, sfDir))
    time("  qualityScore")(() => E.qualityScore(spark, sfDir))
    time("  clusterSplit")(() => E.clusterSplit(spark, sfDir))
    time("  dsirSelect")(() => E.dsirSelect(spark, sfDir))
    time("  d13 (for reference)")(() => E.semanticCanonical(spark, sfDir))
    spark.stop()
  }
}
