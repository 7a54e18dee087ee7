package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// TEMP probe: graph-shape stats for d06/d13 pair graphs. Deleted before commit.
object Probe {
  def stats(name: String, pairFrame: DataFrame): Unit = {
    val pairs = pairFrame.select("doc_a", "doc_b").localCheckpoint()
    val nPairs = pairs.count()
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    val nodes = edges.select(col("doc_a").as("doc_id")).distinct().localCheckpoint()
    val nNodes = nodes.count()
    val avgDeg = 2.0 * nPairs / math.max(1L, nNodes)
    // k=1 fixpoint loop, count rounds (diameter proxy = rounds-1)
    var labels = nodes.withColumn("label", col("doc_id")).localCheckpoint()
    def cs(df: DataFrame): Long = { val r = df.agg(sum(col("label"))).head; if (r.isNullAt(0)) 0L else r.getLong(0) }
    var prev = cs(labels); var rounds = 0; var conv = false
    while (!conv && rounds < 60) {
      val next = labels.union(
          edges.join(labels.withColumnRenamed("doc_id", "doc_b"), "doc_b")
            .select(col("doc_a").as("doc_id"), col("label")))
        .groupBy("doc_id").agg(min("label").as("label")).localCheckpoint()
      val ns = cs(next); conv = ns == prev; prev = ns; labels = next; rounds += 1
    }
    // max-degree node and p99 degree
    val degs = edges.groupBy("doc_a").agg(count("*").as("deg"))
    val maxDeg = degs.agg(max("deg")).head.getLong(0)
    println(s"PROBE $name: pairs=$nPairs nodes=$nNodes avgDeg=$avgDeg maxDeg=$maxDeg roundsK1=$rounds (D=${rounds-1})")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    def sentinelOnce(): Double = {
      System.gc()
      val t0 = System.nanoTime()
      spark.range(200000000L)
        .selectExpr("sum(id * 3 + 1)", "count(if(id % 7 = 0, 1, null))")
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    def time(name: String, f: (SparkSession, String) => DataFrame): Unit = {
      val ts = (1 to 6).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        f(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE-TIME $name: min=${ts.min}%.3f med=${ts.sorted.apply(ts.size/2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    println(f"PROBE-SENTINEL pre=${(1 to 3).map(_ => sentinelOnce()).min}%.3f")
    time("d06-pairs-only", (s, d) => graft.queries.Extensions.lshPairs(s, d))
    time("t02-fresh", graft.queries.Extensions.qualityScore)
    time("t40-warm", graft.queries.Extensions.curationManifest(_, _))
    time("t02-after-t40", graft.queries.Extensions.qualityScore)
    time("q36", graft.queries.Parity.sessionOverlaps)
    time("d06", graft.queries.Extensions.dedupClusters)
    time("d13", graft.queries.Extensions.semanticCanonical)
    println(f"PROBE-SENTINEL post=${(1 to 3).map(_ => sentinelOnce()).min}%.3f")
    spark.stop()
  }
}
