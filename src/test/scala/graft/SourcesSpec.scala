package graft

import graft.ops.Joins
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source round-trips (explicit-schema CSV/JSON/parquet) and the salted
  * skew-safe join's equivalence to a plain join. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 1.5), (2L, "beta", 2.25), (3L, "gamma", -0.75)
  ).toDF("id", "name", "score")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  test("csv round-trips with explicit schema") {
    val p = tmp("graft-csv")
    df.write.option("header", "true").csv(p)
    assertSameRows(Sources.csv(spark, p, schema), df, "csv")
  }

  test("json round-trips with explicit schema") {
    val p = tmp("graft-json")
    df.write.json(p)
    assertSameRows(Sources.json(spark, p, schema), df, "json")
  }

  test("parquet round-trips") {
    val p = tmp("graft-parquet")
    df.write.parquet(p)
    assertSameRows(Sources.parquet(spark, p), df, "parquet")
  }

  test("salted join equals plain join, including skewed and absent keys") {
    // key 1 is hot (100 rows), key 9 has no match on the right
    val left = spark.range(0, 100).select(lit(1L).as("k"), col("id").as("v"))
      .union(Seq((2L, -1L), (9L, -2L)).toDF("k", "v"))
    val right = Seq((1L, "hot"), (2L, "cold"), (3L, "unused"))
      .toDF("k", "tag")
    val plain = left.join(right, Seq("k"))
    val salted = Joins.saltedJoin(left, right, Seq("k"), salt = 4)
    assertSameRows(salted, plain, "salted vs plain")
  }

  test("salting spreads a hot key across reducers (measured balance win)") {
    // One key carries 8000 of 8100 rows. Plain shuffle: every hot row
    // hashes to ONE reducer. Salted: the hot key fans out over 16
    // (key, salt) groups. Static planner + no broadcast so the observed
    // partitioning IS the join shuffle's.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(0, 8000).select(lit(1L).as("k"), col("id").as("v"))
        .union(spark.range(0, 100).select((col("id") % 10 + 2).as("k"),
          col("id").as("v")))
      val right = (1L to 11L).map(k => (k, s"t$k")).toDF("k", "tag")
      def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long =
        df.groupBy(spark_partition_id().as("p")).count()
          .agg(max("count")).as[Long].head()
      val plainMax = maxPartitionRows(left.join(right, Seq("k")))
      val saltedMax = maxPartitionRows(
        Joins.saltedJoin(left, right, Seq("k"), salt = 16))
      assert(plainMax >= 8000L,
        s"setup broken: hot key not concentrated (max=$plainMax)")
      assert(saltedMax * 2 <= plainMax,
        s"salting did not spread the hot key: salted max $saltedMax " +
          s"vs plain max $plainMax")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    // The runtime counterpart to saltedJoin: for SORT-MERGE joins AQE
    // itself detects the oversized shuffle partition (hot key) and splits
    // it across tasks — no query rewrite. Thresholds lowered so the test
    // skew (a ~5 MB hot key vs KB-sized siblings) trips the default
    // factor-of-5-over-median rule.
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
    try {
      val pad = "x" * 100
      val left = spark.range(0, 50000)
        .select(lit(1L).as("k"), concat(lit(pad), col("id")).as("v"))
        .union(spark.range(0, 200).select((col("id") % 10 + 2).as("k"),
          col("id").cast("string").as("v")))
      val right = (1L to 11L).map(k => (k, s"t$k")).toDF("k", "tag")
      val joined = left.join(right, Seq("k"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join accepts left frames with map columns") {
    // xxhash64 rejects MapType at analysis time; the salt must skip map
    // columns rather than fail the whole join.
    val left = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)))
      .toDF("k", "m")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "tag")
    assert(Joins.saltedJoin(left, right, Seq("k")).count() == 2L)
  }

  test("jdbc partitioned extraction round-trips through embedded Derby") {
    // Derby ships with Spark (the Hive-metastore backend jar), so the
    // parallel-scan JDBC configuration is provable offline: 97 rows,
    // 4 range partitions on id.
    val dbDir = java.nio.file.Files.createTempDirectory("graft-derby")
      .toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE t (id BIGINT NOT NULL, name VARCHAR(20))")
      (1 to 97).foreach(i => st.executeUpdate(s"INSERT INTO t VALUES ($i, 'n$i')"))
      st.close()
    } finally conn.close()
    val got = Sources.jdbc(spark, url, "t", "id", 1L, 98L, 4)
    assert(got.rdd.getNumPartitions == 4,
      s"expected 4 range partitions, got ${got.rdd.getNumPartitions}")
    assert(got.count() == 97L)
    assert(got.agg(sum("id")).as[Long].head() == (1 to 97).map(_.toLong).sum)
  }

  test("jdbc version upsert: idempotent, latest view ≡ parquet-log twin") {
    // The last reference boundary: its L side writes version rows into
    // an external OLAP store (initial_load…py:334-343,
    // track_delta.py:219-223). Round-trip: totals → writeJdbcVersions →
    // delta cycle → REPLAYED delta cycle (must reconverge, not double)
    // → partitioned read-back → DeltaUpsert.latest ≡ the parquet-log
    // twin's latest.
    val dir = sf("sf0.001")
    val t0 = graft.queries.Parity.totals(spark, dir)
    val url = s"jdbc:derby:${java.nio.file.Files.createTempDirectory("graft-djdbc")}/db;create=true"
    Sources.createJdbcTable(url, "versions", t0.schema,
      graft.jobs.DeltaUpsert.Keys :+ "rtm_delta")
    graft.jobs.Warehouse.writeJdbcVersions(t0, url, "versions")
    val changed = t0.filter(col("rtm_campaign_id") % 97 === 0)
      .withColumn("campaign_clicks_count_total",
        col("campaign_clicks_count_total") + 10)
      .withColumn("rtm_delta", col("rtm_delta") + expr("INTERVAL 1 DAY"))
    val (n0, nChanged) = (t0.count(), changed.count())
    assert(nChanged > 0)
    graft.jobs.Warehouse.writeJdbcVersions(changed, url, "versions")
    graft.jobs.Warehouse.writeJdbcVersions(changed, url, "versions") // replay
    val (lo, hi) = {
      val r = t0.agg(min("rtm_campaign_id"), max("rtm_campaign_id")).head
      (r.getLong(0), r.getLong(1))
    }
    // Derby reports uppercase identifiers and plain TIMESTAMP; restore
    // the engine's names by position (DDL order = schema order) and the
    // frame's exact types (UTC session ⇒ value-preserving casts).
    val back0 = Sources.jdbc(spark, url, "versions", "rtm_campaign_id",
      lo, hi + 1, 4).toDF(t0.columns: _*)
    val back = t0.schema.fields.foldLeft(back0) { (d, f) =>
      d.withColumn(f.name, col(f.name).cast(f.dataType))
    }
    assert(back.count() == n0 + nChanged,
      "replayed delta must reconverge, not append a third version set")
    assertSameRows(
      graft.jobs.DeltaUpsert.latest(back),
      graft.jobs.DeltaUpsert.latest(t0.unionByName(changed)),
      "JDBC version store latest vs parquet-log twin")
  }

  test("streaming foreachBatch JDBC upsert converges and replays cleanly") {
    // The streaming half of the external-store boundary: daily counts
    // over an event stream, each micro-batch upserted into Derby keyed
    // (campaign_id, date) — update-mode re-emits replace their day rows,
    // and a full replay from a fresh checkpoint reconverges to the same
    // table state (effectively-once on an at-least-once channel).
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val url = s"jdbc:derby:${java.nio.file.Files.createTempDirectory("graft-sjdbc")}/db;create=true"
    val schema = StructType(Seq(
      StructField("campaign_id", LongType, nullable = false),
      StructField("date", DateType, nullable = false),
      StructField("daily_count", LongType),
      StructField("rtm_delta", TimestampType)))
    Sources.createJdbcTable(url, "daily", schema, Seq("campaign_id", "date"))
    val sink = Sources.jdbcUpsertSink(url, "daily", Seq("campaign_id", "date"))
    val wave1 = Seq((1L, ts("2024-06-01 10:00:00")),
      (1L, ts("2024-06-01 11:00:00")), (2L, ts("2024-06-02 09:00:00")))
    val wave2 = Seq((1L, ts("2024-06-01 12:00:00")),  // updates day 1
      (2L, ts("2024-06-03 08:00:00")))                // new day
    // One logical stream: each wave is a drain of the SAME source under
    // the SAME checkpoint, so the windowed-agg state carries across
    // waves (the always-on service stopped and resumed).
    def drain(waves: Seq[Seq[(Long, java.sql.Timestamp)]]): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-jdbc-ckpt")
        .toString
      val ms = MemoryStream[(Long, java.sql.Timestamp)]
      waves.foreach { w =>
        ms.addData(w)
        val q = graft.streaming.StreamingDelta.upsertWriter(
          ms.toDF().toDF("campaign_id", "created_at"), null, sink,
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        try q.awaitTermination(60000) finally if (q.isActive) q.stop()
      }
    }
    drain(Seq(wave1, wave2))
    def readBack() = Sources.jdbc(spark, url, "daily", "campaign_id", 1L, 3L, 2)
      .toDF(schema.fieldNames: _*)
    val want = Seq((1L, "2024-06-01", 3L), (2L, "2024-06-02", 1L),
      (2L, "2024-06-03", 1L))
    def got() = readBack().select("campaign_id", "date", "daily_count")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
      .toSet
    assert(got() == want.toSet, s"after two waves: ${got()}")
    drain(Seq(wave1, wave2)) // full replay, fresh checkpoints
    assert(got() == want.toSet, s"after replay: ${got()}")
  }
}
