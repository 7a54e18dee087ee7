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
}
