package graft

import org.apache.spark.sql.functions._

/** The SQL entry point (the surface the reference's users actually write —
  * every reference query is a SQL string): Tables.registerAll exposes the
  * testdata as views, and spark.sql text produces the same rows as the
  * DataFrame API twins. */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")
  private lazy val registered = { Tables.registerAll(spark, dir); true }

  test("campaign totals via SQL text equals the DataFrame form") {
    assert(registered)
    val sql = spark.sql(
      """SELECT l_orderkey AS campaign_id, COUNT(*) AS impressions_total,
        |       COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS clicks_total,
        |       MAX(l_shipdate) AS max_at
        |FROM lineitem GROUP BY 1""".stripMargin)
    val df = Tables.t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("campaign_id"))
      .agg(count(lit(1)).as("impressions_total"),
        count(when(col("l_returnflag") === "R", 1)).as("clicks_total"),
        max(col("l_shipdate")).as("max_at"))
    assertSameRows(sql, df, "sql vs dataframe totals")
  }

  test("windowed SQL (keep-latest) equals Core.latestView") {
    assert(registered)
    val sql = spark.sql(
      """SELECT campaign_id, id, created_at FROM (
        |  SELECT l_orderkey AS campaign_id, l_linenumber AS id,
        |         l_shipdate AS created_at,
        |         row_number() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
        |  FROM lineitem) t WHERE rn = 1""".stripMargin)
    assertSameRows(sql, Parity.latestImpression(spark, dir), "sql latestView")
  }

  test("events view applies the nanos-timestamp normalization") {
    assert(registered)
    // registerAll must route events through Tables.t (ns → µs); a raw read
    // would throw PARQUET_TYPE_ILLEGAL before producing any rows
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM events WHERE ts IS NOT NULL")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  private def Parity = graft.queries.Parity
}
