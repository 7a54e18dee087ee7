package graft

import graft.ops.Joins
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Edge semantics of the round-2 relational operators: the as-of join
  * (<= matching at equal timestamps, NULL when nothing precedes,
  * latest-wins, key isolation), the rollup gid domain, and IVF candidate
  * bounds. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val clicks = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")), // after two views → latest wins
    (2L, 10L, ts("2024-01-01 08:00:00")), // exactly at a view ts → matches it
    (3L, 20L, ts("2024-01-01 09:00:00")), // user with no views → NULL
    (4L, 30L, ts("2024-01-01 07:00:00"))  // before the user's only view → NULL
  ).toDF("click_id", "user_id", "ts")

  private lazy val views = Seq(
    (10L, ts("2024-01-01 08:00:00")),
    (10L, ts("2024-01-01 09:30:00")),
    (30L, ts("2024-01-01 08:00:00"))
  ).toDF("user_id", "ts").withColumn("view_ts", col("ts"))

  private lazy val out = Joins.asOf(clicks, views, Seq("user_id"), "ts",
      Seq("view_ts"), "matched_")
    .select("click_id", "matched_view_ts")
    .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

  test("latest at-or-before right row wins") {
    assert(out(1L).contains(ts("2024-01-01 09:30:00")))
  }

  test("a right row at exactly the left timestamp matches (<=, not <)") {
    assert(out(2L).contains(ts("2024-01-01 08:00:00")))
  }

  test("no preceding right row yields NULL, keys isolate users") {
    assert(out(3L).isEmpty, "user without views")
    assert(out(4L).isEmpty, "click before the user's only view")
    assert(out.size == 4)
  }

  test("rollup emits exactly the subtotal hierarchy (gid 0/1/3)") {
    val gids = graft.queries.Parity.rollupDaily(spark, sf("sf0.001"))
      .groupBy("gid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gids.keySet == Set(0, 1, 3), s"gid domain: $gids")
    assert(gids(3) == 1L, "exactly one grand-total row")
  }

  test("ivf candidates are a subset of cells and ranks are 1..k") {
    val rows = graft.queries.Extensions.annIvf(spark, sf("sf0.001"))
      .groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("mr"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= 5 && r.getInt(2) <= 5))
  }
}
