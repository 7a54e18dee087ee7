package graft

import graft.ops.Core
import org.apache.spark.sql.functions._

/** Edge semantics pinned from the reference (SURVEY §5.2). */
class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("latestView keeps exactly the max-version row per key") {
    val log = Seq(
      (1L, "v1", 10L), (1L, "v2", 20L), (1L, "v3", 15L),
      (2L, "w1", 5L)).toDF("k", "payload", "ver")
    val got = Core.latestView(log, Seq("k"), "ver")
      .select("k", "payload").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "v2"), (2L, "w1")))
  }

  test("latestView breaks version ties deterministically via tiebreak") {
    val log = Seq((1L, "a", 10L), (1L, "b", 10L)).toDF("k", "payload", "ver")
    val got = Core.latestView(log, Seq("k"), "ver", tiebreak = Seq("payload"))
      .select("payload").as[String].collect().toList
    assert(got == List("b")) // max payload wins on equal version
  }

  test("snapshotDiff classifies added / changed / unchanged between cutoffs") {
    // Key 1: new version between the cutoffs → changed. Key 2: only old
    // versions → unchanged. Key 3: first version after cutoff A → added.
    val log = Seq(
      (1L, 10L, "old"), (1L, 30L, "new"),
      (2L, 15L, "same"),
      (3L, 25L, "late")).toDF("k", "ver", "payload")
    val got = Core.snapshotDiff(log, Seq("k"), "ver", lit(20L), lit(40L))
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged", 3L -> "added"))
  }

  test("safeDiv returns NULL on zero denominator (not inf/nan like CH)") {
    val df = Seq((10.0, 2.0), (10.0, 0.0)).toDF("n", "d")
      .select(Core.safeDiv(col("n"), col("d")).as("q"))
    assert(df.collect().map(r => Option(r.get(0))).toList ==
      List(Some(5.0), None))
  }

  test("GREATEST skips NULLs; NULL only when all inputs NULL (P3)") {
    val df = Seq((Some(3L), None: Option[Long]), (None: Option[Long], None: Option[Long]))
      .toDF("a", "b")
      .select(greatest(col("a"), col("b")).as("g"))
    assert(df.collect().map(r => Option(r.get(0))).toList ==
      List(Some(3L), None))
  }

  test("zorderKey walks the canonical Morton curve on a 4x4 grid") {
    val pts = for (y <- 0 to 3; x <- 0 to 3) yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Core.zorderKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // Standard Morton order: x bits on even positions, y bits on odd.
    val want = Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 1L, (0L, 1L) -> 2L, (1L, 1L) -> 3L,
      (2L, 0L) -> 4L, (3L, 0L) -> 5L, (2L, 1L) -> 6L, (3L, 1L) -> 7L,
      (0L, 2L) -> 8L, (1L, 2L) -> 9L, (0L, 3L) -> 10L, (1L, 3L) -> 11L,
      (2L, 2L) -> 12L, (3L, 2L) -> 13L, (2L, 3L) -> 14L, (3L, 3L) -> 15L)
    assert(got == want)
  }

  test("round2p matches HALF_UP on representable boundaries") {
    val df = Seq(0.125, 12.5, 1.0 / 3.0, 2.675).toDF("x")
      .select(Core.round2p(col("x")).as("r"))
    val got = df.as[Double].collect().toList
    // 0.125 -> 0.13 (exact binary .125 rounds away), 12.5 -> 12.5,
    // 0.333.. -> 0.33; 2.675 is binary 2.67499.. but 2.675*100 rounds to
    // exactly 267.5 in IEEE multiplication, so -> 2.68. These values pin
    // the portable semantics every engine computes identically.
    assert(got == List(0.13, 12.5, 0.33, 2.68))
  }
}
