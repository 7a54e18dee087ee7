package graft

import graft.ops.{Core, Joins}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.3) over scalacheck-generated data:
  * latestView keep-max + idempotence, Σ(daily) = lifetime totals, and the
  * as-of join's equivalence to its O(n·m) reference definition. Gens are
  * sampled with fixed seeds (no scalatestplus bridge in the offline dep
  * set), so failures reproduce exactly. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val baseMs = Timestamp.valueOf("2024-06-01 00:00:00").getTime

  /** (key, offset) rows — small domains force collisions. */
  private val versionedRows: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 50L)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("latestView keeps the max version per key and is idempotent") {
    samples(versionedRows, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.map { case (k, off) =>
        (k, new Timestamp(baseMs + off * 1000), off)
      }.toDF("k", "v", "off")
      val latest = Core.latestView(df, Seq("k"), "v", tiebreak = Seq("off"))
      val expectMax = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val got = latest.select("k", "off").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expectMax.toMap, s"got $got want $expectMax")
      assertSameRows(Core.latestView(latest, Seq("k"), "v",
        tiebreak = Seq("off")), latest, "idempotence")
    }
  }

  test("daily counts sum to lifetime totals per key") {
    samples(versionedRows, 8).filter(_.nonEmpty).foreach { rows =>
      val df = rows.map { case (k, off) =>
        (k, new Timestamp(baseMs + off * 3600 * 1000))
      }.toDF("campaign_id", "created_at")
      val fromDaily = df.groupBy(col("campaign_id"),
          to_date(col("created_at")).as("d"))
        .agg(count(lit(1)).as("n"))
        .groupBy("campaign_id").agg(sum("n").as("total")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val direct = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(fromDaily == direct.toMap)
    }
  }

  test("random actions + delta cycles converge to one-shot recompute") {
    // The reference's generate_new_data loop (random action every cycle)
    // followed by track_delta each time: whatever the action sequence, the
    // keep-latest view of the append-only log must equal the one-shot
    // recompute from the final OLTP state.
    import graft.gen.{DeltaActions, Generators, OltpState}
    import graft.jobs.{DeltaUpsert, InitialLoad}
    for (seed <- Seq(1L, 2L, 3L)) {
      val now0 = Generators.DefaultNow
      val imps = Generators.impressions(spark, 4, 30, now0, seed)
      var st = OltpState(
        Generators.advertisers(spark, 2, now0),
        Generators.campaigns(spark, 2, 2, now0, seed),
        imps,
        Generators.clicks(imps, 0.1, seed))
      var log = InitialLoad.campaignTotals(st.advertiser, st.campaign,
        st.impressions, st.clicks)
      val rng = new scala.util.Random(seed)
      for (i <- 1 to 4) {
        val now = s"2024-06-01 12:0$i:00"
        val delta = DeltaActions.step(spark, st, now, rng)
        st = DeltaActions.applyDelta(st, delta)
        val totals = InitialLoad.campaignTotals(st.advertiser, st.campaign,
          st.impressions, st.clicks)
        log = DeltaUpsert.cycle(totals, log)._1
      }
      val recompute = InitialLoad.campaignTotals(st.advertiser, st.campaign,
        st.impressions, st.clicks)
      assertSameRows(DeltaUpsert.latest(log), recompute, s"seed $seed")
    }
  }

  private val asofRows: Gen[(List[(Long, Long)], List[(Long, Long)])] =
    Gen.zip(
      Gen.listOfN(25, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 40L))),
      Gen.listOfN(25, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 40L))))

  test("asOf equals the per-row max-at-or-before reference definition") {
    samples(asofRows, 8).filter(_._1.nonEmpty).foreach {
      case (leftRaw, rightRaw) =>
        val left = leftRaw.zipWithIndex.map { case ((k, off), i) =>
          (i.toLong, k, new Timestamp(baseMs + off * 1000))
        }.toDF("row_id", "k", "ts")
        val right = rightRaw.map { case (k, off) =>
          (k, new Timestamp(baseMs + off * 1000))
        }.toDF("k", "ts").withColumn("r_ts", col("ts"))
        val got = Joins.asOf(left, right, Seq("k"), "ts", Seq("r_ts"))
          .select("row_id", "asof_r_ts").collect()
          .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
        val rightByKey = rightRaw.groupBy(_._1)
        val want = leftRaw.zipWithIndex.map { case ((k, off), i) =>
          val candidates = rightByKey.getOrElse(k, Nil)
            .map(_._2).filter(_ <= off)
          i.toLong -> (if (candidates.isEmpty) None
            else Some(new Timestamp(baseMs + candidates.max * 1000)))
        }.toMap
        assert(got == want, s"got $got\nwant $want")
    }
  }

  /** Random token streams for the gram kernels: tokens drawn from a
    * SMALL alphabet (forces duplicate windows), empty tokens included
    * (double/leading/trailing spaces), occasional multi-byte tokens.
    * Joined with single spaces — the repo-wide tokenizer contract. */
  private val tokenTexts: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", "cc", "", "汉", "tok", "x"))
      .map(_.mkString(" "))

  test("distinct-gram kernel ≡ exploded+distinct on random token streams") {
    // The byte-scan kernel (one pass, LinkedHashSet dedup) against the
    // independent transform+explode+DISTINCT implementation, at every
    // gram width the engine uses (3 = shingles, 8 = contamination
    // grams, 30 = substring windows) — scalacheck streams where the
    // curated edge docs in DedupSpec can't reach (e.g. runs of empty
    // tokens longer than the window).
    val texts = samples(tokenTexts, 120).distinct
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en") }
      .toDF("doc_id", "text", "lang")
    for (n <- Seq(3, 8, 30)) {
      val kernel = df.select(col("doc_id"),
        explode(graft.functions.DistinctGrams(col("text"), n)).as("gram"))
      val exploded = df
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), explode(expr(
          s"""CASE WHEN size(t) < $n THEN CAST(array() AS array<string>)
             |ELSE transform(sequence(0, size(t) - $n),
             |               i -> concat_ws(' ', slice(t, i + 1, $n))) END"""
            .stripMargin)).as("gram"))
        .distinct()
      assertSameRows(kernel, exploded, s"distinct $n-grams, random streams")
    }
  }
}
