package graft

import graft.gen.Generators
import graft.jobs.{DeltaUpsert, InitialLoad}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end pipeline semantics: initial load → generator rounds → delta
  * cycles converge to the one-shot recompute (SURVEY §5.3/§5.4). */
class PipelineSpec extends SparkSpec {

  private def oltp(seed: Long, now: String) = {
    val adv = Generators.advertisers(spark, 3, now)
    val camp = Generators.campaigns(spark, 3, 2, now, seed)
    val imps = Generators.impressions(spark, 6, 50, now, seed)
    val clks = Generators.clicks(imps, 0.1, seed)
    (adv, camp, imps, clks)
  }

  test("generators reproduce the reference distributions") {
    val (adv, camp, imps, clks) = oltp(42L, Generators.DefaultNow)
    assert(adv.count() == 3 && camp.count() == 6 && imps.count() == 300)
    val names = adv.select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("Advertiser A", "Advertiser B", "Advertiser C"))
    val bidRange = camp.agg(min("bid"), max("bid")).collect()(0)
    assert(bidRange.getDecimal(0).doubleValue() >= 0.5 &&
      bidRange.getDecimal(1).doubleValue() <= 5.0)
    val period = camp.select(datediff(col("end_date"), col("start_date")).as("d"))
      .agg(min("d"), max("d")).collect()(0)
    assert(period.getInt(0) >= 7 && period.getInt(1) <= 30)
    val nClk = clks.count()
    assert(nClk > 0 && nClk < 300 * 0.3) // ~10% sample
    // clicks happen 1-120s after their impression, so all within window+120s
    assert(clks.join(imps.select(col("id"), col("created_at").as("imp_at")), "id")
      .filter(col("created_at") <= col("imp_at")).count() == 0)
  }

  test("initial load totals: daily counts sum to lifetime totals") {
    val (adv, camp, imps, clks) = oltp(42L, Generators.DefaultNow)
    val olap = InitialLoad.run(adv, camp, imps, clks, "2024-06-01")
    val dailySums = olap.impressionsDaily
      .groupBy(col("rtm_campaign_id"))
      .agg(sum("campaign_impressions_daily_count").as("s"))
    val joined = olap.advertiserCampaigns
      .join(dailySums, Seq("rtm_campaign_id"), "left")
      .filter(coalesce(col("s"), lit(0L)) =!= col("campaign_impressions_count_total"))
    assert(joined.count() == 0)
  }

  test("delta cycle: empty delta appends nothing (reference bug fixed)") {
    val (adv, camp, imps, clks) = oltp(42L, Generators.DefaultNow)
    val totals = InitialLoad.campaignTotals(adv, camp, imps, clks)
    assert(DeltaUpsert.deltaRows(totals, totals).count() == 0)
  }

  test("delta cycles converge to one-shot recompute") {
    val now1 = "2024-06-01 12:00:00"
    val now2 = "2024-06-03 12:00:00"
    val (adv, camp, imps1, clks1) = oltp(42L, now1)
    val log1 = InitialLoad.campaignTotals(adv, camp, imps1, clks1)

    // generator round: more impressions/clicks arrive later
    val imps2 = imps1.unionByName(
      Generators.impressions(spark, 6, 20, now2, 99L)
        .withColumn("id", col("id") + 1000))
    val clks2 = clks1.unionByName(
      Generators.clicks(
        Generators.impressions(spark, 6, 20, now2, 99L), 0.2, 99L)
        .withColumn("id", col("id") + 1000))

    val oltp2 = InitialLoad.campaignTotals(adv, camp, imps2, clks2)
    val (appended, latest) = DeltaUpsert.cycle(oltp2, log1)
    // keep-latest over the version log == the fresh one-shot recompute
    assertSameRows(latest, oltp2, "latest view vs recompute")
    // and the log retains history: appended >= latest rows
    assert(appended.count() >= latest.count())
  }

  test("end-to-end driver: seed → initial load → N cycles on disk") {
    val base = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val actions = jobs.Main.run(spark, base, cycles = 3, seedVal = 7L)
    assert(actions.size == 3 &&
      actions.forall(gen.DeltaActions.ActionNames.contains))
    val p = jobs.Main.Paths(base)
    // The OLAP keep-latest view converges to the one-shot recompute from
    // the final OLTP snapshot — the lifecycle-level CDC invariant.
    val st = jobs.Main.oltp(spark, p)
    val recompute = InitialLoad.campaignTotals(st.advertiser, st.campaign,
      st.impressions, st.clicks)
    val latest = DeltaUpsert.latest(jobs.Warehouse.read(spark, p.totalsLog))
    assertSameRows(latest, recompute, "latest vs one-shot recompute")
    // The incrementally-maintained totals report equals a full derivation
    // from the keep-latest view (the lifecycle-level form of the
    // WarehouseSpec equivalence).
    assertSameRows(jobs.Warehouse.read(spark, p.totalsReport),
      jobs.Reports.totalsReport(latest, "2024-06-01"),
      "incremental report vs full derive")
    // The incrementally-maintained DAILY report (campaign-grain
    // maintenance, Reports.incrementalDailyCtrReport) equals a full
    // derivation from the keep-latest daily views.
    def dailyEquivalence(totalsLatest: DataFrame, hint: String): Unit = {
      val dim = totalsLatest.select(col("rtm_advertiser_id"),
        col("rtm_campaign_id"), col("advertiser_name"),
        col("campaign_name")).distinct()
      def dailyView(path: String, what: String) = graft.ops.Core.latestView(
          jobs.Warehouse.read(spark, path),
          Seq("rtm_advertiser_id", "rtm_campaign_id", s"campaign_${what}_date"),
          "rtm_delta", tiebreak = Seq(s"campaign_${what}_daily_count"))
        .select(col("rtm_advertiser_id"), col("rtm_campaign_id"),
          col(s"campaign_${what}_date"), col(s"campaign_${what}_daily_count"))
      val clksD = dailyView(p.clksDaily, "clicks")
        .withColumnRenamed("campaign_clicks_date", "campaign_impressions_date")
      assertSameRows(jobs.Warehouse.read(spark, p.dailyCtrReport),
        jobs.Reports.dailyCtrReport(dim,
          dailyView(p.impsDaily, "impressions"), clksD), hint)
    }
    dailyEquivalence(latest, "incremental daily report vs full derive")
    // Re-running does NOT re-seed or re-initial-load (branch-on-empty):
    // the log row count only grows by the new cycles' deltas, and the
    // invariant still holds.
    jobs.Main.run(spark, base, cycles = 1, seedVal = 11L)
    val st2 = jobs.Main.oltp(spark, p)
    val latest2 = DeltaUpsert.latest(jobs.Warehouse.read(spark, p.totalsLog))
    assertSameRows(latest2,
      InitialLoad.campaignTotals(st2.advertiser, st2.campaign,
        st2.impressions, st2.clicks), "after second run")
    // The daily report stays equivalent across the process-like boundary
    // (second run maintains the first run's report incrementally).
    dailyEquivalence(latest2, "daily report after second run")
  }

  test("periodic compaction bounds the log without changing the pipeline") {
    // Twin drivers, same seed: one compacts the totals log every 2 cycles
    // (the scheduled background-merge analogue), one never does. The
    // keep-latest view — and therefore every report — must be identical;
    // only the log's physical row/file count may differ.
    val basePlain = java.nio.file.Files.createTempDirectory("graft-nc").toString
    val baseCompact = java.nio.file.Files.createTempDirectory("graft-c").toString
    jobs.Main.run(spark, basePlain, cycles = 6, seedVal = 21L)
    jobs.Main.run(spark, baseCompact, cycles = 6, seedVal = 21L,
      compactEvery = 2)
    val logPlain = jobs.Warehouse.read(spark,
      jobs.Main.Paths(basePlain).totalsLog)
    val logCompact = jobs.Warehouse.read(spark,
      jobs.Main.Paths(baseCompact).totalsLog)
    assertSameRows(DeltaUpsert.latest(logCompact), DeltaUpsert.latest(logPlain),
      "latest view with vs without compaction")
    assertSameRows(
      jobs.Warehouse.read(spark, jobs.Main.Paths(baseCompact).totalsReport),
      jobs.Warehouse.read(spark, jobs.Main.Paths(basePlain).totalsReport),
      "totals report with vs without compaction")
    // Bounded: the last compaction tick lands on cycle 6, so the log holds
    // EXACTLY one version per key (retainVersions = 1 default) while the
    // uncompacted twin kept every version ever appended.
    val keys = DeltaUpsert.latest(logCompact).count()
    assert(logCompact.count() == keys,
      s"compacted log should hold one version per key " +
        s"(${logCompact.count()} vs $keys)")
    assert(logPlain.count() > keys,
      "the uncompacted twin should have accumulated history")
  }

  test("latestView collapse is idempotent") {
    val (adv, camp, imps, clks) = oltp(7L, Generators.DefaultNow)
    val totals = InitialLoad.campaignTotals(adv, camp, imps, clks)
    val doubled = totals.unionByName(totals) // duplicate every version row
    val once = DeltaUpsert.latest(doubled)
    assertSameRows(once, DeltaUpsert.latest(once), "idempotent")
    assert(once.count() == totals.count())
  }
}
