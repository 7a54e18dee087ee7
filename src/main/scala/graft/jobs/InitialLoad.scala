package graft.jobs

import graft.ops.{Aggregates, Core}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's initial_load DAG (§3.1,
  * dags/initial_load_generate_postgres_data.py:570-658) as ONE Spark batch
  * job over the adtech OLTP schemas (Schemas.*): no Airflow task forks, no
  * XCom row shuttling, no per-task DB round-trips — a single lineage DAG
  * that Catalyst pipelines end-to-end.
  *
  * Scale posture: facts are pre-aggregated to campaign/day grain BEFORE any
  * join (the reference's own CTE shape, also the 100 TB shape); the
  * advertiser dimension joins broadcast; outputs are version logs read via
  * Core.latestView (§2.9), never raw.
  */
object InitialLoad {

  final case class Olap(
      advertiserCampaigns: DataFrame,
      impressionsDaily: DataFrame,
      clicksDaily: DataFrame,
      totalsReport: DataFrame,
      dailyCtrReport: DataFrame)

  /** ET pipeline for campaign lifetime totals
    * (et_initial_totals_oltp, initial_load…py:150-230). Also fixes the
    * reference's missing COALESCE on the initial path (SURVEY P4). */
  def campaignTotals(advertiser: DataFrame, campaign: DataFrame,
                     impressions: DataFrame, clicks: DataFrame): DataFrame = {
    val imp = Aggregates.totalsPerCampaign(impressions, "imp_total", "max_imp_at")
    val clk = Aggregates.totalsPerCampaign(clicks, "clk_total", "max_clk_at")
    campaign.select(col("id").as("campaign_id"), col("name").as("campaign_name"),
        col("bid"), col("budget"), col("start_date"), col("end_date"),
        col("advertiser_id"), col("updated_at"), col("created_at"))
      .join(broadcast(advertiser.select(col("id").as("advertiser_id"),
        col("name").as("advertiser_name"))), Seq("advertiser_id"), "left")
      .join(imp, Seq("campaign_id"), "left")
      .join(clk, Seq("campaign_id"), "left")
      .select(
        col("advertiser_name"),
        col("campaign_name"),
        // No .cast("double"): NUMERIC(10,2) survives into the version log
        // (Schemas.advertiserCampaigns), fixing the reference's silent
        // Float64 downgrade at this boundary (initial_load…py:82-83).
        col("bid").as("campaign_bid"),
        col("budget").as("campaign_budget"),
        col("start_date").as("campaign_start_date"),
        col("end_date").as("campaign_end_date"),
        coalesce(col("imp_total"), lit(0L)).as("campaign_impressions_count_total"),
        coalesce(col("clk_total"), lit(0L)).as("campaign_clicks_count_total"),
        col("advertiser_id").as("rtm_advertiser_id"),
        col("campaign_id").as("rtm_campaign_id"),
        Core.changeVersion(col("updated_at"), col("created_at"),
          col("max_imp_at"), col("max_clk_at")).as("rtm_delta"))
  }

  /** Daily fact grain (et_initial_impressions/clicks, initial_load…py:239-323). */
  def dailyCounts(campaign: DataFrame, facts: DataFrame,
                  what: String): DataFrame =
    facts.join(campaign.select(col("id").as("campaign_id"),
        col("advertiser_id")), Seq("campaign_id"), "left")
      .groupBy(col("advertiser_id").as("rtm_advertiser_id"),
        col("campaign_id").as("rtm_campaign_id"),
        to_date(col("created_at")).as(s"campaign_${what}_date"))
      .agg(count(lit(1)).as(s"campaign_${what}_daily_count"),
        max(col("created_at")).as("rtm_delta"))

  /** The whole DAG: entity tables + both reports, derived once. */
  def run(advertiser: DataFrame, campaign: DataFrame, impressions: DataFrame,
          clicks: DataFrame, today: String): Olap = {
    val totals = campaignTotals(advertiser, campaign, impressions, clicks)
    val impsDaily = dailyCounts(campaign, impressions, "impressions")
    val clksDaily = dailyCounts(campaign, clicks, "clicks")
    val dim = totals.select(col("rtm_advertiser_id"), col("rtm_campaign_id"),
      col("advertiser_name"), col("campaign_name")).distinct()
    Olap(
      advertiserCampaigns = totals,
      impressionsDaily = impsDaily,
      clicksDaily = clksDaily,
      totalsReport = Reports.totalsReport(totals, today),
      dailyCtrReport = Reports.dailyCtrReport(dim,
        impsDaily.drop("rtm_delta"),
        clksDaily.drop("rtm_delta")
          .withColumnRenamed("campaign_clicks_date", "campaign_impressions_date")))
  }
}
