package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The four OLTP tables as one value — the pipeline's source state,
  * passed functionally (nothing is updated in place). */
final case class OltpState(
    advertiser: DataFrame,
    campaign: DataFrame,
    impressions: DataFrame,
    clicks: DataFrame)

/** The reference's incremental random-action generator
  * (dags/generate_new_data.py:13-17,47-69): every cycle a seeded RNG
  * picks ONE of four generator actions —
  *
  *   - +1 advertiser                  (`main.py advertisers --count 1`)
  *   - +2 campaigns for advertiser 1  (`campaigns --advertiser-id 1 --count 2`)
  *   - +500 impressions for campaign 1 (`impressions --campaign-id 1 --count 500`)
  *   - clicks at ratio 0.12 for campaign 1 (`clicks --campaign-id 1 --ratio 0.12`)
  *
  * Each action yields a [[DeltaActions.Delta]] — the FRESH rows only, so a
  * storage-backed pipeline appends them (parquet Append) and an in-memory
  * one unions them ([[DeltaActions.applyDelta]]); both see identical data.
  *
  * Ids continue from each table's current max (the reference's SERIAL
  * columns); the max-id lookups are scalar aggregates — the only
  * driver-side values, same O(1) shape as the reference's `RETURNING id`.
  * Row synthesis itself is `spark.range`-distributed like Generators.
  */
object DeltaActions {

  /** One generated increment: `table` is the OLTP table to append to. */
  final case class Delta(action: String, table: String, rows: DataFrame)

  val ActionNames: Vector[String] =
    Vector("advertisers", "campaigns", "impressions", "clicks")

  private def maxId(df: DataFrame): Long = {
    val r = df.agg(max(col("id"))).head
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** +`count` advertisers with ids continuing from the current max. */
  def advertisersDelta(s: SparkSession, st: OltpState, count: Int,
                       now: String): Delta = {
    val from = maxId(st.advertiser)
    Delta("advertisers", "advertiser",
      s.range(from + 1, from + 1 + count).select(
        col("id"),
        // The reference names by letter (seed.py:25); continue the
        // alphabet cyclically past Z so names stay printable at any id.
        concat(lit("Advertiser "), expr("char(65 + (id - 1) % 26)")).as("name"),
        lit(now).cast("timestamp").as("updated_at"),
        lit(now).cast("timestamp").as("created_at")))
  }

  /** +`count` campaigns for `advertiserId`. */
  def campaignsDelta(s: SparkSession, st: OltpState, advertiserId: Long,
                     count: Int, now: String, seed: Long): Delta = {
    val from = maxId(st.campaign)
    Delta("campaigns", "campaign",
      s.range(from + 1, from + 1 + count).select(
        col("id"),
        concat(lit("Campaign_"), lit(advertiserId), lit("_"), col("id")).as("name"),
        round(rand(seed) * 4.5 + 0.5, 2).cast("decimal(10,2)").as("bid"),
        round(rand(seed + 1) * 450 + 50, 2).cast("decimal(10,2)").as("budget"),
        to_date(lit(now)).as("start_date"),
        date_add(to_date(lit(now)),
          (floor(rand(seed + 2) * 24) + 7).cast("int")).as("end_date"),
        lit(advertiserId).as("advertiser_id"),
        lit(now).cast("timestamp").as("updated_at"),
        lit(now).cast("timestamp").as("created_at")))
  }

  /** +`count` impressions for `campaignId`, timestamps uniform over the
    * trailing 7 days before `now` (seed.py:72-76). */
  def impressionsDelta(s: SparkSession, st: OltpState, campaignId: Long,
                       count: Int, now: String, seed: Long): Delta = {
    val from = maxId(st.impressions)
    Delta("impressions", "impressions",
      s.range(from + 1, from + 1 + count).select(
        col("id"),
        lit(campaignId).as("campaign_id"),
        expr(s"timestampadd(SECOND, -CAST(floor(rand($seed) * 604800) AS INT), " +
          s"CAST('$now' AS TIMESTAMP))").as("created_at")))
  }

  /** Clicks for a `ratio` sample of `campaignId`'s impressions, 1–120 s
    * after the impression, ids continuing from the clicks max. The sample
    * keys on a hash of the impression id (content-addressed, like t06's
    * split) so it is partition-order-independent, and fresh ids come from
    * the two-phase global ordinal — a per-campaign window would serialize
    * a hot campaign's whole sample through one reducer. */
  def clicksDelta(s: SparkSession, st: OltpState, campaignId: Long,
                  ratio: Double, now: String, seed: Long): Delta = {
    val from = maxId(st.clicks)
    val cut = (ratio * 1000000).toLong
    val sampled = st.impressions
      .filter(col("campaign_id") === campaignId)
      .filter(pmod(xxhash64(col("id"), lit(seed)), lit(1000000L)) < cut)
      .select(col("id").as("impression_id"), col("campaign_id"), col("created_at"))
    Delta("clicks", "clicks",
      graft.ops.Ranks.withGlobalOrdinal(sampled, "__ord", col("impression_id").asc)
        .select(
          (col("__ord") + from).as("id"),
          col("campaign_id"),
          expr("timestampadd(SECOND, CAST(pmod(impression_id * 37, 120) AS INT) + 1, " +
            "created_at)").as("created_at")))
  }

  /** Union a delta into the in-memory state (the storage-backed pipeline
    * appends `d.rows` to the `d.table` parquet dir instead). */
  def applyDelta(st: OltpState, d: Delta): OltpState = d.table match {
    case "advertiser"  => st.copy(advertiser = st.advertiser.unionByName(d.rows))
    case "campaign"    => st.copy(campaign = st.campaign.unionByName(d.rows))
    case "impressions" => st.copy(impressions = st.impressions.unionByName(d.rows))
    case "clicks"      => st.copy(clicks = st.clicks.unionByName(d.rows))
  }

  /** One cycle of the reference DAG: pick an action with the seeded RNG
    * and build its delta (generate_new_data.py:13-17's random.choice). */
  def step(s: SparkSession, st: OltpState, now: String,
           rng: scala.util.Random): Delta = {
    val seed = rng.nextLong()
    ActionNames(rng.nextInt(4)) match {
      case "advertisers" => advertisersDelta(s, st, 1, now)
      case "campaigns"   => campaignsDelta(s, st, 1L, 2, now, seed)
      case "impressions" => impressionsDelta(s, st, 1L, 500, now, seed)
      case _             => clicksDelta(s, st, 1L, 0.12, now, seed)
    }
  }
}
