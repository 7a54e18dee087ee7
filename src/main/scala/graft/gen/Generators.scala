package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic adtech data (SURVEY S10), reproducing the
  * reference generator's distributions (/root/reference/scripts/seed.py:19-106)
  * with seeded `rand` so tests are reproducible:
  *   - advertiser names "Advertiser A", "Advertiser B", … (seed.py:25)
  *   - campaign bid ∈ U[0.5, 5.0] 2dp, budget ∈ U[50, 500] 2dp,
  *     period start=today, end = start + U{7..30} days (seed.py:47-50)
  *   - impressions uniform over the trailing 7 days (seed.py:72-76)
  *   - clicks = `ratio` sample of impressions at +U{1..120} s (seed.py:97-99)
  *
  * Everything is `spark.range(n)`-based: generation is distributed and O(n/p)
  * per partition — no driver-side row loops, unlike the reference's
  * row-at-a-time INSERTs.
  */
object Generators {

  /** Fixed clock for deterministic tests (reference uses NOW()). */
  val DefaultNow = "2024-06-01 12:00:00"

  def advertisers(s: SparkSession, n: Int,
                  now: String = DefaultNow): DataFrame =
    s.range(1, n + 1).select(
      col("id"),
      concat(lit("Advertiser "), expr("char(64 + id)")).as("name"),
      lit(now).cast("timestamp").as("updated_at"),
      lit(now).cast("timestamp").as("created_at"))

  def campaigns(s: SparkSession, nAdvertisers: Int, perAdvertiser: Int,
                now: String = DefaultNow, seed: Long = 42L): DataFrame =
    s.range(1, nAdvertisers.toLong * perAdvertiser + 1).select(
      col("id"),
      expr(s"(id - 1) div $perAdvertiser + 1").as("advertiser_id"),
      (pmod(col("id") - 1, lit(perAdvertiser)) + 1).as("seq"),
      round(rand(seed) * 4.5 + 0.5, 2).cast("decimal(10,2)").as("bid"),
      round(rand(seed + 1) * 450 + 50, 2).cast("decimal(10,2)").as("budget"),
      to_date(lit(now)).as("start_date"),
      date_add(to_date(lit(now)),
        (floor(rand(seed + 2) * 24) + 7).cast("int")).as("end_date"),
      lit(now).cast("timestamp").as("updated_at"),
      lit(now).cast("timestamp").as("created_at"))
      .withColumn("name",
        concat(lit("Campaign_"), col("advertiser_id"), lit("_"), col("seq")))
      .select("id", "name", "bid", "budget", "start_date", "end_date",
        "advertiser_id", "updated_at", "created_at")

  /** `perCampaign` impressions per campaign, round-robin over campaign ids,
    * timestamps uniform over the 7 days before `now`. */
  def impressions(s: SparkSession, nCampaigns: Int, perCampaign: Int,
                  now: String = DefaultNow, seed: Long = 42L): DataFrame =
    s.range(0, nCampaigns.toLong * perCampaign).select(
      (col("id") + 1).as("id"),
      (pmod(col("id"), lit(nCampaigns)) + 1).as("campaign_id"),
      expr(s"timestampadd(SECOND, -CAST(floor(rand(${seed + 3}) * 604800) AS INT), " +
        s"CAST('$now' AS TIMESTAMP))").as("created_at"))

  /** A `ratio` sample of impressions, clicked 1–120 s after the impression. */
  def clicks(imps: DataFrame, ratio: Double, seed: Long = 42L): DataFrame =
    imps.filter(rand(seed + 4) < ratio).select(
      col("id"),
      col("campaign_id"),
      expr(s"timestampadd(SECOND, CAST(floor(rand(${seed + 5}) * 120) AS INT) + 1, " +
        "created_at)").as("created_at"))
}
