package graft.streaming

import graft.jobs.Warehouse
import graft.ops.Core
import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming ingestion of the OLTP store: the parquet dir the
  * batch pipeline (jobs.Main / cli.Stats) appends to IS a Structured
  * Streaming file source, so the same storage serves both the polled
  * batch path (exact reference parity) and a continuous path with no
  * copy in between. Each new file becomes a micro-batch: watermarked
  * 1-day windows (StreamingDelta.dailyCounts) → foreachBatch append of
  * changed (campaign, day) version rows — the checkpoint makes re-runs
  * exactly-once (a processed file is never re-aggregated), and the
  * append-only log + keep-latest read make the sink idempotent under
  * retry.
  *
  * At scale this is the continuous form of track_delta: no 5-minute full
  * diff — only the days touched by new files are recomputed and
  * re-versioned. */
object FileIngest {

  private def dailyWriter(spark: SparkSession, srcDir: String,
                          logPath: String, checkpointDir: String,
                          watermark: String, trigger: Trigger,
                          maxFilesPerTrigger: Option[Int] = None) = {
    // maxFilesPerTrigger is the file source's backpressure valve: without
    // it, a backlog (first start against a year of files, or restart
    // after downtime) becomes ONE giant micro-batch that must fit in
    // memory; with it the backlog drains as bounded batches, each
    // checkpointed — same end state, bounded peak footprint.
    val reader0 = spark.readStream.schema(Schemas.event)
    val reader = maxFilesPerTrigger
      .fold(reader0)(n => reader0.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(srcDir)
      .select(col("campaign_id"), col("created_at"))
    StreamingDelta.dailyCounts(stream, watermark)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Warehouse.appendVersions(batch, logPath, Seq("campaign_id", "date"))
      }
  }

  /** Drain all currently-available files from `srcDir` into the daily
    * version log at `logPath` (Trigger.AvailableNow — run-to-completion). */
  def ingestDaily(spark: SparkSession, srcDir: String, logPath: String,
                  checkpointDir: String, watermark: String = "30 days",
                  maxFilesPerTrigger: Option[Int] = None): Unit =
    dailyWriter(spark, srcDir, logPath, checkpointDir, watermark,
      Trigger.AvailableNow(), maxFilesPerTrigger).start().awaitTermination()

  /** Always-on variant: start a PROCESSING-TIME ingester over `srcDir`
    * and return the live query — every `interval`, files that appeared
    * since the last trigger become one micro-batch. The caller owns the
    * lifecycle; the graceful shutdown sequence is
    * `processAllAvailable()` (drain whatever is already committed to the
    * store) then `stop()`, and the checkpoint makes the next start
    * resume exactly-once after the stop (jobs.Main.runService composes
    * this with the generate loop). */
  def startDailyIngest(spark: SparkSession, srcDir: String, logPath: String,
                       checkpointDir: String, interval: String = "5 minutes",
                       watermark: String = "30 days",
                       maxFilesPerTrigger: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    dailyWriter(spark, srcDir, logPath, checkpointDir, watermark,
      Trigger.ProcessingTime(interval), maxFilesPerTrigger).start()

  /** Keep-latest view of the streamed daily log; rtm_delta ties (a day's
    * count grew without moving its max timestamp) break on the monotone
    * count — same rationale as DeltaUpsert.latest. */
  def latestDaily(log: DataFrame): DataFrame =
    Core.latestView(log, Seq("campaign_id", "date"), "rtm_delta",
      tiebreak = Seq("daily_count"))

  /** The continuously-maintained daily CTR: the keep-latest views of the
    * two streamed logs joined per (campaign, day). Full outer with
    * zero-fill, because either stream can be ahead of the other for a
    * day (a click lands 1–120 s after its impression and can cross
    * midnight — seed.py:86-106; or one trigger fired before the other).
    * Day-grain join of two day-grain views: |campaigns|·|days| rows a
    * side, broadcastable at any event volume. */
  def streamedDailyCtr(impsLog: DataFrame, clicksLog: DataFrame): DataFrame = {
    val i = latestDaily(impsLog)
      .select(col("campaign_id"), col("date"),
        col("daily_count").as("daily_impressions"))
    val c = latestDaily(clicksLog)
      .select(col("campaign_id"), col("date"),
        col("daily_count").as("daily_clicks"))
    i.join(c, Seq("campaign_id", "date"), "full_outer")
      .select(col("campaign_id"), col("date"),
        coalesce(col("daily_impressions"), lit(0L)).as("daily_impressions"),
        coalesce(col("daily_clicks"), lit(0L)).as("daily_clicks"))
      .withColumn("daily_ctr",
        Core.round2p(Core.safeDiv(col("daily_clicks"),
          col("daily_impressions")) * 100))
  }
}
