package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState,
  GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming variant of the 5-minute polled delta (SURVEY §2.10).
  *
  * The reference's "stream" is Airflow polling Postgres every 5 minutes
  * (track_delta.py:617-624); the idiomatic Spark shape is an event stream →
  * watermarked tumbling 1-day windows → foreachBatch upsert into the
  * version log. Semantics difference vs the batch path (documented, SURVEY
  * §7.5 #4): the watermark introduces a late-data drop horizon the
  * reference lacks — DeltaUpsert remains the exact-parity mode.
  */
object StreamingDelta {

  /** Daily counts per campaign over an event-time stream of fact rows
    * (schema: campaign_id, created_at). Update mode: each batch re-emits
    * the groups it touched, exactly the reference's re-emit-changed-days
    * behavior (track_delta.py:236-253). */
  def dailyCounts(stream: DataFrame, watermark: String = "2 days"): DataFrame =
    stream
      .withWatermark("created_at", watermark)
      .groupBy(col("campaign_id"), window(col("created_at"), "1 day"))
      .agg(count(lit(1)).as("daily_count"),
        max(col("created_at")).as("rtm_delta"))
      .select(col("campaign_id"),
        to_date(col("window.start")).as("date"),
        col("daily_count"), col("rtm_delta"))

  /** Wire the windowed aggregation into a foreachBatch upsert: each
    * micro-batch hands the changed (campaign, day) rows to `merge`, which
    * appends them to the version log (idempotent under retry because the
    * log is keyed + versioned and read via latestView). */
  def upsertWriter(stream: DataFrame, checkpointDir: String,
                   merge: (DataFrame, Long) => Unit,
                   trigger: Trigger = Trigger.ProcessingTime("5 minutes"))
      : DataStreamWriter[Row] =
    dailyCounts(stream).writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(merge)

  /** Stream-stream interval join: click events attributed to the impression
    * candidates of the same campaign at most `horizon` earlier. The
    * reference's generator delays every click 1–120 s after its impression
    * (seed.py:99), so a 2-minute horizon attributes all of them. Both sides
    * carry watermarks — Spark bounds the join state to the horizon instead
    * of buffering either stream forever, which is what makes this run
    * indefinitely at scale. Streams must have columns
    * (campaign_id, id, created_at). */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      horizon: String = "2 minutes"): DataFrame = {
    val imp = impressions.select(col("campaign_id").as("imp_campaign_id"),
        col("id").as("impression_id"), col("created_at").as("imp_ts"))
      .withWatermark("imp_ts", horizon)
    val clk = clicks.select(col("campaign_id"), col("id").as("click_id"),
        col("created_at").as("click_ts"))
      .withWatermark("click_ts", horizon)
    clk.join(imp,
        col("campaign_id") === col("imp_campaign_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"INTERVAL '$horizon'"))
      .select(col("campaign_id"), col("click_id"), col("click_ts"),
        col("impression_id"), col("imp_ts"))
  }

  /** q35's blast-radius RANGE JOIN over LIVE streams — the batch
    * bucket-decomposition (ops.Joins.rangeJoin) as a stream-stream
    * EQUI-join: each error explodes to the ≤2 fixed-width time buckets
    * its 10-minute window overlaps, events carry their single bucket,
    * and the join keys on (user, bucket) with the exact interval test
    * as the time condition — so the state store partitions by the same
    * equi key the batch shuffle does (never |errors|×|events| per
    * user), and the event-time range condition lets Spark expire both
    * sides' state at the watermark instead of buffering either stream
    * forever. Timestamp comparisons are microsecond-exact, so the
    * interval test IS the batch form's (lo, hi] test; gap_us arithmetic
    * matches q35's unix_micros grain. Streams must carry
    * (event_id, user_id, ts); same output schema as batch q35, so
    * StreamingSpec can pin streamed ≡ batch over the same rows split
    * across micro-batches. */
  def blastRadius(events: DataFrame, errors: DataFrame,
                  watermark: String = "30 minutes"): DataFrame = {
    val W = 600L * 1000000L // 10 minutes in microseconds
    val probe = events
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("bkt", expr(s"(us - pmod(us, ${W}L)) div ${W}L"))
    val errs = errors
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", watermark)
      .withColumn("err_us", unix_micros(col("err_ts")))
      .withColumn("err_bkt", explode(expr(
        s"sequence((err_us - pmod(err_us, ${W}L)) div ${W}L," +
          s" (err_us + ${W}L - pmod(err_us + ${W}L, ${W}L)) div ${W}L)")))
    probe.join(errs,
        col("user_id") === col("err_user") &&
        col("bkt") === col("err_bkt") &&
        col("ts") > col("err_ts") &&
        col("ts") <= col("err_ts") + expr("INTERVAL 10 minutes"))
      .select(col("err_id"), col("event_id"), col("user_id"),
        (col("us") - col("err_us")).as("gap_us"))
  }

  /** Per-campaign running state emitted each micro-batch. */
  case class CampaignState(campaign_id: Long, total: Long, batches: Int,
                           last_seen: Timestamp)

  /** Custom keyed state via mapGroupsWithState: a running per-campaign
    * total that survives across micro-batches (the state the reference
    * keeps in its OLAP table, held in the streaming state store instead —
    * checkpointed, versioned, recoverable). Windowed aggs can't express
    * "count of micro-batches seen" or other arbitrary transition
    * functions; this operator family can. State has no timeout here
    * because campaign cardinality is bounded; keyed event state would use
    * an event-time timeout to stay bounded. */
  def runningTotals(stream: DataFrame): Dataset[CampaignState] = {
    val sp = stream.sparkSession
    import sp.implicits._
    stream.select(col("campaign_id").cast("long"),
        col("created_at").cast("timestamp"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[CampaignState, CampaignState](
        GroupStateTimeout.NoTimeout) {
        case (campaign, rows, state: GroupState[CampaignState]) =>
          val batch = rows.toSeq
          val prev = state.getOption
            .getOrElse(CampaignState(campaign, 0L, 0, batch.head._2))
          val next = CampaignState(campaign,
            prev.total + batch.size,
            prev.batches + 1,
            (batch.map(_._2) :+ prev.last_seen).maxBy(_.getTime))
          state.update(next)
          next
      }
  }

  /** Gap-based SESSION windows over an event-time stream — q16's
    * sessionization (session_window, 30-minute gap) as a streaming
    * aggregation: the state store MERGES events into open sessions
    * across micro-batches (a session split over many batches is one
    * row), and a session finalizes exactly once when the watermark
    * passes its close (append mode — emitted sessions are immutable,
    * the contract a downstream sink wants; no re-emit churn). The
    * same (user_id, session) grain and output schema as the batch
    * q16, so StreamingSpec can pin streamed ≡ batch over the same
    * rows. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Exactly-once ingestion dedup for an at-least-once source: duplicate
    * event ids arriving within the watermark collapse to one row, and the
    * dedup state is dropped once the watermark passes (bounded memory —
    * a plain dropDuplicates on a stream would keep every id forever). */
  def dedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                           tsCol: String, watermark: String = "1 hour")
      : DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
}
