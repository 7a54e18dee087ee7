package graft

import graft.streaming.StreamingDelta
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming ≡ batch: a MemoryStream replay of fact rows through the
  * windowed daily aggregation must match the batch `to_date` grouping on
  * the same rows (SURVEY §5.5). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed daily counts match batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-06-01 10:00:00")),
      (1L, ts("2024-06-01 23:59:59")),
      (1L, ts("2024-06-02 00:00:00")),
      (2L, ts("2024-06-01 12:30:00")),
      (2L, ts("2024-06-03 01:00:00")))

    val ms = MemoryStream[(Long, Timestamp)]
    ms.addData(rows: _*)
    val stream = ms.toDF().toDF("campaign_id", "created_at")

    val q = StreamingDelta.dailyCounts(stream).writeStream
      .format("memory").queryName("sd_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sd_out")
      .select("campaign_id", "date", "daily_count", "rtm_delta")
    val want = rows.toDF("campaign_id", "created_at")
      .groupBy(col("campaign_id"), to_date(col("created_at")).as("date"))
      .agg(count(lit(1)).as("daily_count"), max("created_at").as("rtm_delta"))
    assertSameRows(got, want, "stream vs batch")
  }

  test("streaming session windows merge across micro-batches and match batch q16") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val stream = ms.toDF().toDF("user_id", "ts")
    val q = StreamingDelta.sessionCounts(stream, watermark = "1 minute")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // One session split across TWO micro-batches (the state-merge
      // claim), a second user interleaved, then a far-future flush
      // event to push the watermark past every session's close.
      ms.addData((1L, ts("2024-06-01 10:00:00")), (2L, ts("2024-06-01 10:05:00")))
      q.processAllAvailable()
      ms.addData((1L, ts("2024-06-01 10:20:00")), (1L, ts("2024-06-01 10:40:00")))
      q.processAllAvailable()
      ms.addData((99L, ts("2024-06-02 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    // The flush event's own session is still open (never emitted);
    // everything else must equal the BATCH session_window aggregation
    // over the same rows — one row per session, counts merged across
    // the batch split.
    val closed = Seq(
      (1L, ts("2024-06-01 10:00:00")), (2L, ts("2024-06-01 10:05:00")),
      (1L, ts("2024-06-01 10:20:00")), (1L, ts("2024-06-01 10:40:00")))
      .toDF("user_id", "ts")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    assertSameRows(spark.table("sess_out"), closed,
      "streamed sessions vs batch sessionization")
    assert(spark.table("sess_out").filter(col("user_id") === 1L).count() == 1,
      "a cross-batch session emitted as more than one row")
  }

  test("streamed session-overlap pairs ≡ batch q36 over the closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sesspair").toString
    val sessLog = s"$base/sessions"
    val pairLog = s"$base/pairs"
    val ms = MemoryStream[(Long, Timestamp)]
    val stream = ms.toDF().toDF("user_id", "ts")
    val q = StreamingDelta.sessionCounts(stream, watermark = "1 minute")
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-sesspair-ck").toString)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.SessionOverlapTable.ingest(spark, b, sessLog, pairLog))
      .start()
    try {
      // u2's session closes a full micro-batch BEFORE u1/u3/u98's (the
      // 10:37 flush advances the watermark past only u2's close), so
      // the (u1, u2) pair must be discovered by the NEW×LOG join when
      // u1 closes later — the cross-batch case — while (u1, u3) is a
      // same-batch new-new pair. u98 grazes u1 (22 min) and u3 (23
      // min), both under the 25-minute floor.
      ms.addData((1L, ts("2024-06-01 10:00:00")), (1L, ts("2024-06-01 10:29:00")),
        (2L, ts("2024-06-01 10:05:00")))
      q.processAllAvailable()
      ms.addData((3L, ts("2024-06-01 10:30:00")), (98L, ts("2024-06-01 10:37:00")))
      q.processAllAvailable()
      ms.addData((99L, ts("2024-06-02 00:00:00")))
      q.processAllAvailable()
      ms.addData((97L, ts("2024-06-03 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    // u99's flush session closes too (the final flush triggers a
    // watermark-advance batch past its end); only u97's stays open.
    val closed = Seq(
      (1L, ts("2024-06-01 10:00:00")), (1L, ts("2024-06-01 10:29:00")),
      (2L, ts("2024-06-01 10:05:00")), (3L, ts("2024-06-01 10:30:00")),
      (98L, ts("2024-06-01 10:37:00")), (99L, ts("2024-06-02 00:00:00")))
      .toDF("user_id", "ts")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"))
    // Sanity: the log holds exactly the closed sessions (u99/u97 open).
    assertSameRows(spark.read.parquet(sessLog), closed,
      "session log vs the expected closed set")
    val got = graft.streaming.SessionOverlapTable.pairsView(spark, pairLog)
    assertSameRows(got,
      graft.queries.Parity.sessionOverlapsOf(closed),
      "streamed overlap pairs vs one-shot q36 over the closed sessions")
    assert(got.count() == 2, "expected exactly the (1,2) and (1,3) pairs")

    // Compaction: plant a crash-replayed duplicate append, compact, and
    // pin the view unchanged with the duplicates PHYSICALLY gone (the
    // signature-log convention absorbs them per read; compaction stops
    // the read cost growing with history).
    val before = graft.streaming.SessionOverlapTable
      .pairsView(spark, pairLog).collect().toSet
    spark.read.parquet(pairLog).limit(1)
      .write.mode("append").parquet(pairLog)
    assert(spark.read.parquet(pairLog).count() >
      spark.read.parquet(pairLog).distinct().count(),
      "replayed append did not create a physical duplicate (test premise)")
    assert(graft.streaming.SessionOverlapTable
      .compactLogs(spark, sessLog, pairLog), "compaction must land")
    assert(spark.read.parquet(pairLog).count() ==
      spark.read.parquet(pairLog).distinct().count(),
      "compaction left physical duplicates in the pair log")
    assert(graft.streaming.SessionOverlapTable
      .pairsView(spark, pairLog).collect().toSet == before,
      "compaction changed the pair view")
    assertSameRows(spark.read.parquet(sessLog), closed,
      "compaction changed the session log content")
  }

  test("foreachBatch upsert path delivers changed rows per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val stream = ms.toDF().toDF("campaign_id", "created_at")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val writer = StreamingDelta.upsertWriter(stream, null,
      (df, _) => seen.synchronized {
        seen ++= df.select("campaign_id", "date", "daily_count")
          .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
      },
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)

    ms.addData((1L, ts("2024-06-01 10:00:00")), (1L, ts("2024-06-01 11:00:00")))
    val q = writer.start()
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()
    assert(seen.toList == List((1L, "2024-06-01", 2L)))
  }

  test("stream-stream interval join attributes clicks within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val impMs = MemoryStream[(Long, Long, Timestamp)]
    val clkMs = MemoryStream[(Long, Long, Timestamp)]
    val cols = Seq("campaign_id", "id", "created_at")
    impMs.addData(
      (1L, 100L, ts("2024-06-01 10:00:00")), // matched by click 200 (+30s)
      (1L, 101L, ts("2024-06-01 10:05:00")), // outside horizon of any click
      (2L, 102L, ts("2024-06-01 10:00:00"))) // right campaign, no click
    clkMs.addData(
      (1L, 200L, ts("2024-06-01 10:00:30")),
      (3L, 201L, ts("2024-06-01 10:00:30"))) // campaign with no impressions
    val q = StreamingDelta.attributeClicks(
        impMs.toDF().toDF(cols: _*), clkMs.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attr_out")
      .select("click_id", "impression_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((200L, 100L)), s"got $got")
  }

  test("streaming blast-radius range join ≡ batch q35 over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val evMs = MemoryStream[(Long, Long, Timestamp)]
    val errMs = MemoryStream[(Long, Long, Timestamp)]
    val cols = Seq("event_id", "user_id", "ts")
    val q = StreamingDelta.blastRadius(
        evMs.toDF().toDF(cols: _*), errMs.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("blast_out")
      .outputMode("append").start()
    // Errors at 10:00 (user 1) and 10:07 (user 2 — its 10-minute window
    // CROSSES the 10:10 bucket boundary, the 2-bucket explode case).
    val errors = Seq(
      (900L, 1L, ts("2024-06-01 10:00:00")),
      (901L, 2L, ts("2024-06-01 10:07:00")))
    // Events: in-window, boundary-exact (+10:00 → kept, (lo, hi]),
    // just-outside, before-the-error, cross-bucket in-window (user 2 at
    // 10:12 — found only if the error explodes to the next bucket),
    // and a wrong-user decoy. Split across micro-batches.
    val events = Seq(
      (1L, 1L, ts("2024-06-01 10:00:30")),
      (2L, 1L, ts("2024-06-01 10:10:00")),
      (3L, 1L, Timestamp.valueOf("2024-06-01 10:10:00.000001")),
      (4L, 1L, ts("2024-06-01 09:59:59")),
      (5L, 2L, ts("2024-06-01 10:12:00")),
      (6L, 3L, ts("2024-06-01 10:00:30")))
    try {
      errMs.addData(errors.head)
      evMs.addData(events.take(3): _*)
      q.processAllAvailable()
      errMs.addData(errors(1))
      evMs.addData(events.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    // The batch twin: ops.Joins.rangeJoin (q35's exact shape) over the
    // same rows, one shot.
    val W = 600L * 1000000L
    val e = events.toDF(cols: _*)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val errB = errors.toDF(cols: _*)
      .select(col("event_id").as("err_id"), col("user_id"),
        unix_micros(col("ts")).as("err_us"),
        (unix_micros(col("ts")) + lit(W)).as("err_hi"))
    val batch = graft.ops.Joins.rangeJoin(e, errB,
        key = "user_id", t = "us", lo = "err_us", hi = "err_hi", bucket = W)
      .select(col("err_id"), col("event_id"), col("user_id"),
        (col("us") - col("err_us")).as("gap_us"))
    assertSameRows(spark.table("blast_out"), batch,
      "streamed blast radius vs batch range join")
    // The cross-bucket pair must actually be present (non-vacuous).
    assert(spark.table("blast_out")
      .filter(col("err_id") === 901L && col("event_id") === 5L).count() == 1,
      "cross-bucket in-window event missed by the streamed range join")
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val stream = ms.toDF().toDF("campaign_id", "created_at")
    val q = StreamingDelta.runningTotals(stream)
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      ms.addData((1L, ts("2024-06-01 10:00:00")), (1L, ts("2024-06-01 10:01:00")),
        (2L, ts("2024-06-01 10:02:00")))
      q.processAllAvailable()
      ms.addData((1L, ts("2024-06-01 11:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    // update-mode memory sink keeps every emitted version; the last row
    // per key is the accumulated state
    val last = spark.table("state_out")
      .groupBy("campaign_id")
      .agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct("total", "batches"),
        org.apache.spark.sql.functions.col("batches")).as("s"))
      .select("campaign_id", "s.total", "s.batches").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(last == Set((1L, 3L, 2), (2L, 1L, 1)), s"got $last")
  }

  test("dropDuplicatesWithinWatermark collapses replayed event ids") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val stream = ms.toDF().toDF("event_id", "ts")
    val q = StreamingDelta.dedupWithinWatermark(stream, Seq("event_id"), "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData((1L, ts("2024-06-01 10:00:00")), (2L, ts("2024-06-01 10:00:05")))
      q.processAllAvailable()
      // at-least-once replay: id 1 arrives again in a later micro-batch
      ms.addData((1L, ts("2024-06-01 10:00:00")), (3L, ts("2024-06-01 10:00:10")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_out").select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"got $ids")
  }
}
