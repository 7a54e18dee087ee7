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
}
