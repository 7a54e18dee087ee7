package graft

import graft.queries.Extensions
import graft.streaming.{ChunkTable, NoveltyTable, PostingTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Live-trigger parity for the maintained chunk / novelty / posting
  * tables — the same contract the three ingest-time dedup modalities
  * carry: an always-on ProcessingTime stream over the corpus store,
  * waves arriving while the trigger is live, drain-and-stop, equality
  * with the one-shot twin on the final corpus, and an exactly-once
  * re-drain on the same checkpoint that appends nothing. */
class StreamingTablesSpec extends SparkSpec {

  private def fixture(name: String) = {
    val base = java.nio.file.Files.createTempDirectory(name).toString
    val docs = Tables.t(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text", "lang")
    val mid = docs.agg(max("doc_id")).collect()(0).getLong(0) / 2
    (base, s"$base/corpus", docs, mid)
  }

  test("chunk table: live trigger, drain-and-stop, exactly-once re-drain") {
    val (base, corpus, docs, mid) = fixture("graft-chunklive")
    val store = s"$corpus/documents.parquet"
    val (log, ckpt) = (s"$base/log", s"$base/ckpt")
    docs.filter(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(store)
    val q = ChunkTable.start(spark, store, log, ckpt,
      Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") > mid).coalesce(1)
        .write.mode("append").parquet(store)
      q.processAllAvailable()
    } finally q.stop()
    assertSameRows(ChunkTable.chunkView(spark, log),
      Extensions.chunkDocs(spark, corpus),
      "live-streamed chunk table vs one-shot t25")
    val rows = spark.read.parquet(log).count()
    ChunkTable.ingestAvailable(spark, store, log, ckpt)
    assert(spark.read.parquet(log).count() == rows,
      "a checkpoint re-drain appended chunk rows")
  }

  test("novelty table: live trigger, drain-and-stop, exactly-once re-drain") {
    val (base, corpus, docs, mid) = fixture("graft-novlive")
    val store = s"$corpus/documents.parquet"
    val (fs, log, ckpt) = (s"$base/first_seen", s"$base/log", s"$base/ckpt")
    docs.filter(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(store)
    val q = NoveltyTable.start(spark, store, fs, log, ckpt,
      Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") > mid).coalesce(1)
        .write.mode("append").parquet(store)
      q.processAllAvailable()
    } finally q.stop()
    // Waves were id-ordered, so the live log must equal one-shot t21.
    assertSameRows(NoveltyTable.noveltyView(spark, log),
      Extensions.ngramNovelty(spark, corpus),
      "live-streamed novelty vs one-shot t21")
    assert(spark.read.parquet(log).count() == docs.count(),
      "a document was scored more than once")
    val fsRows = spark.read.parquet(fs).count()
    NoveltyTable.ingestAvailable(spark, store, fs, log, ckpt)
    assert(spark.read.parquet(log).count() == docs.count() &&
        spark.read.parquet(fs).count() == fsRows,
      "a checkpoint re-drain appended novelty state")
  }

  test("posting table: live trigger, drain-and-stop, exactly-once re-drain") {
    val (base, corpus, docs, mid) = fixture("graft-postlive")
    val store = s"$corpus/documents.parquet"
    val (log, ckpt) = (s"$base/log", s"$base/ckpt")
    docs.filter(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(store)
    val q = PostingTable.start(spark, store, log, ckpt,
      Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") > mid).coalesce(1)
        .write.mode("append").parquet(store)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = Tables.t(spark, corpus, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    assertSameRows(PostingTable.postingView(spark, log), oneShot,
      "live-streamed postings vs one-shot tokenization")
    val rows = spark.read.parquet(log).count()
    PostingTable.ingestAvailable(spark, store, log, ckpt)
    assert(spark.read.parquet(log).count() == rows,
      "a checkpoint re-drain appended posting rows")
  }
}
