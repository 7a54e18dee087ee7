package graft

import graft.queries.Extensions
import graft.streaming.NoveltyTable
import org.apache.spark.sql.functions._

/** The maintained novelty table must be a pure SCHEDULING change against
  * one-shot t21 on the final corpus (waves arriving in id order — the
  * incremental family's standing invariant), survive a replayed
  * first-seen append (the crash window between the two commits), and
  * never rescore a document. */
class NoveltySpec extends SparkSpec {

  test("id-ordered waves ≡ one-shot t21; rescore never happens") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-nov").toString
    val corpus = s"$base/corpus"
    val fs = s"$base/first_seen"
    val log = s"$base/log"
    val docs = Tables.t(spark, src, "documents")
      .select("doc_id", "text", "lang")
    val mid = docs.agg(max("doc_id")).collect()(0).getLong(0) / 2
    docs.filter(col("doc_id") <= mid).coalesce(1)
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    val n1 = NoveltyTable.maintain(spark, corpus, fs, log)
    assert(n1 > 0)
    docs.filter(col("doc_id") > mid).coalesce(1)
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    val n2 = NoveltyTable.maintain(spark, corpus, fs, log)
    assert(n1 + n2 == docs.count())
    val oneShot = Extensions.ngramNovelty(spark, corpus).persist()
    try {
      assertSameRows(NoveltyTable.noveltyView(spark, log), oneShot,
        "maintained novelty vs one-shot t21 on the final corpus")
      // Immutability made physical: exactly one log row per doc.
      assert(spark.read.parquet(log).count() == docs.count(),
        "a document was rescored")
      // Nothing new → strict no-op.
      assert(NoveltyTable.maintain(spark, corpus, fs, log) == 0L)
      assert(NoveltyTable.compactLogs(spark, fs, log),
        "quiesced compaction must land")
      Seq(fs, log).foreach { d =>
        val n = new java.io.File(d).listFiles()
          .count(_.getName.endsWith(".parquet"))
        assert(n <= 4, s"$d not compacted: $n files")
      }
      assertSameRows(NoveltyTable.noveltyView(spark, log), oneShot,
        "compaction must not change the maintained view")
    } finally oneShot.unpersist()
  }

  test("a replayed first-seen append cannot corrupt the batch's scores") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-nov2").toString
    val corpus = s"$base/corpus"
    val fs = s"$base/first_seen"
    val log = s"$base/log"
    Seq((1L, "alpha beta gamma delta epsilon", "en"),
        (2L, "zeta eta theta iota kappa", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    assert(NoveltyTable.maintain(spark, corpus, fs, log) == 2L)
    // Wave 2: a verbatim copy of doc 1 plus a fresh doc.
    val wave2 = Seq((3L, "alpha beta gamma delta epsilon", "en"),
        (4L, "lambda mu nu xi omicron", "en"))
      .toDF("doc_id", "text", "lang")
    wave2.write.mode("append").parquet(s"$corpus/documents.parquet")
    // Simulate the crash window: the refresh appended wave 2's new
    // shingles to first-seen, then died BEFORE the novelty commit. The
    // replayed refresh must still score wave 2 correctly (min over
    // store ∪ batch is invariant to the premature rows).
    graft.queries.Extensions.shinglesOfDocs(wave2)
      .groupBy("shingle").agg(min("doc_id").as("first_doc"))
      .join(NoveltyTable.firstSeenView(spark, fs).select("shingle"),
        Seq("shingle"), "left_anti")
      .write.mode("append").parquet(fs)
    assert(NoveltyTable.maintain(spark, corpus, fs, log) == 2L)
    val got = NoveltyTable.noveltyView(spark, log).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(3L) == ((3L, 0L)), s"copy not zero-novel: $got")
    assert(got(4L) == ((3L, 3L)), s"fresh doc not fully novel: $got")
    assertSameRows(NoveltyTable.noveltyView(spark, log),
      Extensions.ngramNovelty(spark, corpus),
      "replay-converged table vs one-shot t21")
  }

  test("first-seen attribution survives a crash replayed over out-of-order arrivals") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-nov3").toString
    val corpus = s"$base/corpus"
    val fs = s"$base/first_seen"
    val log = s"$base/log"
    Seq((1L, "alpha beta gamma delta epsilon", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    assert(NoveltyTable.maintain(spark, corpus, fs, log) == 1L)
    // Wave 2: docs 10 and 11; the refresh appends first-seen (shingles
    // attributed to doc 10/11) then CRASHES before the novelty commit.
    val wave2 = Seq((10L, "omega psi chi phi upsilon", "en"),
        (11L, "sigma tau rho pi omicron", "en"))
      .toDF("doc_id", "text", "lang")
    wave2.write.mode("append").parquet(s"$corpus/documents.parquet")
    Extensions.shinglesOfDocs(wave2)
      .groupBy("shingle").agg(min("doc_id").as("first_doc"))
      .join(NoveltyTable.firstSeenView(spark, fs).select("shingle"),
        Seq("shingle"), "left_anti")
      .write.mode("append").parquet(fs)
    // Before the replay, doc 5 arrives OUT OF ID ORDER sharing doc 10's
    // shingles: the replayed batch is {5, 10, 11} and its min doc for
    // those shingles (5) is smaller than the premature store rows (10).
    Seq((5L, "omega psi chi phi upsilon", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    assert(NoveltyTable.maintain(spark, corpus, fs, log) == 3L)
    // The log attributes doc 10's shingles to doc 5 (batch min)...
    val got = NoveltyTable.noveltyView(spark, log).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(5L) == ((3L, 3L)), s"batch-min doc not credited: $got")
    assert(got(10L) == ((3L, 0L)), s"crashed doc rescored as novel: $got")
    // ...and the STORE must agree — first_doc is authoritative
    // attribution: per doc, the number of shingles the store credits to
    // it equals the log's n_novel, with no premature row left standing.
    val attrib = NoveltyTable.firstSeenView(spark, fs)
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_attr"))
    val bad = NoveltyTable.noveltyView(spark, log)
      .join(attrib, Seq("doc_id"), "left")
      .filter(coalesce(col("n_attr"), lit(0L)) =!= col("n_novel"))
    assert(bad.count() == 0,
      "store first_doc disagrees with the novelty log's attribution")
  }

  test("a smaller-id doc in a later wave cannot steal a COMPLETED refresh's attribution") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-nov4").toString
    val corpus = s"$base/corpus"
    val fs = s"$base/first_seen"
    val log = s"$base/log"
    // Wave 1 COMPLETES: doc 10 is scored, its shingles attributed to 10.
    Seq((10L, "omega psi chi phi upsilon", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    assert(NoveltyTable.maintain(spark, corpus, fs, log) == 1L)
    // Wave 2 arrives OUT OF ID ORDER: doc 5 shares doc 10's shingles
    // and adds fresh ones. Simulate the crash window — the refresh
    // appends wave 2's first-seen rows, then dies before the novelty
    // commit. The merge must NOT rewrite doc 10's completed rows to 5:
    // the log already credits 10, and a rewritten row would be excluded
    // from the replay's prior probe (first_doc in batch) — the shared
    // shingles would score novel twice.
    val wave2 = Seq((5L, "omega psi chi beta gamma", "en"))
      .toDF("doc_id", "text", "lang")
    wave2.write.mode("append").parquet(s"$corpus/documents.parquet")
    Extensions.shinglesOfDocs(wave2)
      .groupBy("shingle").agg(min("doc_id").as("first_doc"))
      .join(NoveltyTable.firstSeenView(spark, fs).select("shingle"),
        Seq("shingle"), "left_anti")
      .write.mode("append").parquet(fs)
    assert(NoveltyTable.maintain(spark, corpus, fs, log) == 1L)
    val got = NoveltyTable.noveltyView(spark, log).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "omega psi chi" overlaps doc 10 ("omega psi chi", "psi chi phi"
    // stay doc 10's); doc 5's fresh shingles are its tail two.
    assert(got(10L) == ((3L, 3L)), s"completed doc's score changed: $got")
    assert(got(5L) == ((3L, 2L)), s"later smaller-id doc mis-scored: $got")
    // Conservation: every stored shingle is novel in exactly one doc,
    // and the store's attribution equals the log's n_novel per doc.
    val attrib = NoveltyTable.firstSeenView(spark, fs)
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_attr"))
    val bad = NoveltyTable.noveltyView(spark, log)
      .join(attrib, Seq("doc_id"), "left")
      .filter(coalesce(col("n_attr"), lit(0L)) =!= col("n_novel"))
    assert(bad.count() == 0,
      "store first_doc disagrees with the novelty log's attribution")
    val totNovel = NoveltyTable.noveltyView(spark, log)
      .agg(sum("n_novel")).collect()(0).getLong(0)
    val distinctShingles = NoveltyTable.firstSeenView(spark, fs).count()
    assert(totNovel == distinctShingles,
      s"conservation broken: $totNovel novel vs $distinctShingles shingles")
  }
}
