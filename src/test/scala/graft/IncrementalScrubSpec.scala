package graft

import graft.queries.Extensions
import graft.streaming.IncrementalScrub
import org.apache.spark.sql.functions._

/** The incrementally maintained scrub must be a pure SCHEDULING change
  * against one-shot t19 on the final corpus — and must actually be
  * incremental: a document no delta touches is never rewritten. */
class IncrementalScrubSpec extends SparkSpec {

  test("crossing segment re-scrubs only the affected docs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-iscrub").toString
    val corpus = s"$base/corpus"
    val post = s"$base/post"
    val log = s"$base/log"
    def seg(p: String) = (1 to 10).map(i => s"$p$i").mkString(" ")
    val segX = seg("x"); val segA = seg("a"); val segB = seg("b")
    val segC = seg("c")

    // Wave 1: A carries segment X (unique so far) + its own segment;
    // B is its own segment. Everything survives (all df = 1).
    Seq((1L, s"$segX $segA", "en"), (2L, segB, "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    assert(IncrementalScrub.maintain(spark, corpus, post, log) == 2L)
    val t1 = IncrementalScrub.scrubTable(spark, log).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t1 == Map(1L -> s"$segX $segA", 2L -> segB), s"wave 1: $t1")

    // Wave 2: C arrives sharing X → X crosses df 1 → 2, so the refresh
    // rewrites exactly C (new) and A (affected) — B is untouched.
    Seq((3L, s"$segX $segC", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    assert(IncrementalScrub.maintain(spark, corpus, post, log) == 2L)
    val t2 = IncrementalScrub.scrubTable(spark, log).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t2 == Map(1L -> segA, 2L -> segB, 3L -> segC), s"wave 2: $t2")
    // The O(affected) claim made physical: B has exactly one log row.
    assert(spark.read.parquet(log).filter(col("doc_id") === 2L).count() == 1L,
      "untouched doc was rewritten")

    assertSameRows(IncrementalScrub.scrubTable(spark, log),
      Extensions.scrubbedCorpus(spark, corpus),
      "crafted maintained table vs one-shot t19")

    // Nothing new → strict no-op.
    assert(IncrementalScrub.maintain(spark, corpus, post, log) == 0L)
  }

  test("wave-maintained table ≡ one-shot t19 on real data; compaction keeps the view") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-iscrub2").toString
    val corpus = s"$base/corpus"
    val post = s"$base/post"
    val log = s"$base/log"
    val docs = Tables.t(spark, src, "documents")
      .select("doc_id", "text", "lang")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    IncrementalScrub.maintain(spark, corpus, post, log)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$corpus/documents.parquet")
    IncrementalScrub.maintain(spark, corpus, post, log)
    val oneShot = Extensions.scrubbedCorpus(spark, corpus).persist()
    try {
      assertSameRows(IncrementalScrub.scrubTable(spark, log), oneShot,
        "maintained table vs one-shot t19 on the final corpus")
      assert(IncrementalScrub.compactLogs(spark, post, log),
        "quiesced compaction must land")
      Seq(post, log).foreach { d =>
        val n = new java.io.File(d).listFiles()
          .count(_.getName.endsWith(".parquet"))
        assert(n <= 4, s"$d not compacted: $n files")
      }
      assertSameRows(IncrementalScrub.scrubTable(spark, log), oneShot,
        "compaction must not change the maintained view")
    } finally oneShot.unpersist()
  }
}
