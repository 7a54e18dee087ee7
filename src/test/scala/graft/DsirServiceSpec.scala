package graft

import graft.queries.Extensions
import graft.streaming.CorpusService
import org.apache.spark.sql.functions._

/** The maintained DSIR importance artifact (t38 as service state): a
  * FROZEN per-bucket weight table trained on the live corpus (the
  * tokenizer pattern — frozen weights score unseen documents, so refresh
  * is drift-only), growth-keyed retrain, tombstone-gated serving, and
  * delete/retrain convergence to a rebuild-without-the-docs twin. */
class DsirServiceSpec extends SparkSpec {

  private def freshService(src: String): CorpusService.Paths = {
    val base = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    p
  }

  test("served importance selection ≡ one-shot t38 on the same corpus") {
    val p = freshService(sf("sf0.001"))
    CorpusService.refreshDsirWeights(spark, p)
    assertSameRows(CorpusService.importanceSelect(spark, p),
      Extensions.dsirSelect(spark, p.base),
      "served DSIR selection vs one-shot t38")
  }

  test("weight refresh is growth-keyed: no-op below factor, retrain at 2x") {
    import spark.implicits._
    val p = freshService(sf("sf0.001"))
    assert(CorpusService.maybeRefreshDsirWeights(spark, p),
      "first call must train")
    assert(!CorpusService.maybeRefreshDsirWeights(spark, p),
      "unchanged corpus must not retrain")
    val grown = Tables.t(spark, p.base, "documents")
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    grown.write.mode("append").parquet(p.docs)
    assert(CorpusService.maybeRefreshDsirWeights(spark, p),
      "a 2x corpus must retrain")
  }

  test("scores serve docs ingested after the freeze (frozen-weights contract)") {
    import spark.implicits._
    val p = freshService(sf("sf0.001"))
    CorpusService.refreshDsirWeights(spark, p)
    val frozen = spark.read.parquet(p.dsirWeights).collect().toSet
    Seq((1000001L, "zq9 zq8 zq7 zq9 zq8", "en"))
      .toDF("doc_id", "text", "lang").write.mode("append").parquet(p.docs)
    val row = CorpusService.importanceScores(spark, p)
      .filter(col("doc_id") === 1000001L).collect()
    // The new doc is scored (under the frozen table — unseen buckets
    // contribute 0), and the artifact itself did not move.
    assert(row.length == 1, "post-freeze doc not served a score")
    assert(spark.read.parquet(p.dsirWeights).collect().toSet == frozen,
      "read path retrained the weights")
  }

  test("score-on-ingest across drains ≡ one-shot scores; idempotent; epoch-aware") {
    import spark.implicits._
    val p = freshService(sf("sf0.001"))
    val all = Tables.t(spark, p.base, "documents")
      .select("doc_id", "text", "lang").collect()
    // Rebuild the corpus store in two waves around one weight epoch.
    val (w1, w2) = all.partition(_.getLong(0) % 2 == 0)
    spark.createDataFrame(spark.sparkContext.parallelize(w1.toSeq),
        Tables.t(spark, p.base, "documents").schema)
      .write.mode("overwrite").parquet(p.docs)
    CorpusService.refreshDsirWeights(spark, p)
    // Drain 1: scores wave 1 under the frozen epoch.
    CorpusService.refreshImportanceScores(spark, p)
    // Drain 2: wave 2 arrives post-freeze; only IT is scored (O(batch)).
    spark.createDataFrame(spark.sparkContext.parallelize(w2.toSeq),
        Tables.t(spark, p.base, "documents").schema)
      .write.mode("append").parquet(p.docs)
    CorpusService.refreshImportanceScores(spark, p)
    assertSameRows(CorpusService.importanceScoresView(spark, p),
      CorpusService.importanceScores(spark, p),
      "accumulated per-drain scores vs one-shot under the same epoch")
    // Idempotent: a drain with nothing new appends nothing.
    val nFiles = new java.io.File(p.dsirScoreLog)
      .listFiles().count(_.getName.endsWith(".parquet"))
    CorpusService.refreshImportanceScores(spark, p)
    assert(new java.io.File(p.dsirScoreLog)
      .listFiles().count(_.getName.endsWith(".parquet")) == nFiles,
      "a no-op drain appended score rows")
    // A retrain mints a new epoch: stale rows stop being read, the next
    // refresh re-scores the live corpus under the new weights, and the
    // view again equals the one-shot.
    val e1 = CorpusService.dsirEpoch(spark, p)
    CorpusService.refreshDsirWeights(spark, p)
    assert(CorpusService.dsirEpoch(spark, p) == e1 + 1, "epoch not minted")
    CorpusService.refreshImportanceScores(spark, p)
    assertSameRows(CorpusService.importanceScoresView(spark, p),
      CorpusService.importanceScores(spark, p),
      "post-retrain accumulated scores vs one-shot under the new epoch")
    // The maintained selection verb rides the log: with the log
    // drained-current it must equal the rescoring form row-for-row.
    assertSameRows(CorpusService.importanceSelectMaintained(spark, p),
      CorpusService.importanceSelect(spark, p),
      "maintained selection vs rescoring selection")
  }

  test("purge is final: purged docs never re-enter the score log on later drains") {
    val p = freshService(sf("sf0.001"))
    val dels = Seq(3L, 17L, 42L)
    CorpusService.refreshDsirWeights(spark, p)
    CorpusService.refreshImportanceScores(spark, p)
    CorpusService.deleteDocs(spark, p, dels)
    assert(CorpusService.purgeTombstoned(spark, p), "purge must land")
    assert(spark.read.parquet(p.dsirScoreLog)
      .filter(col("doc_id").isin(dels: _*)).count() == 0,
      "purge left score rows behind")
    // The regression this pins: an ungated drain would see the purged
    // docs as not-yet-scored, re-read their (still-stored, tombstone-
    // gated) text, and re-append rows derived from it.
    CorpusService.refreshImportanceScores(spark, p)
    assert(spark.read.parquet(p.dsirScoreLog)
      .filter(col("doc_id").isin(dels: _*)).count() == 0,
      "a post-purge drain re-scored tombstoned docs — purge is not final")
    // And across a retrain epoch: the wholesale re-score under the new
    // weights must skip them too.
    CorpusService.refreshDsirWeights(spark, p)
    CorpusService.refreshImportanceScores(spark, p)
    assert(spark.read.parquet(p.dsirScoreLog)
      .filter(col("doc_id").isin(dels: _*)).count() == 0,
      "a post-retrain drain re-scored tombstoned docs")
  }

  test("zero-bigram docs leave the not-yet-scored set after one drain") {
    import spark.implicits._
    val p = freshService(sf("sf0.001"))
    Seq((9000001L, "solo", "en"), (9000002L, "", "en"))
      .toDF("doc_id", "text", "lang").write.mode("append").parquet(p.docs)
    CorpusService.refreshDsirWeights(spark, p)
    CorpusService.refreshImportanceScores(spark, p)
    // Marker rows landed (n_bigrams = 0, no score) …
    assert(spark.read.parquet(p.dsirScoreLog)
      .filter(col("doc_id") >= 9000000L && col("n_bigrams") === 0L)
      .count() == 2, "zero-bigram docs got no marker row")
    // … the selection plane never sees them …
    assert(CorpusService.importanceScoresView(spark, p)
      .filter(col("doc_id") >= 9000000L).count() == 0,
      "a scoreless doc surfaced in the score view")
    assertSameRows(CorpusService.importanceSelectMaintained(spark, p),
      CorpusService.importanceSelect(spark, p),
      "maintained selection with markers vs rescoring selection")
    // … and the next drain is a no-op (the O(new-docs-only) contract on
    // short-doc-heavy corpora: without markers these docs re-entered
    // the batch forever).
    val nFiles = new java.io.File(p.dsirScoreLog)
      .listFiles().count(_.getName.endsWith(".parquet"))
    CorpusService.refreshImportanceScores(spark, p)
    assert(new java.io.File(p.dsirScoreLog)
      .listFiles().count(_.getName.endsWith(".parquet")) == nFiles,
      "a drain after the marker append still re-scored zero-bigram docs")
  }

  test("deletion gates scores immediately; retrain converges to the never-ingested twin") {
    val src = sf("sf0.001")
    val dels = Seq(3L, 17L, 42L)
    val pA = freshService(src)
    CorpusService.refreshDsirWeights(spark, pA)
    CorpusService.deleteDocs(spark, pA, dels)
    assert(CorpusService.importanceScores(spark, pA)
      .filter(col("doc_id").isin(dels: _*)).count() == 0,
      "deleted docs still served an importance score")
    // The retrain (tombstone-gated on BOTH the raw and the target
    // distribution) converges weights, scores, and the selection to a
    // service that never held the docs.
    CorpusService.refreshDsirWeights(spark, pA)
    val pB = freshService(src)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .filter(!col("doc_id").isin(dels: _*))
      .write.mode("overwrite").parquet(pB.docs)
    CorpusService.refreshDsirWeights(spark, pB)
    assertSameRows(spark.read.parquet(pA.dsirWeights),
      spark.read.parquet(pB.dsirWeights),
      "post-delete retrained weights vs never-ingested twin")
    assertSameRows(CorpusService.importanceSelect(spark, pA),
      CorpusService.importanceSelect(spark, pB),
      "post-delete served selection vs never-ingested twin")
  }
}
