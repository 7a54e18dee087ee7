package graft

import graft.functions.Portable.h32
import graft.queries.Extensions
import org.apache.spark.sql.functions._

/** Sequence packing (t28), the leakage-safe cluster-grain split (t29),
  * and their terminal composition (t30): the pack manifest must tile the
  * concatenated token stream exactly (every pack full except the last,
  * every document's spans partitioning its tokens), the distributed
  * prefix sum must be invariant in its block decomposition (that IS the
  * claim that lets it scale past a single window partition), the
  * boundary-split arithmetic must match a hand-computed case, and the
  * cluster-grain split must co-split every near-dup pair where the
  * doc-grain content-hash split provably leaks. */
class PackSpec extends SparkSpec {

  private def docFrame(src: String) =
    Tables.t(spark, src, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))

  test("t28 tiles the token stream: full packs, per-doc span partitions") {
    val src = sf("sf0.001")
    val d = docFrame(src)
    val m = Extensions.packManifest(spark, src).cache()
    try {
      val totalToks = d.agg(sum("n_toks")).head().getLong(0)
      assert(m.agg(sum("span_toks")).head().getLong(0) == totalToks,
        "manifest must conserve every token")

      val lastPack = m.agg(max("pack_id")).head().getLong(0)
      val shortPacks = m.groupBy("pack_id")
        .agg(sum("span_toks").as("w"), min("pack_start").as("lo"),
          max(col("pack_start") + col("span_toks")).as("hi"))
        .filter(col("w") =!= Extensions.PackCap ||
          col("lo") =!= 0L || col("hi") =!= col("w"))
        .filter(col("pack_id") =!= lastPack)
      assert(shortPacks.count() == 0,
        "every pack but the last must be exactly full and contiguous")

      val badDocs = m.groupBy("doc_id")
        .agg(sum("span_toks").as("w"), min("doc_start").as("lo"),
          max(col("doc_start") + col("span_toks")).as("hi"))
        .join(d, "doc_id")
        .filter(col("w") =!= col("n_toks") || col("lo") =!= 0L ||
          col("hi") =!= col("n_toks"))
      assert(badDocs.count() == 0,
        "every document's spans must partition [0, n_toks)")
    } finally m.unpersist()
  }

  test("prefix-sum block size is invisible in the manifest") {
    val d = docFrame(sf("sf0.001"))
    val base = Extensions.packSpans(d, Extensions.PackCap, 4096L)
    assertSameRows(base, Extensions.packSpans(d, Extensions.PackCap, 1L),
      "block=1 (pure block-frame cumsum)")
    assertSameRows(base,
      Extensions.packSpans(d, Extensions.PackCap, 1L << 30),
      "one giant block (pure within-block window)")
  }

  test("boundary-crossing document splits exactly") {
    import spark.implicits._
    val d = Seq((1L, 100L), (2L, 60L), (3L, 5L)).toDF("doc_id", "n_toks")
    val got = Extensions.packSpans(d, 128L)
      .orderBy("pack_id", "pack_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L, 100L),   // doc 1 whole, opens pack 0
      (2L, 0L, 0L, 100L, 28L),  // doc 2 head fills pack 0
      (2L, 1L, 28L, 0L, 32L),   // doc 2 tail opens pack 1
      (3L, 1L, 0L, 32L, 5L)),   // doc 3 rides pack 1
      s"boundary arithmetic: $got")
  }

  test("t29 co-splits every near-dup pair; the doc-grain split leaks") {
    val src = sf("sf0.001")
    val pairs = Extensions.lshPairs(spark, src).cache()
    try {
      assert(pairs.count() > 0, "corpus must have verified near-dup pairs")

      // The doc-grain content-hash rule (t13's split) on the pair graph:
      // near-identical texts hash independently, so some pair straddles
      // splits — the leak t29 exists to close.
      val docBucket = Tables.t(spark, src, "documents")
        .select(col("doc_id"), (h32(col("text")) % 100).as("b"))
      val leaked = pairs
        .join(docBucket.select(col("doc_id").as("doc_a"), col("b").as("ba")), "doc_a")
        .join(docBucket.select(col("doc_id").as("doc_b"), col("b").as("bb")), "doc_b")
        .filter(idivBucket(col("ba")) =!= idivBucket(col("bb")))
      assert(leaked.count() > 0,
        "doc-grain hash split must provably leak on this corpus")

      val sp = Extensions.clusterSplit(spark, src)
        .select(col("doc_id"), col("split"))
      val crossSplit = pairs
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
        .filter(col("sa") =!= col("sb"))
      assert(crossSplit.count() == 0,
        "cluster-grain split must co-split every verified near-dup pair")
    } finally pairs.unpersist()
  }

  /** Bucket → split-class (0,1,2) so the leak check compares the SPLIT,
    * not the raw hash (two buckets inside train are not a leak). */
  private def idivBucket(b: org.apache.spark.sql.Column) =
    when(b < 80, 0).when(b < 90, 1).otherwise(2)

  test("service pack manifest + cluster-grain split ≡ one-shot t29/t30; deletes propagate") {
    import graft.streaming.CorpusService
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-pack").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    Tables.t(spark, src, "embeddings").write.parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)
    CorpusService.drainAvailable(spark, p)

    // The dial replaces ONLY the split column: same doc set, and the
    // split is one-shot t29's cluster-grain rule row-for-row.
    CorpusService.refreshTrainingSet(spark, p, splitAtClusterGrain = true)
    val manifest = CorpusService.trainingSetView(spark, p)
    assertSameRows(manifest.select("doc_id", "split"),
      Extensions.clusterSplit(spark, base).select("doc_id", "split")
        .join(manifest.select("doc_id"), "doc_id"),
      "maintained manifest split vs one-shot t29")

    // The packer over the maintained train split is one-shot t30.
    CorpusService.refreshPackManifest(spark, p)
    assertSameRows(CorpusService.packManifestView(spark, p),
      Extensions.trainingPacks(spark, base),
      "served pack manifest vs one-shot t30")

    // Takedown two packed docs: the refreshed manifest re-packs without
    // them — nothing deleted is served, and the stream still tiles
    // exactly (the spans close over the gap; no hole where the deleted
    // docs sat).
    val packed = CorpusService.packManifestView(spark, p)
      .select("doc_id").distinct().orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    CorpusService.deleteDocs(spark, p, packed)
    // IMMEDIATE compliance, before any refresh: the views stop serving
    // the docs' spans (the loader pads the holes until the re-pack).
    assert(CorpusService.packManifestView(spark, p)
      .filter(col("doc_id").isin(packed: _*)).count() == 0,
      "pack view served a deleted doc's spans before the re-pack")
    assert(CorpusService.trainingSetView(spark, p)
      .filter(col("doc_id").isin(packed: _*)).count() == 0,
      "manifest view enumerated a deleted doc before the refresh")
    CorpusService.refreshCanonicalCorpus(spark, p)
    CorpusService.refreshTrainingSet(spark, p, splitAtClusterGrain = true)
    CorpusService.refreshPackManifest(spark, p)
    val m2 = CorpusService.packManifestView(spark, p)
    assert(m2.filter(col("doc_id").isin(packed: _*)).count() == 0,
      "a deleted doc still has pack spans")
    val lastPack = m2.agg(max("pack_id")).head().getLong(0)
    assert(m2.groupBy("pack_id").agg(sum("span_toks").as("w"))
      .filter(col("w") =!= Extensions.PackCap && col("pack_id") =!= lastPack)
      .count() == 0,
      "post-delete pack manifest must still tile exactly")
  }

  test("t31 deals every pack to a stable shard with a fresh per-epoch order") {
    import spark.implicits._
    val src = sf("sf0.001")
    val sh = Extensions.packShards(spark, src).cache()
    try {
      val nPacks = Extensions.packManifest(spark, src)
        .select("pack_id").distinct().count()
      // Every pack appears exactly once per epoch; shards stay in range.
      assert(sh.count() == nPacks * 2, "one row per (pack, epoch)")
      assert(sh.filter(col("shard") < 0 || col("shard") >= 8).count() == 0,
        "shard out of [0, 8)")
      // Shard assignment is epoch-INVARIANT (a pack never migrates
      // between hosts mid-run) ...
      assert(sh.groupBy("pack_id")
        .agg(countDistinct("shard").as("n")).filter(col("n") =!= 1L)
        .count() == 0, "a pack changed shards across epochs")
      // ... while the visit order is epoch-FRESH: order keys collide
      // nowhere at this size, and the epoch-1 permutation of at least
      // one shard differs from epoch-0's.
      assert(sh.groupBy("epoch", "shard", "ord_key").count()
        .filter(col("count") > 1).count() == 0, "ord_key collision")
      def order(e: Long) = sh.filter(col("epoch") === e)
        .orderBy("shard", "ord_key").select("pack_id")
        .as[Long].collect().toSeq
      assert(order(0L) != order(1L),
        "epoch reshuffle produced the identical visit order")
      // Hash dealing balances token-uniform packs: no shard is empty
      // and none holds more than twice the fair share.
      val sizes = sh.filter(col("epoch") === 0L).groupBy("shard").count()
        .select("count").as[Long].collect()
      assert(sizes.length == 8 && sizes.max <= 2 * nPacks / 8,
        s"shard imbalance: ${sizes.toSeq}")
    } finally sh.unpersist()
  }

  test("t40's shard deal is parametric: stable under the count, green at two counts") {
    val src = sf("sf0.001")
    val default = Extensions.curationManifest(spark, src).cache()
    try {
      // The registered 2-arg form IS the parametric form at the default.
      assertSameRows(default,
        Extensions.curationManifest(spark, src, Extensions.CurationShards),
        "registered t40 vs parametric form at the default count")
      val at3 = Extensions.curationManifest(spark, src, 3)
      // Same spans whatever the count — only the deal column moves, and
      // it stays in range and depends on pack_id alone (t31's rule: one
      // shard per pack, never per span).
      assertSameRows(default.drop("shard"), at3.drop("shard"),
        "shard count must not perturb the pack spans")
      assert(at3.filter(col("shard") < 0 || col("shard") >= 3).count() == 0,
        "shard out of [0, 3)")
      assert(at3.groupBy("pack_id")
        .agg(countDistinct("shard").as("n")).filter(col("n") =!= 1L)
        .count() == 0, "a pack's spans straddle shards")
    } finally default.unpersist()
  }

  test("DSIR-gated maintained manifest + sharded pack ≡ one-shot t40, across a retrain and a takedown") {
    import graft.streaming.CorpusService
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-t40").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    Tables.t(spark, src, "embeddings").write.parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)
    CorpusService.drainAvailable(spark, p)

    // The full curation cadence, by hand, in its documented order:
    // weights → scores → manifest (all five gates) → sharded pack.
    def refreshChain(): Unit = {
      CorpusService.refreshImportanceScores(spark, p)
      CorpusService.refreshTrainingSet(spark, p, decontaminate = true,
        splitAtClusterGrain = true, dsirSelect = true)
      CorpusService.refreshPackManifest(spark, p,
        shardCount = Some(Extensions.CurationShards))
    }
    CorpusService.refreshDsirWeights(spark, p)
    refreshChain()
    assertSameRows(CorpusService.packManifestView(spark, p),
      Extensions.curationManifest(spark, base),
      "maintained curation pack vs one-shot t40")
    // The manifest itself carries the DSIR cut: every doc inside the
    // maintained selection's keep set, none outside it.
    assert(CorpusService.trainingSetView(spark, p)
      .join(CorpusService.importanceSelectMaintained(spark, p)
        .filter(col("keep") === 1).select("doc_id"),
        Seq("doc_id"), "left_anti").count() == 0,
      "manifest doc outside the DSIR keep set")

    // Across a RETRAIN EPOCH: new weights, wholesale re-score, re-gate,
    // re-pack — still the one-shot twin (same corpus, same selection).
    CorpusService.refreshDsirWeights(spark, p)
    refreshChain()
    assertSameRows(CorpusService.packManifestView(spark, p),
      Extensions.curationManifest(spark, base),
      "post-retrain maintained curation pack vs one-shot t40")

    // TAKEDOWN: delete two packed docs; after the refresh chain the
    // maintained pack equals one-shot t40 over a corpus that NEVER
    // held them (weights retrained tombstone-gated, purged score rows
    // never re-enter, canonical labels rebuilt).
    val dels = CorpusService.packManifestView(spark, p)
      .select("doc_id").distinct().orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    CorpusService.deleteDocs(spark, p, dels)
    CorpusService.refreshCanonicalCorpus(spark, p)
    CorpusService.refreshDsirWeights(spark, p)
    refreshChain()
    val twin = java.nio.file.Files.createTempDirectory("graft-t40twin")
      .toString
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .filter(!col("doc_id").isin(dels: _*))
      .write.parquet(s"$twin/documents.parquet")
    assertSameRows(CorpusService.packManifestView(spark, p),
      Extensions.curationManifest(spark, twin),
      "post-takedown maintained curation pack vs never-ingested twin")
  }

  test("t30 packs exactly the gated training docs") {
    val src = sf("sf0.001")
    val packsDocs = Extensions.trainingPacks(spark, src)
      .select("doc_id").distinct()
    val gated = Extensions.trainSplitToks(spark, src)
    assertSameRows(packsDocs, gated.select("doc_id"),
      "t30's doc set ≡ kept ∩ quality ∩ train")
    // Gates genuinely bite: strictly fewer docs than the corpus, and
    // no doc outside the canonical keep survives.
    val all = Tables.t(spark, src, "documents").count()
    assert(gated.count() < all, "gates must drop something at sf0.001")
    val kept = Extensions.canonicalCorpus(spark, src)
      .filter(col("is_kept") === 1).select("doc_id")
    assert(packsDocs.join(kept, Seq("doc_id"), "left_anti").count() == 0,
      "every packed doc must be its cluster's canonical")
  }
}
