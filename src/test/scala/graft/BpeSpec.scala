package graft

import graft.queries.Extensions
import org.apache.spark.sql.functions._

/** BPE tokenizer induction (t32) and BPE token counting (t33).
  *
  * Pins the three things the DuckDB oracle can't: the merge sequence on a
  * hand-computed reference corpus (the Sennrich low/lower/newest/widest
  * example), the leftmost non-overlapping GREEDY application on a run of a
  * self-pair (the case where a string-replace formulation regroups), and
  * early stop + checkpoint hygiene of the round loop.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("t32 learns the hand-computed merge sequence on the Sennrich corpus") {
    // low×5, lower×2, newest×6, widest×3 — the worked example from the
    // original BPE paper, with ties broken (count desc, (l, r) lexical).
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val (merges, fin) = Extensions.bpeTrain(d, rounds = 5)
    Extensions.freeCkpt(fin)
    assert(merges == Seq(
      (1, "e", "s", 9L),        // es/st/t</w> tie at 9 → lexical smallest
      (2, "es", "t", 9L),       // est vs t</w> tie → 'es' < 't'
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),        // lo vs ow tie at 7 → 'l' < 'o'
      (5, "lo", "w", 7L)),
      s"merge sequence diverged from the hand computation: $merges")
  }

  test("merge application is leftmost non-overlapping greedy on self-pair runs") {
    // One word 'aaaaa': round 1 merges (a,a) count 4 and MUST group as
    // [aa][aa][a], never [aa][a][aa] — the regrouping a string replace
    // (' a a ' → ' aa ') produces on runs ≥ 5 because consecutive
    // occurrences share their separator space.
    val d = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val (m1, w1) = Extensions.bpeTrain(d, rounds = 1)
    assert(m1 == Seq((1, "a", "a", 4L)))
    val seq1 = w1.select(col("seq")).as[Seq[String]].head()
    Extensions.freeCkpt(w1)
    assert(seq1 == Seq("aa", "aa", "a", "</w>"),
      s"greedy grouping broken: $seq1")
  }

  test("the round loop stops when the corpus runs out of pairs") {
    val d = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val (m, w) = Extensions.bpeTrain(d, rounds = 12)
    val fin = w.select(col("seq")).as[Seq[String]].head()
    Extensions.freeCkpt(w)
    // 5 chars + </w> = 6 symbols; round 1 applies (a,a) twice, so 4
    // merge ROUNDS fuse the word whole (6 → 4 → 3 → 2 → 1 symbols).
    assert(m == Seq((1, "a", "a", 4L), (2, "a", "</w>", 1L),
      (3, "aa", "a</w>", 1L), (4, "aa", "aaa</w>", 1L)),
      s"expected early stop after 4 rounds: $m")
    assert(fin == Seq("aaaaa</w>"), s"exhausted word not fully fused: $fin")
  }

  test("t34 off the stored tokenizer ≡ one-shot t33, and handles unseen words") {
    val dir = sf("sf0.001")
    assertSameRows(Extensions.bpeTokens(spark, dir),
      Extensions.bpeTokensStored(spark, dir),
      "stored-merge fold diverged from the trained word table")

    // The frozen artifact tokenizes words the training corpus never saw
    // — the property a stored word→seq table could not give.
    val merges = Extensions.bpeMergesAt(spark,
      Extensions.bpeVocabPath(spark, dir))
    val unseen = Seq((99L, "zzqx")).toDF("doc_id", "text")
    val out = Extensions.bpeTokensUnder(unseen, merges).head()
    assert(out.getAs[Long]("n_ws_tokens") == 1L &&
      out.getAs[Long]("n_bpe_tokens") >= 1L &&
      out.getAs[Long]("n_bpe_tokens") <= 5L,
      s"unseen word must tokenize under the frozen vocab: $out")
  }

  test("service tokenizer: served ≡ one-shot, frozen vocab covers growth, takedowns gate") {
    import graft.streaming.CorpusService
    import org.apache.spark.sql.SaveMode
    val base = java.nio.file.Files.createTempDirectory("graft-bpe-svc").toString
    val p = CorpusService.Paths(base)
    val src = Tables.t(spark, sf("sf0.001"), "documents")
    src.write.parquet(p.docs)

    // Reading before any training is a refusal, not a hidden train.
    intercept[IllegalArgumentException] {
      CorpusService.tokenCounts(spark, p)
    }

    CorpusService.refreshTokenizer(spark, p)
    assertSameRows(CorpusService.tokenCounts(spark, p),
      Extensions.bpeTokens(spark, base),
      "served token counts diverged from the one-shot t33")

    // Growth between maintenance ticks: the FROZEN vocab already serves
    // the new doc (unseen words tokenize) — no refresh needed for
    // correctness.
    Seq((900001L, "zzqx gluon zzqx", "xx", "synthetic", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Append).parquet(p.docs)
    val grownRow = CorpusService.tokenCounts(spark, p)
      .filter(col("doc_id") === 900001L).head()
    assert(grownRow.getAs[Long]("n_ws_tokens") == 3L,
      s"frozen vocab must cover post-refresh ingests: $grownRow")

    // Takedown: served counts drop the doc immediately, and the next
    // retrain must not let its text shape the vocab — the stored merge
    // table equals a train over the corpus-without-the-doc.
    CorpusService.deleteDocs(spark, p, Seq(900001L))
    assert(CorpusService.tokenCounts(spark, p)
      .filter(col("doc_id") === 900001L).count() == 0,
      "tombstoned doc still served")
    CorpusService.refreshTokenizer(spark, p)
    val (mRef, fRef) = Extensions.bpeTrain(src)
    Extensions.freeCkpt(fRef)
    assertSameRows(
      spark.read.parquet(p.bpeVocab)
        .select(col("rank"), col("lhs"), col("rhs"), col("pair_count")),
      mRef.toDF("rank", "lhs", "rhs", "pair_count"),
      "post-takedown retrain ≠ rebuild-without-the-doc")
  }

  test("tokenize(texts): request-path subword sequences ≡ driver-side fold, unseen words included") {
    import graft.streaming.CorpusService
    val base = java.nio.file.Files.createTempDirectory("graft-bpe-tok").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, sf("sf0.001"), "documents").write.parquet(p.docs)
    // Reading before any training is a refusal, not a hidden train.
    intercept[IllegalArgumentException] {
      CorpusService.tokenize(spark, p, Seq((1L, "a")).toDF("doc_id", "text"))
    }
    CorpusService.refreshTokenizer(spark, p)
    // An EXTERNAL request frame: corpus words, an unseen word, a word
    // repeated at different positions, and empty-token noise.
    val req = Seq((501L, "the zzqx the"), (502L, "gluonic  campaign"))
      .toDF("doc_id", "text")
    val got = CorpusService.tokenize(spark, p, req)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getSeq[String](3).toList))
    // Driver-side reference: the stored rank-ordered merges applied
    // leftmost non-overlapping to chars+</w> — the same fold refBpe
    // pins for training, applied as a frozen artifact.
    val merges = spark.read.parquet(p.bpeVocab)
      .orderBy("rank").collect().map(r =>
        (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    def fold(w: String): List[String] = {
      var seq: Seq[String] = w.map(_.toString) :+ "</w>"
      for ((l, r) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < seq.length) {
          if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
            out += l + r; i += 2
          } else { out += seq(i); i += 1 }
        }
        seq = out.toSeq
      }
      seq.toList
    }
    val want = Seq(
      (501L, 0, "the", fold("the")), (501L, 1, "zzqx", fold("zzqx")),
      (501L, 2, "the", fold("the")), (502L, 0, "gluonic", fold("gluonic")),
      (502L, 2, "campaign", fold("campaign")))
    assert(got.toSeq == want,
      s"served tokenization diverged from the frozen-merge fold:\n$got")
    // Subword streams reassemble the word (no token lost to the fold).
    got.foreach { case (_, _, w, subs) =>
      assert(subs.mkString == w + "</w>", s"$w -> $subs")
    }
  }

  /** Reference implementation: naive driver-side Sennrich BPE — per
    * round, count adjacent pairs weighted by word frequency, take the
    * (count desc, (l, r) lexical) argmax, apply leftmost
    * non-overlapping via an explicit index scan. The distributed
    * trainer must match this EXACTLY, merges and final sequences both. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var seqs: Map[String, Seq[String]] =
      words.keys.map(w => w -> (w.map(_.toString) :+ "</w>")).toMap
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var k = 1
    var done = false
    while (k <= rounds && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((w, seq) <- seqs; i <- 0 until seq.length - 1)
        counts((seq(i), seq(i + 1))) += words(w)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((k, l, r, c))
        seqs = seqs.map { case (w, seq) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < seq.length) {
            if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
              out += l + r; i += 2
            } else { out += seq(i); i += 1 }
          }
          w -> out.toSeq
        }
        k += 1
      }
    }
    (merges.toSeq, seqs)
  }

  test("driver-side trainer ≡ the distributed rounds (both real corpora and runs)") {
    // bpeTrain now routes under-cap word tables through the collected
    // driver loop (bpeTrainLocal); the distributed rounds remain the
    // over-cap path. Same greedy algorithm, pinned equal — merges AND
    // final tokenizations — on the sf corpus and on a run-heavy
    // fixture (self-pair runs are where a fold reformulation diverges).
    val fixtures = Seq(
      graft.Tables.t(spark, sf("sf0.001"), "documents")
        .select("doc_id", "text"),
      Seq((1L, "aaaaaaa aab bba aaaa"), (2L, "abab aaab aaaaaaa"),
        (3L, "b a ab aaaaaaa aaaaaaa")).toDF("doc_id", "text"))
    for (d <- fixtures) {
      val (mLocal, fLocal) = Extensions.bpeTrain(d, rounds = 8)
      val (mDist, fDist) = Extensions.bpeTrainDistributed(d, rounds = 8)
      assert(mLocal == mDist,
        s"merge sequences diverged\n local=$mLocal\n dist=$mDist")
      assertSameRows(fLocal, fDist, "final word tables, local vs distributed")
      Extensions.freeCkpt(fDist)
    }
  }

  test("argmax ties between supplementary-plane and BMP symbols break in UTF-8 byte order") {
    // The one place the driver loop could diverge from the distributed
    // anchor and the DuckDB oracle: Java String '<' is UTF-16
    // code-UNIT order, under which an emoji (surrogate pair, 0xD8xx
    // first unit) sorts BELOW [U+E000, U+FFFF] chars — but Spark's
    // StringType orderBy and DuckDB both compare UTF-8 BYTES (code
    // points), where the emoji (0xF0 lead byte) sorts ABOVE them.
    val pua = ""     // U+E000: UTF-16 unit E000, UTF-8 EE 80 80
    val emoji = "😀" // U+1F600: UTF-16 D83D DE00, UTF-8 F0 9F 98 80
    assert(Extensions.utf8Lt(pua, emoji), "UTF-8: U+E000 < U+1F600")
    assert(emoji < pua, "Java UTF-16 order disagrees (the bug this pins)")

    // Corpus engineered so round 3's argmax TIES between a pair led by
    // the PUA char and one led by the emoji: words {pua+x, emoji+y}
    // each count 2. Rounds 1-2 consume (x,</w>) and (y,</w>) (ASCII l
    // sorts first either way); round 3 ties (pua, x</w>) against
    // (emoji, y</w>) at count 2 and must pick the pua pair — the
    // UTF-8-smaller lhs — on BOTH paths.
    val d = Seq((1L, s"${pua}x ${pua}x ${emoji}y ${emoji}y"))
      .toDF("doc_id", "text")
    val (mLocal, fLocal) = Extensions.bpeTrain(d, rounds = 4)
    val (mDist, fDist) = Extensions.bpeTrainDistributed(d, rounds = 4)
    assert(mLocal == mDist,
      s"merge sequences diverged on the supplementary tie\n local=$mLocal\n dist=$mDist")
    assert(mLocal(2) == ((3, pua, "x</w>", 2L)),
      s"round-3 tie must go to the UTF-8-smaller (PUA) lhs, got ${mLocal(2)}")
    assertSameRows(fLocal, fDist, "final word tables, supplementary tie")
    Extensions.freeCkpt(fDist)
  }

  test("bpeTrain ≡ the reference implementation on random run-heavy corpora") {
    // Alphabet {a, b} with word lengths up to 7: maximal tie pressure on
    // the argmax and long self-pair runs ('aaaaaaa') in the apply step —
    // the two places a distributed reformulation could silently diverge.
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val vocab = Seq.fill(12)(
        (1 to (1 + rng.nextInt(7))).map(_ => if (rng.nextBoolean()) "a" else "b")
          .mkString).distinct
      val docs = (0 until 4).map { i =>
        (i.toLong, Seq.fill(25)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val d = docs.toDF("doc_id", "text")
      val freqs = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, ws) => w -> ws.size.toLong }
      val (refMerges, refSeqs) = refBpe(freqs, rounds = 8)

      val (merges, fin) = Extensions.bpeTrain(d, rounds = 8)
      val got = fin.select(col("word"), col("seq")).as[(String, Seq[String])]
        .collect().toMap
      Extensions.freeCkpt(fin)
      assert(merges == refMerges,
        s"trial $trial: merge sequences diverged\n got=$merges\n ref=$refMerges")
      assert(got == refSeqs,
        s"trial $trial: final tokenizations diverged\n got=$got\n ref=$refSeqs")
    }
  }

  test("tokenizer refresh is growth-keyed: first-tick train, no-op, 1.25x retrain") {
    import graft.streaming.CorpusService
    import org.apache.spark.sql.SaveMode
    val src = Tables.t(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-bpe-grow").toString
    val p = CorpusService.Paths(base)
    src.limit(400).write.parquet(p.docs)

    assert(CorpusService.maybeRefreshTokenizer(spark, p),
      "first maintenance tick must train")
    val v1 = spark.read.parquet(p.bpeVocab).collect().toSet

    // +10% growth: below the 1.25× key — the tick must NOT re-read the
    // corpus; the artifact stays byte-identical.
    src.filter(col("doc_id") >= 400 && col("doc_id") < 440)
      .write.mode(SaveMode.Append).parquet(p.docs)
    assert(!CorpusService.maybeRefreshTokenizer(spark, p),
      "a sub-threshold tick retrained")
    assert(spark.read.parquet(p.bpeVocab).collect().toSet == v1,
      "no-op tick changed the artifact")

    // Clear 1.25×: retrain fires and the meta re-anchors (so the NEXT
    // tick is a no-op again).
    src.filter(col("doc_id") >= 440)
      .write.mode(SaveMode.Append).parquet(p.docs)
    assert(CorpusService.maybeRefreshTokenizer(spark, p),
      "a 1.25x-grown tick did not retrain")
    assert(!CorpusService.maybeRefreshTokenizer(spark, p),
      "the re-anchored meta did not absorb the growth")
  }

  test("subword pack manifest: conserves BPE tokens, tiles exactly full packs") {
    import graft.streaming.CorpusService
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-bpe-pack").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    Tables.t(spark, src, "embeddings").write.parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)
    CorpusService.drainAvailable(spark, p)
    CorpusService.refreshTrainingSet(spark, p)
    CorpusService.refreshTokenizer(spark, p)
    CorpusService.refreshPackManifest(spark, p, subword = true)

    val m = CorpusService.packManifestView(spark, p)
    val train = CorpusService.trainingSetView(spark, p)
      .filter(col("split") === "train").select("doc_id")
    val wantToks = CorpusService.tokenCounts(spark, p)
      .join(train, "doc_id").agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(m.agg(sum("span_toks")).head().getLong(0) == wantToks,
      "subword manifest must conserve every BPE token of the train split")
    val lastPack = m.agg(max("pack_id")).head().getLong(0)
    val short = m.groupBy("pack_id").agg(sum("span_toks").as("w"))
      .filter(col("w") =!= Extensions.PackCap)
      .filter(col("pack_id") =!= lastPack)
    assert(short.count() == 0,
      "every pack but the last must be exactly full in subword units")
  }

  test("t32/t33 free their checkpoints; t33 counts are bounded by chars") {
    val dir = sf("sf0.001")
    Extensions.bpeVocab(spark, dir).count() // warm any per-dir memos
    val before = spark.sparkContext.getPersistentRDDs.size
    Extensions.bpeVocab(spark, dir).count()
    val afterVocab = spark.sparkContext.getPersistentRDDs.size
    assert(afterVocab == before,
      s"bpeVocab retained ${afterVocab - before} checkpoint RDDs")

    val t33 = Extensions.bpeTokens(spark, dir)
    val bad = t33.join(Tables.t(spark, dir, "documents"), "doc_id")
      .filter(col("n_bpe_tokens") < col("n_ws_tokens") ||
        col("n_bpe_tokens") > col("n_chars") + col("n_ws_tokens"))
    assert(bad.count() == 0,
      "per-doc BPE token count must sit in [n_words, n_chars + n_words]")
    val afterTokens = spark.sparkContext.getPersistentRDDs.size
    // Only the final word table's checkpoint (consumed by the join) may
    // remain alive per call.
    assert(afterTokens - afterVocab <= 1,
      s"bpeTokens retained ${afterTokens - afterVocab} checkpoint RDDs")
  }
}
