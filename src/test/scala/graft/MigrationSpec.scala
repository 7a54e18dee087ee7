package graft

import graft.queries.Extensions
import graft.streaming.{ChunkTable, CorpusService}
import org.apache.spark.sql.functions._

/** Artifact-format migration paths: an index whose epoch predates the
  * SQ8/PQ payload sidecars must fail LOUDLY (with the rebuild
  * instruction) on code-served reads and appends — never a raw
  * missing-path error — while layout-only operations (compaction,
  * prefix serving) keep working; and a chunk log written under an older
  * tiling definition has a one-time re-chunk that converges every
  * derived artifact back to the current one-shot definition. */
class MigrationSpec extends SparkSpec {

  test("pre-SQ8/PQ index epochs fail loudly on code paths, serve fine on prefix") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-mig").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    Tables.t(spark, src, "embeddings").write.parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)
    CorpusService.drainAvailable(spark, p, index = true)
    // Simulate an index built before the SQ8/PQ payload epochs.
    Seq("_sq8", "_pq").foreach { sc =>
      val sp = new org.apache.hadoop.fs.Path(s"${p.annIndex}/$sc")
      sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(sp, true)
    }
    // Prefix serving reads only the quantizer sidecar — unaffected.
    assert(CorpusService.annTopK(spark, p).count() > 0,
      "prefix serving must survive an old payload epoch")
    // Code-served reads and appends name the fix instead of throwing a
    // raw missing-path error.
    val sq8Err = intercept[IllegalArgumentException] {
      CorpusService.annSq8TopK(spark, p).count()
    }
    assert(sq8Err.getMessage.contains("retrain-class"),
      s"SQ8 serving error must carry the rebuild instruction: $sq8Err")
    val appErr = intercept[IllegalArgumentException] {
      CorpusService.refreshAnnIndex(spark, p)
    }
    assert(appErr.getMessage.contains("retrain-class"),
      s"append error must carry the rebuild instruction: $appErr")
    // Compaction is a file-layout operation: it carries whatever
    // sidecars the epoch has and must not demand the missing ones.
    assert(Extensions.tryCompactAnnIndex(spark, p.annIndex),
      "compaction must succeed on an old-epoch index")
    assert(CorpusService.annTopK(spark, p).count() > 0,
      "prefix serving must survive compaction of an old-epoch index")
    // The documented migration: delete the index dir; refresh rebuilds
    // under the current epoch with all payloads.
    val idxPath = new org.apache.hadoop.fs.Path(p.annIndex)
    idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(idxPath, true)
    CorpusService.refreshAnnIndex(spark, p)
    assert(CorpusService.annSq8TopK(spark, p).count() > 0,
      "rebuild must restore code-served reads")
  }

  test("a flat (pre-IMI) _quantizer sidecar fails loudly with the rebuild instruction") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-mig-imi").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    Tables.t(spark, src, "embeddings").write.parquet(p.embeddings)
    CorpusService.trainQuantizer(spark, p)
    CorpusService.drainAvailable(spark, p, index = true)
    // Simulate an index whose sidecar predates the two-level quantizer:
    // the flat format was (cent_id, qc, sc) — no `sub` column.
    import spark.implicits._
    graft.jobs.Warehouse.replaceVia(spark, p.annIndex + "/_quantizer") {
      stage =>
        Seq((7L, Array(1L, 2L), 5L)).toDF("cent_id", "qc", "sc")
          .write.mode("overwrite").parquet(stage)
    }
    val err = intercept[IllegalArgumentException] {
      CorpusService.annTopK(spark, p).count()
    }
    assert(err.getMessage.contains("retrain-class") &&
      err.getMessage.contains("IMI"),
      s"flat-sidecar serving error must carry the rebuild instruction: $err")
    val appendErr = intercept[IllegalArgumentException] {
      Extensions.appendAnnIndexFrom(spark, p.annIndex,
        Extensions.quantizeFrame(
          Tables.t(spark, src, "embeddings")
            .select("vec_id", "embedding")).limit(1))
    }
    assert(appendErr.getMessage.contains("retrain-class"),
      s"flat-sidecar append error must carry the rebuild instruction: $appendErr")
  }

  test("rechunk converges an old-tiling chunk log to the current definition") {
    val src = sf("sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-mig2").toString
    val p = CorpusService.Paths(base)
    Tables.t(spark, src, "documents").select("doc_id", "text", "lang")
      .write.parquet(p.docs)
    Tables.t(spark, src, "embeddings").select("vec_id", "embedding")
      .write.parquet(p.embeddings)
    assert(CorpusService.maintainChunks(spark, p) > 0)
    // Simulate rows from an older (over-tiling) definition: redundant
    // tail windows past the current bound. Doc-grain discovery will
    // never remove them.
    val stale = ChunkTable.chunkView(spark, p.chunkLog)
      .groupBy("doc_id").agg(max("chunk_id").as("mx"))
      .select(col("doc_id"), (col("mx") + 1).cast("int").as("chunk_id"),
        lit(9L).as("n_tokens"), md5(col("doc_id").cast("string")).as("chunk_hash"))
    stale.write.mode("append").parquet(p.chunkLog)
    assert(CorpusService.maintainChunkVectors(spark, p) > 0)
    val oneShot = Extensions.chunksOfDocs(
      Tables.t(spark, base, "documents").select("doc_id", "text"))
    assert(ChunkTable.chunkView(spark, p.chunkLog).count() > oneShot.count(),
      "fixture must start with stale tail chunks")
    // The migration: log rows re-derive under the current tiling,
    // orphaned vectors drop, a chunked-but-unchanged doc stays put.
    CorpusService.rechunkCorpus(spark, p)
    assertSameRows(ChunkTable.chunkView(spark, p.chunkLog), oneShot,
      "re-chunked log vs the current one-shot definition")
    assertSameRows(
      ChunkTable.vecView(spark, p.chunkVecs)
        .select("vec_id", "doc_id", "q", "s2"),
      Extensions.chunkVectorsOf(oneShot).select("vec_id", "doc_id", "q", "s2"),
      "vector store after rechunk vs derivation over the clean log")
    assert(CorpusService.maintainChunks(spark, p) == 0L,
      "rechunk must not un-discover chunked docs")
    assert(CorpusService.maintainChunkVectors(spark, p) == 0L,
      "rechunk must leave the vector store complete")
    // Serving works end-to-end off the migrated artifacts (the index
    // was rebuilt by rechunkCorpus only if it existed; build it now).
    CorpusService.refreshChunkIndex(spark, p)
    val ext = Tables.t(spark, base, "documents").filter(col("doc_id") === 3)
      .select((col("doc_id") + 900000).as("vec_id"), col("text"))
    val top = CorpusService.chunkTopKFor(spark, p, ext)
      .filter(col("rank") === 1).collect()
    assert(top.length == 1 && top(0).getAs[Long]("max_cos_ppm") == 1000000L,
      s"chunk serving broken after migration: ${top.toSeq}")
  }
}
