package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LLM-data twin of jobs.Main's always-on service: one corpus store
  * (documents + their embeddings, appended in waves by an upstream
  * pipeline) continuously deduplicated at ingest on BOTH axes —
  * verbatim (StreamingDedup's minhash-banded shingle probe) and
  * semantic (StreamingSemanticDedup's cell-blocked cosine probe) — with
  * every dedup log compacted between drains. Documents and embeddings
  * stream independently (each keeps its own checkpoint), so either side
  * may run ahead; the pair views stay correct at any interleaving
  * because each probe is exact against whatever the stores hold.
  *
  * This is a composition, not new machinery: it exists so the two
  * ingest-time dedup cycles, the offline quantizer, and the log
  * compaction story run as ONE deployable lifecycle, spec-proven
  * end-to-end (CorpusServiceSpec) the way PipelineSpec proves Main's.
  *
  * 100 TB posture is inherited from the parts: signature/assignment
  * tables are fixed bytes per doc, candidate joins shuffle at
  * collision grain, corpus fetches are key joins at candidate grain,
  * and compaction bounds every log's file count between drains. */
object CorpusService {

  /** Storage layout under `base`. The corpus table dirs double as the
    * Tables-compatible dirs the one-shot batch operators read, so
    * streamed and batch results are directly comparable. */
  final case class Paths(base: String) {
    val docs = s"$base/documents.parquet"
    val embeddings = s"$base/embeddings.parquet"
    val sigs = s"$base/dedup/sigs"
    val pairs = s"$base/dedup/pairs"
    val docsCkpt = s"$base/ckpt/docs_dedup"
    val cents = s"$base/dedup/cents"
    val assigns = s"$base/dedup/assigns"
    val semPairs = s"$base/dedup/sem_pairs"
    val embCkpt = s"$base/ckpt/emb_dedup"
  }

  /** Train (or re-train, on corpus refresh) the semantic side's coarse
    * quantizer from the current corpus. Run before the first embedding
    * drain; the stream only reads the result. */
  def trainQuantizer(spark: SparkSession, p: Paths): Unit =
    StreamingSemanticDedup.trainQuantizer(spark, p.base, p.cents)

  /** Quantizer refresh for a GROWN corpus: re-derive the centroid set
    * and rebuild the assignment table (StreamingSemanticDedup.retrain's
    * epoch semantics — pair log retained, sound across epochs). Run in
    * a quiesced window: no live trigger, no concurrent drain. */
  def retrainQuantizer(spark: SparkSession, p: Paths): Unit =
    StreamingSemanticDedup.retrain(spark, p.base, p.cents, p.assigns)

  /** Drain everything currently in both stores through both dedup
    * cycles, then compact every dedup log (no live writer remains after
    * the drains, so the compaction passes must land — `require`d).
    * `maxFilesPerTrigger` bounds micro-batch size for backlogs. */
  def drainAvailable(spark: SparkSession, p: Paths,
                     maxFilesPerTrigger: Option[Int] = None,
                     compact: Boolean = true): Unit = {
    StreamingDedup.ingestAvailable(spark, p.docs, p.sigs, p.pairs, p.docsCkpt)
    StreamingSemanticDedup.ingestAvailable(spark, p.embeddings, p.cents,
      p.assigns, p.semPairs, p.embCkpt, maxFilesPerTrigger)
    if (compact) {
      require(StreamingDedup.compactLogs(spark, p.sigs, p.pairs),
        "corpus service: shingle dedup logs failed to compact post-drain")
      require(StreamingSemanticDedup.compactLogs(spark, p.assigns, p.semPairs),
        "corpus service: semantic dedup logs failed to compact post-drain")
    }
  }

  /** The two live ingest queries of an always-on corpus service. */
  final case class Running(
      docs: org.apache.spark.sql.streaming.StreamingQuery,
      embeddings: org.apache.spark.sql.streaming.StreamingQuery) {
    /** Graceful shutdown: drain whatever both stores already hold, then
      * stop — same per-stream discipline as jobs.Main.runService (a
      * failed stream's rethrow must not mask the other's shutdown), and
      * the checkpoints resume exactly-once on the next start. */
    def drainAndStop(): Unit =
      try {
        try docs.processAllAvailable()
        finally docs.stop()
      } finally {
        try embeddings.processAllAvailable()
        finally embeddings.stop()
      }
  }

  /** ALWAYS-ON form: both dedup ingesters live on a processing-time
    * trigger — every `interval`, files appended to either store since
    * the last trigger become that side's micro-batch. The caller owns
    * the lifecycle (`Running.drainAndStop`); compaction is the caller's
    * tick too (tryCoalesceLog skips cleanly if a trigger races it —
    * StreamingDedup.compactLogs / StreamingSemanticDedup.compactLogs
    * are safe to call between any two triggers). */
  def start(spark: SparkSession, p: Paths,
            interval: String = "5 minutes"): Running = {
    import org.apache.spark.sql.streaming.Trigger
    Running(
      docs = StreamingDedup.start(spark, p.docs, p.sigs, p.pairs, p.docsCkpt,
        Trigger.ProcessingTime(interval)),
      embeddings = StreamingSemanticDedup.start(spark, p.embeddings, p.cents,
        p.assigns, p.semPairs, p.embCkpt, Trigger.ProcessingTime(interval)))
  }

  /** The unified near-dup report: every discovered pair, labeled by the
    * modality that caught it ('verbatim' = shared shingles at the
    * Jaccard threshold, 'semantic' = cosine at the d05 threshold,
    * 'both' = caught by the two independently). doc_id and vec_id share
    * the id space by construction of the testdata corpus (embedding i
    * embeds document i); deployments with distinct id spaces pass a
    * mapping frame through `semIdMap`. */
  def dedupReport(spark: SparkSession, p: Paths,
                  semIdMap: Option[DataFrame] = None): DataFrame = {
    val verbatim = StreamingDedup.pairsView(spark, p.pairs)
      .select(col("doc_a"), col("doc_b"))
      .withColumn("verbatim", lit(true))
    val semRaw = StreamingSemanticDedup.pairsView(spark, p.semPairs)
    val sem0 = semIdMap.fold(semRaw) { m =>
      semRaw
        .join(m.select(col("vec_id").as("vec_a"), col("doc_id").as("da")), "vec_a")
        .join(m.select(col("vec_id").as("vec_b"), col("doc_id").as("db")), "vec_b")
        .select(col("da").as("vec_a"), col("db").as("vec_b"), col("cos_ppm"))
    }
    val semantic = sem0
      .select(least(col("vec_a"), col("vec_b")).as("doc_a"),
        greatest(col("vec_a"), col("vec_b")).as("doc_b"))
      .withColumn("semantic", lit(true))
    verbatim.join(semantic, Seq("doc_a", "doc_b"), "full_outer")
      .select(col("doc_a"), col("doc_b"),
        when(coalesce(col("verbatim"), lit(false)) &&
             coalesce(col("semantic"), lit(false)), "both")
          .when(coalesce(col("verbatim"), lit(false)), "verbatim")
          .otherwise("semantic").as("modality"))
  }
}
