package graft.streaming

import graft.queries.Extensions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Continuous MEDIA near-dup detection at ingest — the third streaming
  * dedup modality beside verbatim (StreamingDedup) and semantic
  * (StreamingSemanticDedup): the m04 windowed-fingerprint pairing run
  * per micro-batch, so a re-encoded / locally-edited copy of an earlier
  * payload is known when it ARRIVES, not at the next one-shot audit.
  *
  * The cycle is the leanest of the three, for a structural reason worth
  * stating: the fingerprint is a PER-DOCUMENT pure function
  * (Extensions.mediaFingerprints — no corpus-wide state like cell
  * assignments, no partner-set refetch like exact-Jaccard
  * verification), and the verification is popcount over the two stored
  * signatures themselves. So each batch:
  *
  *   1. fingerprints its payloads (one hash agg over window rows);
  *   2. banded-pigeonhole probe (Extensions.bandedFingerprints — the
  *      SAME key derivation as batch m04) of batch signatures against
  *      the persisted signature table plus the batch itself, new-new
  *      pairs gated by id order so each emits exactly once;
  *   3. exact XOR-popcount ≤ radius on the collided candidates — the
  *      corpus store is NEVER read back; 8 bytes of state per document
  *      is the entire serving surface;
  *   4. appends verified pairs, THEN the batch signatures (the same
  *      order-is-load-bearing / idempotent-append posture the other two
  *      cycles document).
  *
  * Because the signature is batch-independent and the pigeonhole is
  * deterministic, the pair log after ANY wave partition of the corpus
  * equals the one-shot batch m04 on the full corpus — not approximately
  * but row-for-row (StreamingFingerprintSpec pins it, plus exactly-once
  * re-drain and log compaction).
  *
  * 100 TB posture: state is one (doc_id, sig) row — 16 bytes — per
  * document; the probe shuffles by (band, 16-bit block) at collision
  * grain; nothing in the cycle touches more than the batch and its
  * collisions. */
object StreamingFingerprint {

  private val Bits = 64
  private val Radius = 3

  /** documents-table schema subset the fingerprint needs. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", org.apache.spark.sql.types.StringType)))

  /** One micro-batch of the cycle (also the unit the spec drives
    * directly): batch docs in, pairs + signatures appended. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   sigDir: String, pairsDir: String): Unit = {
    if (batch.isEmpty) return
    val bSig = Extensions.mediaFingerprints(
      batch.select(col("doc_id"), col("text"))).persist()
    try {
      val bb = Extensions.bandedFingerprints(bSig, Bits, Radius)
        .withColumn("is_new", lit(true))
      val tb = Extensions.bandedFingerprints(
          sigTable(spark, sigDir), Bits, Radius)
        .withColumn("is_new", lit(false))
      // Probe: batch vs (table ∪ batch). An old partner always pairs; a
      // new-new pair only in id order, so it is emitted exactly once.
      val pairs = bb.as("a")
        .join(tb.unionByName(bb).as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") =!= col("b.doc_id") &&
            (!col("b.is_new") || col("a.doc_id") < col("b.doc_id")))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
          expr("bit_count(a.sig ^ b.sig)").cast("int").as("hamming"))
        .filter(col("hamming") <= Radius)
        .distinct()
      // Order is load-bearing (recache-by-path): the pair plan reads the
      // signature table lazily, so it must be fully consumed by its
      // write BEFORE the batch signatures are appended to that path.
      pairs.write.mode(SaveMode.Append).parquet(pairsDir)
      bSig.write.mode(SaveMode.Append).parquet(sigDir)
    } finally { bSig.unpersist() }
  }

  /** Start the continuous fingerprint dedup over `corpusDir` (the
    * document store the pipeline appends to). AvailableNow =
    * drain-and-stop; a processing-time trigger is the always-on form. */
  def start(spark: SparkSession, corpusDir: String, sigDir: String,
            pairsDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(docSchema).parquet(corpusDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(spark, batch, sigDir, pairsDir)
      }
      .start()

  /** Drain all currently-available document files and stop. */
  def ingestAvailable(spark: SparkSession, corpusDir: String, sigDir: String,
                      pairsDir: String, checkpointDir: String): Unit =
    start(spark, corpusDir, sigDir, pairsDir, checkpointDir)
      .awaitTermination()

  /** The signature table view (empty-safe before the first batch; read
    * through distinct so a crash-replayed append is absorbed). */
  def sigTable(spark: SparkSession, sigDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(sigDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(sigDir).distinct()
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("sig", LongType))))
  }

  /** Bound the cycle's two append-only logs — same optimistic posture
    * as the other modalities' compactions: run between ingest cycles, a
    * racing append skips cleanly (false), next call retries. */
  def compactLogs(spark: SparkSession, sigDir: String, pairsDir: String,
                  files: Int = 4): Boolean = {
    val sigOk = graft.jobs.Warehouse.tryCoalesceLog(
      spark, sigDir, dedupRows = true, files)
    val pairsOk = graft.jobs.Warehouse.tryCoalesceLog(
      spark, pairsDir, dedupRows = true, files)
    sigOk && pairsOk
  }

  /** Keep-once view of the pair log (rows are already canonicalized
    * doc_a < doc_b; distinct absorbs crash-replay double appends). */
  def pairsView(spark: SparkSession, pairsDir: String): DataFrame =
    spark.read.parquet(pairsDir)
      .select("doc_a", "doc_b", "hamming")
      .distinct()
}
