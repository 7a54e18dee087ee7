package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types.StructType

/** Storage layout for the OLAP side (SURVEY S4–S8, O1).
  *
  * ClickHouse's `ORDER BY (adv, camp[, day])` clustering (initial_load…py:
  * 98,109,119) maps to: partition fact outputs by event date + sort rows
  * within each file by the cluster keys — readers prune partitions on date
  * predicates and get locality on key scans without any global sort
  * (a global orderBy would be an all-data shuffle at 100 TB).
  */
object Warehouse {

  /** S4: append new version rows to an append-only version log.
    * Idempotency comes from keyed versions + latestView reads, so a task
    * retry that double-appends is harmless (unlike the reference, where
    * XCom replay double-inserts and ReplacingMergeTree papers over it). */
  def appendVersions(df: DataFrame, path: String,
                     clusterKeys: Seq[String]): Unit =
    df.sortWithinPartitions(clusterKeys.map(col): _*)
      .write.mode(SaveMode.Append).parquet(path)

  /** Daily fact grain: partition by event date so delta cycles and report
    * reads prune to the touched days. */
  def appendDaily(df: DataFrame, path: String, dateCol: String,
                  clusterKeys: Seq[String]): Unit =
    df.repartition(col(dateCol))
      .sortWithinPartitions(clusterKeys.map(col): _*)
      .write.mode(SaveMode.Append).partitionBy(dateCol).parquet(path)

  /** S5+S7: the reference DROPs and rebuilds report tables every cycle
    * (track_delta.py:438,548); overwrite mode is the atomic equivalent. */
  def overwriteReport(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Replace a report with a frame DERIVED FROM ITSELF (incremental
    * maintenance reads the previous report): a plain overwrite would
    * delete the input files before the lazy plan reads them. Staged
    * write + swap: materialize to `path__stage` first, then swap in via
    * delete + rename (rename is atomic on HDFS-class filesystems; the
    * delete→rename gap is the same visibility gap the reference's
    * DROP TABLE + CREATE has, track_delta.py:438). */
  def replaceReport(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val stage = new org.apache.hadoop.fs.Path(path + "__stage")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    swapStageInto(fs, stage, target)
  }

  /** The delete + rename commit of a staged swap. rename reports failure
    * via its return, not an exception — a silent false would leave the
    * target missing with the data stranded in the stage dir. */
  private def swapStageInto(fs: org.apache.hadoop.fs.FileSystem,
                            stage: org.apache.hadoop.fs.Path,
                            target: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(target)) fs.delete(target, true)
    require(fs.rename(stage, target),
      s"staged swap: rename $stage -> $target failed; data is in $stage")
  }

  /** (name, mtime, length) of every direct child of `dir` — the cheap
    * change detector the staged-swap writers use to spot a concurrent
    * writer (one listStatus RPC; content hashing would re-read the log). */
  private def dirFingerprint(fs: org.apache.hadoop.fs.FileSystem,
                             dir: org.apache.hadoop.fs.Path): Set[(String, Long, Long)] =
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir)
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen)).toSet

  /** S8: reset — overwrite with an empty frame of the same schema. */
  def reset(spark: SparkSession, path: String, schema: StructType): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema).write.mode(SaveMode.Overwrite).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read a version log written across schema versions: mergeSchema unions
    * the per-file schemas, and files from before a column existed yield
    * NULL for it — additive evolution (the only kind an append-only log
    * should see) without rewriting history. Off by default on plain reads
    * because schema merging footers across 100 TB of files is an extra
    * planning cost to opt into, not a default. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** One-shot log migration for NON-additive schema changes (a column's
    * TYPE changing, e.g. the bid/budget double→decimal fix): mergeSchema
    * handles added columns but refuses incompatible types, and appending
    * rows of the new type to a directory of old-type files would poison
    * every subsequent read. Rewrites the whole log once, casting each
    * existing column to its target type (columns missing from old files
    * read as NULL), via the same staged swap replaceReport uses. Run
    * BEFORE the first new-schema append; at 100 TB this is the one-time
    * cost a type fix honestly carries — there is no lazy way to read a
    * directory mixing physical DOUBLE and DECIMAL pages.
    *
    * SINGLE-WRITER contract, enforced: the rewrite reads the log lazily
    * and commits by delete + rename, so rows appended by a concurrent
    * writer (e.g. runService's ingester on the same log) between the
    * read and the swap would be silently dropped. The directory is
    * fingerprinted before the read and re-checked after the staged
    * write materializes; a concurrent append fails the migration loudly
    * BEFORE the destructive swap, leaving the log untouched (the stage
    * dir remains for inspection). */
  def migrateLog(spark: SparkSession, path: String,
                 target: StructType): Unit = {
    val targetPath = new org.apache.hadoop.fs.Path(path)
    val stage = new org.apache.hadoop.fs.Path(path + "__stage")
    val fs = targetPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dirFingerprint(fs, targetPath)
    val old = readEvolved(spark, path)
    val casted = old.select(target.fields.map { f =>
      (if (old.columns.contains(f.name)) col(f.name)
       else org.apache.spark.sql.functions.lit(null))
        .cast(f.dataType).as(f.name)
    }.toSeq: _*)
    casted.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val after = dirFingerprint(fs, targetPath)
    require(before == after,
      s"migrateLog: $path changed during migration (concurrent writer?) — " +
        s"aborting before the swap; rewrite is parked in $stage")
    swapStageInto(fs, stage, targetPath)
  }

  /** §2.9's operational other half: version-log compaction — the engine's
    * analogue of ClickHouse's background MergeTree merges
    * (initial_load_generate_postgres_data.py:97-98, where duplicate key
    * versions collapse on merge). The append-only log + latestView gives
    * correct reads at any log length, but nothing else ever REWRITES the
    * log: without compaction every read pays a window over all versions
    * ever written and storage grows without bound. Compaction rewrites
    * the log to the newest `retainVersions` rows of each key
    * (Core.recentVersions) via the same staged swap + concurrent-writer
    * fingerprint guard migrateLog uses.
    *
    * Contract (WarehouseSpec-pinned):
    *  - latestView(compacted) ≡ latestView(original) for any retain ≥ 1;
    *  - snapshotView at any cutoff that lands within a key's RETAINED
    *    versions is preserved; cutoffs older than the retention horizon
    *    lose resolution to the oldest retained version — exactly the
    *    trade the reference's merges make, here with an explicit dial;
    *  - file count after compaction is the shuffle's output (AQE-coalesced
    *    — small logs become a handful of files), independent of how many
    *    appends built the log.
    *
    * Scale posture: one hash shuffle on `keys` — the same shape every
    * latestView read already pays, run once off the hot path instead of
    * on every read. Run it between delta cycles (single-writer window;
    * the guard aborts pre-swap if an append races it). */
  def compact(spark: SparkSession, path: String, keys: Seq[String],
              version: String, retainVersions: Int = 1,
              tiebreak: Seq[String] = Nil,
              clusterKeys: Seq[String] = Nil): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val stage = new org.apache.hadoop.fs.Path(path + "__stage")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dirFingerprint(fs, target)
    val kept = graft.ops.Core.recentVersions(
      read(spark, path), keys, version, retainVersions, tiebreak)
    val sortKeys = if (clusterKeys.nonEmpty) clusterKeys else keys
    kept.sortWithinPartitions(sortKeys.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val after = dirFingerprint(fs, target)
    require(before == after,
      s"compact: $path changed during compaction (concurrent writer?) — " +
        s"aborting before the swap; rewrite is parked in $stage")
    swapStageInto(fs, stage, target)
  }

  /** Bucketed table layout: pre-shuffle the data ONCE at write time into
    * `buckets` hash buckets on the join/aggregation keys (ClickHouse's
    * ORDER-BY-key clustering taken one step further). Two tables bucketed
    * the same way join with NO exchange on either side — at 100 TB this
    * converts every recurring fact⋈fact or log⋈log join from a full
    * shuffle into a local zip of corresponding buckets (WarehouseSpec
    * pins the exchange-free plan). Requires saveAsTable: bucket metadata
    * lives in the catalog, not the files. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Z-order clustered layout: range-partition + sort by the Morton key
    * of two dimension columns (Core.zorderKey), so every output file
    * holds a compact 2-D tile — parquet min/max stats then prune files
    * for range predicates on EITHER dimension, where a lexicographic
    * sort prunes only its leading column. The key is a scratch column,
    * dropped from the stored rows. */
  def writeZOrdered(df: DataFrame, path: String, dimX: String,
                    dimY: String, bits: Int = 16,
                    partitions: Option[Int] = None): Unit = {
    // pmod-mask both dimensions into [0, 2^bits) before interleaving
    // (matching the q28 query's Morton key): an unmasked value >= 2^bits
    // would alias distant rows into one tile and a negative value would
    // produce negative key terms — both silently degrade the clustering
    // (and the file pruning it exists for).
    val mask = lit(1L << bits)
    val keyed = df.withColumn("__z",
      graft.ops.Core.zorderKey(
        pmod(col(dimX).cast("long"), mask),
        pmod(col(dimY).cast("long"), mask), bits))
    // Explicit partition count bypasses AQE's small-shuffle coalescing so
    // the tile grain is the caller's choice (files ≈ tiles).
    val ranged = partitions match {
      case Some(n) => keyed.repartitionByRange(n, col("__z"))
      case None => keyed.repartitionByRange(col("__z"))
    }
    ranged.sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
