package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core row-level operators (SURVEY §2.2/§2.9).
  *
  * Scale posture: all of these are pure narrow projections / window ops —
  * they stay inside WholeStageCodegen and introduce no shuffle except
  * `latestView`, whose single hash-partition-by-key shuffle is the minimum
  * required for keep-latest semantics.
  */
object Core {

  /** Null-safe division: the reference inherits ClickHouse's `inf/nan` on
    * divide-by-zero (initial_load_generate_postgres_data.py:448-449); the
    * engine normalizes to NULL (SURVEY P5). */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= lit(0), num / den)

  /** ClickHouse ReplacingMergeTree keep-latest semantics (SURVEY §2.9):
    * collapse duplicate keys to the single row with the greatest version
    * (ties broken by `tiebreak` so the view is deterministic, which the
    * reference's background-merge is not — a bug we fix, not copy).
    *
    * One shuffle on `keys`; at 100 TB pre-bucket the version log by the same
    * keys so repeated latestView reads reuse the layout without reshuffling.
    */
  def latestView(df: DataFrame, keys: Seq[String], version: String,
                 tiebreak: Seq[String] = Nil): DataFrame =
    recentVersions(df, keys, version, 1, tiebreak)

  /** The `n` newest version rows of every key (latestView is n = 1).
    * This is the retention grain of log compaction: keeping n > 1 bounds
    * the log while preserving snapshotView time travel across the last
    * n versions of each key. Same single shuffle as latestView. */
  def recentVersions(df: DataFrame, keys: Seq[String], version: String,
                     n: Int, tiebreak: Seq[String] = Nil): DataFrame = {
    require(n >= 1, s"recentVersions: n must be >= 1, got $n")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(version).desc +: tiebreak.map(col(_).desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Snapshot (time-travel) read of a version log: the keep-latest view
    * AS OF `cutoff` — rows versioned after the cutoff are invisible, so
    * the view reproduces exactly what latestView returned when the log
    * ended at that version. This is the append-only log's answer to
    * warehouse time travel: no stored snapshots, any past state is a
    * filter away. The cutoff predicate sits BELOW the window, so at
    * 100 TB it prunes date-partitioned log files before any shuffle. */
  def snapshotView(df: DataFrame, keys: Seq[String], version: String,
                   cutoff: Column, tiebreak: Seq[String] = Nil): DataFrame =
    latestView(df.filter(col(version) <= cutoff), keys, version, tiebreak)

  /** Snapshot DIFF — the audit query time travel exists for: classify
    * every key by how its keep-latest row changed between two historical
    * cutoffs (`added` — absent as of A; `changed` — a different row wins
    * as of B; `unchanged`). In an append-only log keys never vanish from
    * a later snapshot, so B's keyset ⊇ A's and a left join from B
    * covers all classes ("removed" cannot exist — deletion is a new
    * version, which is `changed`). Two snapshot views + one key-grain
    * join: both sides prune their version filter below the window, so
    * at 100 TB the diff reads only the partitions up to each cutoff and
    * joins at key grain. The winning row's identity = (version,
    * tiebreak) tuple, compared null-safely. */
  def snapshotDiff(df: DataFrame, keys: Seq[String], version: String,
                   cutoffA: Column, cutoffB: Column,
                   tiebreak: Seq[String] = Nil): DataFrame = {
    val idCols = version +: tiebreak
    def side(cut: Column, tag: String) =
      snapshotView(df, keys, version, cut, tiebreak)
        .select((keys.map(col) ++ idCols.map(c => col(c).as(s"${c}_$tag"))): _*)
    side(cutoffB, "b").join(side(cutoffA, "a"), keys, "left")
      .withColumn("change",
        when(col(s"${version}_a").isNull, lit("added"))
          .when(idCols.map(c => col(s"${c}_a") <=> col(s"${c}_b"))
            .reduce(_ && _), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Per-key change-version: GREATEST over nullable timestamps (SURVEY P3,
    * track_delta.py:78). Both PG and Spark skip NULLs. */
  def changeVersion(cols: Column*): Column = greatest(cols: _*)

  /** Morton / Z-order key: interleave the low `bits` bits of two
    * non-negative dimensions (x on even bit positions, y on odd). Rows
    * sorted by this key cluster 2-D-locally, so range-partitioned files
    * carry tight min/max bounds on BOTH dimensions — parquet stats then
    * skip files for predicates on either dimension (a single-column sort
    * gives locality on one dimension only and random placement on the
    * other). This is the layout tool for the recurring
    * (campaign, day)-sliced scans at 100 TB. Pure static bit arithmetic:
    * codegen-friendly, engine-portable (the oracle spells out the same
    * 2·bits terms). */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      (shiftright(x, b) % 2) * lit(1L << (2 * b)) +
        (shiftright(y, b) % 2) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** Portable 2-decimal rounding for post-division metrics:
    * `floor(x*100 + 0.5)/100` evaluates identically on the same IEEE double
    * in every engine, unlike ROUND — Spark rounds the shortest decimal
    * representation (BigDecimal.valueOf HALF_UP) while DuckDB/ClickHouse
    * round the raw binary value, so quotients near x.xx5 flip between them.
    * Non-negative inputs only (all our ratio metrics are). */
  def round2p(c: Column): Column = floor(c * 100 + lit(0.5)) / 100
}
