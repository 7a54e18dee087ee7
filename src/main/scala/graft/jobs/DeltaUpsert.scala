package graft.jobs

import graft.ops.{Core, Joins}
import org.apache.spark.sql.DataFrame

/** The reference's track_deltas DAG (§3.2, dags/track_delta.py) as a batch
  * CDC cycle: changed-key detection by anti join, recompute restricted by
  * semi join, append-only version log, keep-latest reads.
  *
  * Fixes baked in (SURVEY §7.5 #3):
  *  - the empty-delta malformed-VALUES bug (track_delta.py:288-289) cannot
  *    occur: an empty anti-join result is just an empty DataFrame;
  *  - reads always collapse versions via Core.latestView — the reference
  *    reads ReplacingMergeTree mid-merge and can double-count (§2.9).
  *
  * Scale posture: both sides of the diff are key-grain (|campaigns|, not
  * |events|); the delta keyset is small, so Catalyst broadcasts it for the
  * semi join and the recompute touches only changed keys.
  */
object DeltaUpsert {

  val Keys: Seq[String] = Seq("rtm_advertiser_id", "rtm_campaign_id")

  /** Version-tie ordering shared by every reader AND the compactor
    * (Warehouse.compact must rank versions exactly as latest() does or
    * compaction could keep a row latest() would not have returned). */
  val Tiebreak: Seq[String] = Seq("campaign_impressions_count_total",
    "campaign_clicks_count_total")

  /** Changed keys: OLTP-derived totals rows absent from the OLAP log
    * (track_delta.py:103-123's Python set-difference, distributed).
    *
    * The diff is FULL-ROW (null-safe), not (key, rtm_delta): the
    * reference's timestamp-only diff silently misses a change whose new
    * fact rows all carry timestamps at or before the key's current max —
    * the counts move but `greatest(...)` doesn't, so no delta is emitted
    * and the OLAP copy stays stale forever (a late-arriving backfill is
    * exactly this shape). Comparing the whole row costs nothing extra —
    * both sides are already key-grain — and catches every change. */
  def changedKeys(oltpTotals: DataFrame, olapLog: DataFrame): DataFrame = {
    val cols = oltpTotals.columns.toSeq
    val log = olapLog.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val cond = cols.map(c => oltpTotals(c) <=> log(c)).reduce(_ && _)
    oltpTotals.join(log, cond, "left_anti")
      .select((Keys :+ "rtm_delta").map(org.apache.spark.sql.functions.col): _*)
  }

  /** One delta cycle: new full-version rows for changed keys, to APPEND to
    * the version log (never update-in-place — §2.9 semantics). */
  def deltaRows(oltpTotals: DataFrame, olapLog: DataFrame): DataFrame =
    Joins.restrictToChanged(oltpTotals,
      changedKeys(oltpTotals, olapLog).select(Keys.head, Keys.tail: _*), Keys)

  /** Keep-latest read over the append-only version log. Two versions of a
    * key can share an rtm_delta (the full-row diff above emits a new
    * version when counts change under an unmoved max timestamp), so ties
    * break on the counts — monotone under append-only facts, hence the
    * higher count IS the newer version. */
  def latest(olapLog: DataFrame): DataFrame =
    Core.latestView(olapLog, Keys, "rtm_delta", tiebreak = Tiebreak)

  /** Full cycle as pure data: log ∪ delta, plus its collapsed view. */
  def cycle(oltpTotals: DataFrame, olapLog: DataFrame): (DataFrame, DataFrame) = {
    val appended = olapLog.unionByName(deltaRows(oltpTotals, olapLog))
    (appended, latest(appended))
  }
}
