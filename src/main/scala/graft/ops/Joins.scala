package graft.ops

import org.apache.spark.sql.DataFrame

/** Join operators J1–J8 (SURVEY §2.3), in particular the CDC pair that the
  * reference implements in driver-side Python sets (track_delta.py:103-123)
  * and we implement as distributed anti/semi joins.
  *
  * Scale posture: key-only projections keep the shuffled payload minimal;
  * at 100 TB the delta keyset is orders of magnitude smaller than the fact
  * tables, so Catalyst/AQE will broadcast it for the semi join — the
  * recompute then touches only changed keys with zero extra shuffle.
  */
object Joins {

  /** J8: changed-key detection — OLTP keyset minus OLAP keyset
    * (set-difference done in Python in the reference; `left_anti` here). */
  def deltaKeys(oltpKeys: DataFrame, olapKeys: DataFrame,
                keys: Seq[String]): DataFrame =
    oltpKeys.select(keys.head, keys.tail: _*).distinct()
      .join(olapKeys.select(keys.head, keys.tail: _*).distinct(),
        keys, "left_anti")

  /** J4: restrict a recompute to the changed keys (the reference's
    * INNER JOIN USING(...) against a VALUES list, track_delta.py:214 —
    * a semi join by intent). */
  def restrictToChanged(recompute: DataFrame, changed: DataFrame,
                        keys: Seq[String]): DataFrame =
    recompute.join(changed, keys, "left_semi")
}
