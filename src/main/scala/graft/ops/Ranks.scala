package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Portable

/** Two-phase global ordering operators.
  *
  * A global `Window.orderBy(...)` moves EVERY row to one reducer
  * (`WindowExec: No Partition Defined`) — at 100 TB that is a serial
  * bottleneck however small each row is. The scalable shape is the
  * classic two-phase ordinal: range-repartition on the sort key so
  * partitions are globally ordered, sort within each partition, then
  * compose each row's partition-local position with the total row count
  * of all preceding partitions. `zipWithIndex` implements exactly that
  * composition (one lightweight count job for the per-partition offsets,
  * then a narrow map) with the offsets and ordinals taken from the SAME
  * computation, so a stage retry cannot pair mismatched halves.
  *
  * rank / dense_rank / ntile all derive from the global ordinal plus the
  * (tiny) sort-key histogram — no single-partition window anywhere.
  */
object Ranks {

  /** Append a 1-based global ordinal column under total order `sort`
    * (which must be unique per row for a deterministic result). */
  def withGlobalOrdinal(df: DataFrame, ordCol: String, sort: Column*): DataFrame = {
    val sorted = df.repartitionByRange(sort: _*).sortWithinPartitions(sort: _*)
    val schema = sorted.schema.add(ordCol, LongType, nullable = false)
    val withOrd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(withOrd, schema)
  }

  /** SQL-standard `ntile(k)` recomposed from a global 1-based ordinal
    * `rn` and the total row count `n`: the first `n % k` tiles hold
    * `n/k + 1` rows, the rest `n/k`. Exact integer arithmetic
    * (Portable.idiv) so it is engine-portable. */
  def ntileFromOrdinal(rn: Column, n: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val base = Portable.idiv(n, kL)
    val rem = n % kL
    val big = base + lit(1L)
    when(rn <= rem * big, Portable.idiv(rn - lit(1L), big) + lit(1L))
      .otherwise(rem + Portable.idiv(rn - lit(1L) - rem * big, base) + lit(1L))
  }
}
