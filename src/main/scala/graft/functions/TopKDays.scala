package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (day, count) observation; day as epoch days so the buffer stays a
  * flat primitive product. */
case class DayCount(day: Int, n: Long)

/** Aggregator buffer/output: top-k observations ordered by
  * (n desc, day asc). */
case class TopDays(days: Seq[DayCount])

/** Typed `Aggregator` (SURVEY §7.4's custom-aggregate path): per-group
  * top-k by count with deterministic (n desc, day asc) order.
  *
  * This is the scalable form of the window-function top-k: row_number()
  * over a per-group window shuffles EVERY row to its group's reducer and
  * sorts there, while an Aggregator participates in partial aggregation —
  * each map task keeps at most k rows per group, so the shuffle carries
  * O(groups × k) instead of O(rows). Same rows out (q25's oracle is the
  * window form).
  */
class TopKDays(k: Int) extends Aggregator[DayCount, TopDays, TopDays] {

  private def ord(d: DayCount): (Long, Int) = (-d.n, d.day)

  private def trim(s: Seq[DayCount]): Seq[DayCount] =
    s.sortBy(ord).take(k)

  override def zero: TopDays = TopDays(Nil)

  /** Hot path: once the buffer is full, an element no better than the
    * current worst is rejected with one comparison — the O(k log k)
    * sort-and-trim only runs when the element actually enters. The
    * buffer is always sorted (trim's postcondition), so `.last` IS the
    * worst retained element. */
  override def reduce(b: TopDays, a: DayCount): TopDays =
    if (b.days.size >= k && Ordering[(Long, Int)].gteq(ord(a), ord(b.days.last))) b
    else TopDays(trim(b.days :+ a))

  override def merge(b1: TopDays, b2: TopDays): TopDays =
    TopDays(trim(b1.days ++ b2.days))

  override def finish(r: TopDays): TopDays = TopDays(trim(r.days))

  override def bufferEncoder: Encoder[TopDays] = Encoders.product[TopDays]
  override def outputEncoder: Encoder[TopDays] = Encoders.product[TopDays]
}
