package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (sort key, payload id) observation. */
case class KeyedId(k: Long, id: Long)

/** Aggregator buffer/output: the k smallest observations by (k, id). */
case class MinKIds(ids: Seq[KeyedId])

/** Typed `Aggregator`: per-group k-smallest by a sort key — the
  * map-side-combinable form of `row_number() <= k` per group. A window
  * would shuffle EVERY row to its group's reducer (for a low-cardinality
  * group key like language, that is the q26-class skew killer: ≤|groups|
  * reducers see the whole table); this buffer keeps ≤k rows per group
  * per map task, so the shuffle carries O(groups × k).
  *
  * Same short-circuit as TopKDays: a full buffer rejects a non-entering
  * element with one comparison. */
class MinKByKey(k: Int) extends Aggregator[KeyedId, MinKIds, MinKIds] {

  private def ord(d: KeyedId): (Long, Long) = (d.k, d.id)

  private def trim(s: Seq[KeyedId]): Seq[KeyedId] = s.sortBy(ord).take(k)

  override def zero: MinKIds = MinKIds(Nil)

  override def reduce(b: MinKIds, a: KeyedId): MinKIds =
    if (b.ids.size >= k && Ordering[(Long, Long)].gteq(ord(a), ord(b.ids.last))) b
    else MinKIds(trim(b.ids :+ a))

  override def merge(b1: MinKIds, b2: MinKIds): MinKIds =
    MinKIds(trim(b1.ids ++ b2.ids))

  override def finish(r: MinKIds): MinKIds = MinKIds(trim(r.ids))

  override def bufferEncoder: Encoder[MinKIds] = Encoders.product[MinKIds]
  override def outputEncoder: Encoder[MinKIds] = Encoders.product[MinKIds]
}
