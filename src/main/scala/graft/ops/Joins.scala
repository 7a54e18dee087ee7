package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Skew-safe equi join: replicate the (small) right side `salt` times and
    * spread left rows across the replicas — a hot key's rows land on
    * `salt` different reducers instead of one. The salt only routes rows,
    * so the join OUTPUT is identical for any salt assignment. Use when one
    * key dominates (a mega-campaign at 100 TB) and the right side is too
    * large to broadcast outright but small enough to replicate `salt`×;
    * AQE's skew-join split handles the sort-merge case, this handles the
    * hash-join case.
    *
    * The salt is a DETERMINISTIC function of the whole row
    * (xxhash64 over every column): a nondeterministic per-row ordinal
    * (monotonically_increasing_id) balances marginally better but is
    * recomputed differently when a map task is retried after a
    * shuffle-fetch failure — recomputed rows would route to different
    * reducers while non-retried reducers keep their old input, silently
    * dropping or duplicating rows (the SPARK-23207 failure class). At the
    * cluster scale this operator exists for, stage retry is routine, so
    * retry-safety wins. The trade: rows that are EXACT duplicates share a
    * salt and stay on one reducer — if a hot key's rows are full
    * duplicates, dedup first or add a disambiguating column. The salt
    * hashes only the HASHABLE left columns (Spark's hash functions reject
    * MapType at analysis time); map columns still ride along, they just
    * don't contribute entropy. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int = 16): DataFrame = {
    val saltSrc = left.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(saltSrc.nonEmpty,
      "saltedJoin: no hashable columns to derive a deterministic salt from")
    val withSalt = left.withColumn("__salt",
      pmod(xxhash64(saltSrc.toSeq: _*), lit(salt.toLong)).cast("int"))
    val replicated = right.crossJoin(
      spark(right).range(0, salt).select(col("id").cast("int").as("__salt")))
    withSalt.join(replicated, keys :+ "__salt").drop("__salt")
  }

  private def spark(df: DataFrame) = df.sparkSession

  /** Max hot (keys, bucket) groups the interval join inlines as a
    * driver-local broadcast relation before falling back to a
    * distributed hot frame. Sized well past any plausible skew census
    * (each row is a handful of longs) while bounding driver memory. */
  private[graft] val HotSetCap = 100000

  /** xxhash64/hash reject MapType anywhere in the type (no canonical
    * entry order); everything else is fair salt input. */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case _: MapType => false
      case ArrayType(e, _) => hashable(e)
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
  }

  /** As-of join (extension operator — the reference's click-after-impression
    * generator, seed.py:86-106, implies exactly this attribution lookup but
    * never computes it): for each left row, attach `valueCols` from the
    * right row with the greatest `tsCol` <= the left row's `tsCol` within
    * the same `keys` (all-NULL when no such row).
    *
    * Implemented as ONE union + running last-value window — a single
    * hash-partition shuffle on `keys` — instead of the naive inequality
    * join, whose range predicate Spark would execute as a per-key cross
    * product: at 100 TB that's the difference between a linear pass and
    * an O(n·m)-per-key blowup. Right rows sort before left rows at equal
    * timestamps, so an exactly-simultaneous right row matches (<= , not <).
    *
    * `valueCols` travel as ONE struct payload, so the attached values
    * always come from the SAME right row (independent per-column carries
    * could mix rows), and ties among right rows with equal (keys, tsCol)
    * break deterministically by the payload's field order — not by
    * partition layout. `prefix` names the attached columns
    * (`prefix + valueCol`). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val payload = "__asof_payload"
    // Fail fast on column-name collisions: a caller column named like a
    // scratch column would be silently overwritten (or misalign the
    // union), and a left column named like an output would be replaced.
    val reserved = Seq(payload, "__kind")
    val outCols = valueCols.map(prefix + _)
    val clashes = (left.columns ++ right.columns).toSeq.intersect(reserved) ++
      left.columns.toSeq.intersect(outCols)
    require(clashes.isEmpty,
      s"asOf: input columns collide with reserved/output names: " +
        clashes.distinct.mkString(", "))
    val rUnion0 = right.select((keys :+ tsCol).map(col) :+
        struct(valueCols.map(col): _*).as(payload): _*)
      .withColumn("__kind", lit(0))
    val leftOnly = left.columns.filterNot((keys :+ tsCol).contains)
    val rUnion = leftOnly.foldLeft(rUnion0) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val lUnion = left
      .withColumn(payload, lit(null).cast(rUnion0.schema(payload).dataType))
      .withColumn("__kind", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__kind").asc, col(payload).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = valueCols.map(c => c -> s"$prefix$c")
    attached.foldLeft(
        lUnion.unionByName(rUnion.select(lUnion.columns.map(col): _*))
          .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
          .filter(col("__kind") === 1)) {
        case (d, (c, n)) => d.withColumn(n, col(s"$payload.$c"))
      }
      .drop(payload, "__kind")
  }

  /** Point-in-interval RANGE JOIN via bucket decomposition: probe rows
    * (key, t) against interval rows (key, lo, hi), keeping pairs with
    * t ∈ (lo, hi]. The non-equi time predicate defeats hash joins —
    * Spark plans the naive form as a broadcast nested loop — so each
    * interval is exploded to every `bucket`-width bucket it overlaps
    * (⌈(hi−lo)/bucket⌉+1 rows; pick bucket ≈ the typical interval so
    * the fan-out stays ~2), the join runs as an EQUI-join on
    * (key, bucket), and the exact interval test filters at candidate
    * grain. Candidate volume is bounded by per-bucket density, never
    * |probe| × |intervals| per key. Bucketing uses true floor division
    * (pmod-corrected), so negative-domain axes (timestamps before the
    * epoch, signed offsets) bucket correctly. Both inputs keep all
    * their columns; collide-free naming is the caller's job (as with
    * any join). */
  def rangeJoin(probe: DataFrame, intervals: DataFrame, key: String,
                t: String, lo: String, hi: String, bucket: Long): DataFrame = {
    require(bucket > 0, "rangeJoin: bucket width must be positive")
    def floorDiv(c: org.apache.spark.sql.Column) =
      call_function("div", (c - pmod(c, lit(bucket))).cast("long"), lit(bucket))
    probe.withColumn("__bkt", floorDiv(col(t)))
      .join(intervals.withColumn("__bkt",
          explode(sequence(floorDiv(col(lo)), floorDiv(col(hi))))),
        Seq(key, "__bkt"))
      .filter(col(t) > col(lo) && col(t) <= col(hi))
      .drop("__bkt")
  }

  /** INTERVAL-OVERLAP JOIN via bucket decomposition — [[rangeJoin]]'s
    * shape generalized from point-in-interval to interval×interval:
    * left rows carry half-open [llo, lhi), right rows [rlo, rhi);
    * pairs with a non-empty intersection are kept. Both sides explode
    * to every `bucket`-width bucket they overlap and the join runs as
    * an EQUI-join on (keys, bucket) with the exact overlap test at
    * candidate grain — a naive formulation's per-key |left|×|right|
    * nested loop becomes per-bucket-density work.
    *
    * EXACTLY-ONCE without a distinct shuffle: a pair overlapping k
    * shared buckets would surface k times, so it is emitted only in
    * the LATER of the two intervals' first buckets — max(⌊llo⌋, ⌊rlo⌋)
    * — which overlap guarantees both sides exploded into (each
    * interval covers its own first bucket, and overlap puts the
    * other's first bucket at or before the shared region's bucket).
    * A row-local predicate, the d08 own+successor-bucket doctrine.
    *
    * Empty/inverted intervals (hi ≤ lo) are dropped before the explode
    * (they can overlap nothing, and a descending `sequence` would
    * explode the wrong buckets). True floor division (pmod-corrected,
    * BIGINT `div`), so negative axes bucket correctly. Self-joins must
    * alias columns apart first — the rangeJoin naming contract.
    *
    * HOT-BUCKET DEFENSE (`salt`, default 1 = off): with `keys` empty
    * the equi-join key is the time bucket ALONE, so join parallelism
    * is bounded by distinct buckets and a peak-hour bucket runs its
    * per-bucket-density² candidate work in ONE task. `salt > 1`
    * applies the [[saltedJoin]] doctrine to the exploded frames — but
    * ADAPTIVELY, only inside buckets that are actually hot: one
    * bucket-grain count over the right side finds the (keys, bucket)
    * groups holding more than `hotRows` rows; left candidates in those
    * buckets get a deterministic xxhash64 salt (whole row INCLUDING
    * the bucket; retry-safe, the saltedJoin rationale) while right
    * candidates there replicate `salt`× (explode over a literal array
    * — a narrow generator, never a cross join); everything outside
    * rides salt 0 unreplicated. Both sides read hotness off the SAME
    * broadcast set, so every candidate pair still meets exactly once
    * and the output — including the exactly-once first-bucket
    * emission — is identical for any (salt, hotRows). Hot buckets'
    * per-task candidate work drops to density²/salt; a workload with
    * no hot bucket pays one cheap combinable count and zero
    * replication (an UNCONDITIONAL salt was measured 5× slower on the
    * uniform q36 bench: the whole right side replicated 8× through a
    * broadcast hash join that has no reducer skew to fix). Size
    * `hotRows` ≈ the per-task candidate budget's square root. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keys: Seq[String], llo: String, lhi: String,
                          rlo: String, rhi: String, bucket: Long,
                          salt: Int = 1,
                          hotRows: Long = 4096L): DataFrame = {
    require(bucket > 0, "intervalOverlapJoin: bucket width must be positive")
    require(salt >= 1, "intervalOverlapJoin: salt must be >= 1")
    def floorDiv(c: org.apache.spark.sql.Column) =
      call_function("div", (c - pmod(c, lit(bucket))).cast("long"), lit(bucket))
    val l0 = left.filter(col(lhi) > col(llo))
      .withColumn("__bkt",
        explode(sequence(floorDiv(col(llo)), floorDiv(col(lhi)))))
    val r0 = right.filter(col(rhi) > col(rlo))
      .withColumn("__bkt",
        explode(sequence(floorDiv(col(rlo)), floorDiv(col(rhi)))))
    val bktKeys = keys :+ "__bkt"
    val (l, r, joinKeys) =
      if (salt <= 1) (l0, r0, bktKeys)
      else {
        // The census decides per (keys, bucket) group whether to salt.
        // Its RESULT is bucket-grain — almost always tiny, usually
        // EMPTY — so the decision is read once on the driver (capped):
        //  - no hot group: the salt machinery vanishes entirely — the
        //    plan IS the unsalted plan, and the census (one combinable
        //    count + an empty collect) is the only price a uniform
        //    workload pays. This is most workloads most of the time.
        //  - ≤ HotSetCap groups: the hot set becomes a broadcast LOCAL
        //    relation — no eager checkpoint to leak, no per-broadcast
        //    job to re-build it (the round-13 checkpoint existed only
        //    to keep two broadcast exchanges from re-running the
        //    census; a driver-local row set needs neither).
        //  - wider than the cap (a pathology — millions of
        //    simultaneously hot groups): fall back to the checkpointed
        //    distributed hot frame; the caller's post-action
        //    freeCkptFresh releases it.
        // Every path reads the SAME census, so both sides agree on
        // hotness and each candidate pair still meets exactly once.
        val census = r0.groupBy(bktKeys.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > hotRows)
          .select(bktKeys.map(col): _*)
        val hotLocal = census.limit(HotSetCap + 1).collect()
        if (hotLocal.isEmpty) (l0, r0, bktKeys)
        else {
          val hot =
            if (hotLocal.length <= HotSetCap)
              r0.sparkSession
                .createDataFrame(java.util.Arrays.asList(hotLocal: _*),
                  census.schema)
                .withColumn("__hot", lit(1))
            else census.withColumn("__hot", lit(1)).localCheckpoint()
          val saltSrc = l0.schema.fields
            .filter(f => hashable(f.dataType)).map(f => col(f.name))
          val lS = l0.join(broadcast(hot), bktKeys, "left")
            .withColumn("__salt",
              when(col("__hot").isNotNull,
                pmod(xxhash64(saltSrc.toSeq: _*), lit(salt.toLong)).cast("int"))
                .otherwise(lit(0)))
            .drop("__hot")
          val rS = r0.join(broadcast(hot), bktKeys, "left")
            .withColumn("__salt",
              explode(when(col("__hot").isNotNull,
                lit((0 until salt).toArray)).otherwise(array(lit(0)))))
            .drop("__hot")
          (lS, rS, bktKeys :+ "__salt")
        }
      }
    l.join(r, joinKeys)
      .filter(col(llo) < col(rhi) && col(rlo) < col(lhi))
      .filter(col("__bkt") ===
        greatest(floorDiv(col(llo)), floorDiv(col(rlo))))
      .drop("__bkt", "__salt")
  }
}
