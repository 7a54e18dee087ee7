package graft

import graft.ops.Ranks
import graft.queries.Extensions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase ranking (ops.Ranks) differential-tested against the window
  * functions it replaces, and the convergence-driven connected components
  * on graphs deeper than any fixed unroll. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalOrdinal equals row_number over the same total order") {
    val df = Seq.tabulate(997)(i => ((i * 37) % 997, i.toLong))
      .toDF("k", "v")
    val got = Ranks.withGlobalOrdinal(df, "rn", col("k").desc, col("v").asc)
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k").desc, col("v").asc)).cast("long"))
    assertSameRows(got, want, "global ordinal")
  }

  test("ntileFromOrdinal matches ntile() including uneven and n<k tiles") {
    for (n <- Seq(3, 4, 10, 103); k <- Seq(4, 7)) {
      val df = (1 to n).map(_.toLong).toDF("v")
      val want = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("v"))).cast("long"))
      val got = Ranks.withGlobalOrdinal(df, "rn", col("v").asc)
        .crossJoin(df.agg(count(lit(1)).as("n_total")))
        .select(col("v"), Ranks.ntileFromOrdinal(col("rn"), col("n_total"), k).as("t"))
      assertSameRows(got, want, s"ntile n=$n k=$k")
    }
  }

  test("connectedComponents converges past 3 hops (7-node path graph)") {
    // 10→20→30→40→50→60→70: one component, 6 hops end-to-end — a 3-round
    // unroll would leave the far end mislabeled. Both routes: the
    // under-cap call takes the driver union-find; the DISTRIBUTED
    // anchor (the over-cap path, with the adaptive hop unroll) is
    // pinned on the same fixture so its convergence logic keeps
    // independent coverage.
    val pairs = Seq((20L, 10L), (30L, 20L), (40L, 30L), (50L, 40L),
      (60L, 50L), (70L, 60L)).toDF("doc_a", "doc_b")
    val want = Set(10L, 20L, 30L, 40L, 50L, 60L, 70L).map(_ -> 10L)
    val got = Extensions.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got == want)
    val gotDist = Extensions.connectedComponentsDistributed(pairs)
      .as[(Long, Long)].collect().toSet
    assert(gotDist == want, "distributed anchor diverged on the path graph")
  }

  test("connectedComponents labels disjoint components independently") {
    val pairs = Seq((2L, 1L), (3L, 2L), (9L, 8L)).toDF("doc_a", "doc_b")
    val got = Extensions.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("connectedComponents converges on cycles (fixpoint, not a tree walk)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L), (9L, 7L))
      .toDF("doc_a", "doc_b")
    val want = Set(1L, 2L, 3L).map(_ -> 1L) ++ Set(7L, 8L, 9L).map(_ -> 7L)
    val got = Extensions.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got == want)
    val gotDist = Extensions.connectedComponentsDistributed(pairs)
      .as[(Long, Long)].collect().toSet
    assert(gotDist == want, "distributed anchor diverged on cycles")
  }

  test("connectedComponents equals a union-find reference on random graphs") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(20)((rng.nextInt(12) + 1L, rng.nextInt(12) + 1L))
        .filter { case (a, b) => a != b }
      // driver-side union-find as the independent reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.groupBy(find).flatMap { case (_, ns) =>
        val label = ns.min; ns.map(_ -> label)
      }.toSet
      val got = Extensions.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toSet
      assert(got == want, s"seed $seed: got $got want $want")
      // The driver union-find and the distributed fixpoint must agree
      // row-for-row — the local route's independent anchor.
      val gotDist = Extensions
        .connectedComponentsDistributed(edges.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toSet
      assert(gotDist == want, s"seed $seed distributed: got $gotDist")
    }
  }

  test("ntileFromOrdinal matches the tile-size definition exhaustively") {
    // Independent oracle: tiles are built by SIZE (first n%k tiles get
    // n/k+1 rows) and each ordinal's tile read off the cumulative sizes —
    // not the arithmetic under test. Exhaustive over n<=60, k<=8, one job.
    val rows = for { n <- 1 to 60; k <- 1 to 8; rn <- 1 to n }
      yield (n.toLong, k, rn.toLong, {
        val sizes = (0 until k).map(i => n / k + (if (i < n % k) 1 else 0))
        val cum = sizes.scanLeft(0)(_ + _).tail
        (cum.indexWhere(rn <= _) + 1).toLong
      })
    val df = rows.toDF("n", "k", "rn", "want")
    val gotCol = coalesce((1 to 8).map(k =>
      when(col("k") === k,
        Ranks.ntileFromOrdinal(col("rn"), col("n"), k))): _*)
    val bad = df.withColumn("got", gotCol)
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0, s"$bad (n,k,rn) combinations disagree")
  }

  test("connectedComponents fails loudly when maxRounds is too small") {
    // A 7-node path needs ~6 propagation rounds; maxRounds=2 must raise,
    // not hand back half-propagated labels.
    val pairs = Seq((20L, 10L), (30L, 20L), (40L, 30L), (50L, 40L),
      (60L, 50L), (70L, 60L)).toDF("doc_a", "doc_b")
    // maxRounds is a DISTRIBUTED-loop dial (the driver union-find has
    // no rounds to bound) — exercised on the anchor directly.
    val e = intercept[IllegalArgumentException] {
      Extensions.connectedComponentsDistributed(pairs, maxRounds = 2)
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("connectedComponents routes non-Long id spaces to the distributed loop") {
    // The driver route collects (Long, Long) pairs; an IntegerType pair
    // frame must take the distributed path and still label correctly.
    val pairs = Seq((2, 1), (3, 2), (9, 8)).toDF("doc_a", "doc_b")
    val got = Extensions.connectedComponents(pairs)
      .as[(Int, Int)].collect().toSet
    assert(got == Set(1 -> 1, 2 -> 1, 3 -> 1, 8 -> 8, 9 -> 8))
  }

  test("a null pair endpoint routes distributed instead of NPE in the probe") {
    // The driver probe collects cap+1 rows and reads getLong on both
    // endpoints; a malformed (null) pair must fall through to the
    // distributed loop — route choice never changes accepted inputs.
    val pairs = Seq[(Option[Long], Option[Long])](
      (Some(2L), Some(1L)), (Some(3L), Some(2L)), (None, Some(8L)))
      .toDF("doc_a", "doc_b")
    val got = Extensions.connectedComponents(pairs).collect()
    val nonNull = got.filter(!_.isNullAt(0))
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(nonNull == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L))
  }

  test("near-cap graphs take the driver route with sized label partitions") {
    // 0.9M-edge path graph, just under CcDriverEdgeCap: the probe must
    // keep the driver route, and the parallelize sizing (~100k label
    // rows per partition, capped at 32) must spread the ~0.9M-row label
    // frame instead of pinning it in one partition (VERDICT r16 #5).
    val pairs = spark.range(900000)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val got = Extensions.connectedComponents(pairs)
    assert(got.rdd.getNumPartitions == 9,
      s"expected 9 label partitions, got ${got.rdd.getNumPartitions}")
    val agg = got.agg(count(lit(1)), count_distinct(col("cluster_id")),
      min(col("cluster_id"))).collect()(0)
    assert(agg.getLong(0) == 900001L, "one label row per node")
    assert(agg.getLong(1) == 1L && agg.getLong(2) == 0L,
      "single component labeled by its min id")
  }

  test("ccLocal handles deep paths, min-root labeling, and duplicate edges") {
    // 100k-edge path graph: a recursive find would stack-overflow; the
    // iterative two-pass compression must label every node with the
    // global min in one pass over the edges.
    val deep = (1 until 100000).map(i => (i.toLong, i + 1L)).toArray
    val labels = Extensions.ccLocal(deep).toMap
    assert(labels.size == 100000 && labels.values.forall(_ == 1L))
    // Reversed orientation + duplicates + self-loop: same answer.
    val messy = Array((5L, 3L), (3L, 5L), (5L, 5L), (3L, 1L), (9L, 8L))
    assert(Extensions.ccLocal(messy).toMap ==
      Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("asOf rejects colliding caller column names") {
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "asof_v")
    val r = Seq((1L, 5L, "y")).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Joins.asOf(l, r, Seq("k"), "ts", Seq("v"))
    }
    assert(e.getMessage.contains("asof_v"))
  }
}
