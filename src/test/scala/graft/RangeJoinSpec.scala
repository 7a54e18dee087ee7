package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._

/** The bucketed point-in-interval range join (ops.Joins.rangeJoin) —
  * differential-tested against the naive non-equi join it replaces, on
  * random data chosen to hit the decomposition's edges: negative axis
  * values (true floor division, not truncation), intervals spanning many
  * buckets, zero-length intervals, and probes exactly on interval
  * endpoints (t ∈ (lo, hi] boundary semantics).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin ≡ the naive non-equi join on random signed data") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val probes = (0 until 300).map(i =>
        (i.toLong, rng.nextInt(5).toLong, rng.nextLong() % 10000L))
        .toDF("pid", "k", "t")
      val intervals = (0 until 60).map { i =>
        val lo = rng.nextLong() % 10000L
        // Spans from zero-length up to ~30 buckets at bucket = 250.
        (i.toLong, rng.nextInt(5).toLong, lo, lo + rng.nextInt(3) * rng.nextInt(2500))
      }.toDF("iid", "k", "lo", "hi")

      val naive = probes.join(intervals, Seq("k"))
        .filter(col("t") > col("lo") && col("t") <= col("hi"))
        .select("pid", "iid")
      val bucketed = Joins.rangeJoin(probes, intervals,
          key = "k", t = "t", lo = "lo", hi = "hi", bucket = 250L)
        .select("pid", "iid")
      assertSameRows(bucketed, naive, s"trial $trial")
    }
  }

  test("boundary semantics: lo excluded, hi included, across a bucket edge") {
    val probes = Seq((1L, 0L, 1000L), (2L, 0L, 1001L), (3L, 0L, 2000L),
      (4L, 0L, 2001L)).toDF("pid", "k", "t")
    val intervals = Seq((9L, 0L, 1000L, 2000L)).toDF("iid", "k", "lo", "hi")
    val got = Joins.rangeJoin(probes, intervals, "k", "t", "lo", "hi",
        bucket = 512L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(2L, 3L), s"(lo, hi] semantics broken: $got")
  }

  test("intervalOverlapJoin ≡ the naive overlap join on random signed data") {
    // Random signed intervals spanning 0..~30 buckets: exercises the
    // exactly-once bucket-ownership rule (pairs sharing many buckets),
    // floor division on negative axes, empty intervals (hi ≤ lo — must
    // match nothing, not explode a descending sequence), and
    // single-point touching (a.hi == b.lo — half-open, no overlap).
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      def mk(n: Int, id: String) = (0 until n).map { i =>
        val lo = rng.nextLong() % 10000L
        (i.toLong, rng.nextInt(5).toLong, lo,
          lo + rng.nextInt(3) * rng.nextInt(2500) - rng.nextInt(50))
      }.toDF(id, "k", s"${id}lo", s"${id}hi")
      val l = mk(120, "a")
      val r = mk(120, "b")
      val naive = l.filter(col("ahi") > col("alo"))
        .join(r.filter(col("bhi") > col("blo")), Seq("k"))
        .filter(col("alo") < col("bhi") && col("blo") < col("ahi"))
        .select("a", "b")
      val bucketed = Joins.intervalOverlapJoin(l, r, Seq("k"),
          "alo", "ahi", "blo", "bhi", bucket = 250L)
        .select("a", "b")
      assertSameRows(bucketed, naive, s"overlap trial $trial")
    }
  }

  test("intervalOverlapJoin emits a many-shared-bucket pair exactly once") {
    // Two near-identical long intervals share ~8 buckets; the ownership
    // rule must emit the pair once, not 8 times.
    val l = Seq((1L, 0L, 0L, 2000L)).toDF("a", "k", "alo", "ahi")
    val r = Seq((2L, 0L, 10L, 1990L)).toDF("b", "k", "blo", "bhi")
    assert(Joins.intervalOverlapJoin(l, r, Seq("k"),
      "alo", "ahi", "blo", "bhi", bucket = 250L).count() == 1L)
  }

  /** A keys-empty workload with one PLANTED HOT BUCKET: 200 of the 260
    * left intervals (and 200 of the right) live inside bucket 40, the
    * rest scatter — the peak-hour shape whose density² candidate work
    * would otherwise run in one task. */
  private def hotBucketFrames(seed: Int) = {
    val rng = new scala.util.Random(seed)
    def mk(id: String) = ((0 until 200).map { i =>
      // All inside bucket [10000, 10250) at bucket = 250.
      val lo = 10000L + rng.nextInt(200)
      (i.toLong, lo, lo + 1 + rng.nextInt(45))
    } ++ (200 until 260).map { i =>
      val lo = rng.nextLong() % 8000L
      (i.toLong, lo, lo + rng.nextInt(3) * rng.nextInt(1500) - rng.nextInt(40))
    }).toDF(id, s"${id}lo", s"${id}hi")
    (mk("a"), mk("b"))
  }

  test("salted intervalOverlapJoin ≡ unsalted on a planted hot bucket") {
    // The salt only routes candidate pairs to reducers; the output —
    // including the exactly-once first-bucket emission — must be
    // identical row-for-row for any salt.
    for (trial <- 1 to 3) {
      val (l, r) = hotBucketFrames(seed = 100 + trial)
      val unsalted = Joins.intervalOverlapJoin(l, r, Seq.empty,
        "alo", "ahi", "blo", "bhi", bucket = 250L).select("a", "b")
      val salted = Joins.intervalOverlapJoin(l, r, Seq.empty,
        "alo", "ahi", "blo", "bhi", bucket = 250L, salt = 8,
        hotRows = 50L).select("a", "b")
      assert(unsalted.count() > 1000L, "hot bucket not actually dense")
      assertSameRows(salted, unsalted, s"hot-bucket trial $trial")
    }
  }

  test("checkpoint lifecycle: repeated q36 and service cycles release their blocks") {
    import graft.queries.Extensions
    def ckptIds(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.queryExecution.logical.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }
    def live(ids: Seq[Int]): Seq[Int] = {
      val p = spark.sparkContext.getPersistentRDDs
      ids.filter(p.contains)
    }
    // One-shot q36 (session frame + hot census checkpoints), N times:
    // each invocation's blocks are released by the post-action free.
    for (_ <- 1 to 3) {
      val f = graft.queries.Parity.sessionOverlaps(spark, sf("sf0.001"))
      f.write.format("noop").mode("overwrite").save()
      val ids = ckptIds(f)
      assert(ids.nonEmpty, "q36 lost its eager checkpoints — test is vacuous")
      assert(live(ids).nonEmpty, "checkpoint blocks missing before release")
      Extensions.freeCkptFresh(f)
      assert(live(ids).isEmpty,
        s"q36 checkpoint blocks survived the release: ${live(ids)}")
    }
    // The always-on service cycle frees its own census checkpoints per
    // drain — the block-manager RDD set it adds must return to baseline
    // after every ingest (no slow leak across ticks).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-seslog")
    val (sessLog, pairLog) =
      (s"$dir/sessions", s"$dir/pairs")
    def batch(off: Long) = (0L until 40L).map { i =>
      (off + i,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000 + i * 7)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(5000 + i * 7)))
    }.toDF("user_id", "session_start", "session_end")
    for (tick <- 0 to 2) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      graft.streaming.SessionOverlapTable.ingest(spark, batch(tick * 100L),
        sessLog, pairLog)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty,
        s"service ingest tick $tick leaked checkpoint RDDs: $leaked")
    }
    assert(graft.streaming.SessionOverlapTable
      .pairsView(spark, pairLog).count() > 0, "cycle produced no pairs")
  }

  test("the salt spreads the hot bucket across >1 partition") {
    // Unsalted, the hot bucket is ONE join key = one reducer; salted,
    // its pairs must surface from several. spark_partition_id() is read
    // directly on the join output (the filters above it are narrow, so
    // the id reflects the join's exchange). Broadcast is disabled for
    // the probe: at test size Spark would broadcast-hash the right side
    // and the partition ids would reflect the left INPUT splits, not
    // the reducer layout the assertion is about.
    // …and AQE's post-shuffle coalescing is held off for the same
    // reason: on a test-sized shuffle it folds all reducers back into
    // one partition, masking the key-spread this test asserts (at real
    // density AQE would keep — or further split — the partitions).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val (l, r) = hotBucketFrames(seed = 7)
      def hotParts(salt: Int): Long =
        Joins.intervalOverlapJoin(l, r, Seq.empty,
            "alo", "ahi", "blo", "bhi", bucket = 250L, salt = salt,
            hotRows = 50L)
          .filter(col("alo") >= 10000L && col("alo") < 10250L)
          .select(spark_partition_id().as("p"))
          .distinct().count()
      assert(hotParts(salt = 1) == 1L,
        "unsalted hot bucket unexpectedly spread (test premise broken)")
      assert(hotParts(salt = 8) >= 3L,
        "salt failed to spread the hot bucket's work")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        prevCoalesce)
    }
  }
}
