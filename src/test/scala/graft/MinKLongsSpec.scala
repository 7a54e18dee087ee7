package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native per-group top-k aggregate (functions.MinKLongs) — the
  * round-17 replacement for the ANN coarse passes' row_number windows.
  * Pins:
  *  - row-for-row equality with BOTH independent forms (the window and
  *    the typed MinKByKey udaf) on a seeded random frame with heavy
  *    ties and groups straddling k;
  *  - the merge/serialize path (many input partitions force partial
  *    buffers through ser/de);
  *  - topKPerGroup's score/rank recovery (score = −k round-trips,
  *    rank is the 1-based (score desc, id asc) position). */
class MinKLongsSpec extends SparkSpec {

  private def randFrame(n: Int, groups: Int, scoreDomain: Int) = {
    // Deterministic "random": hash-derived scores with a SMALL domain
    // so ties are dense and the id tie-break is actually exercised.
    spark.range(n.toLong).repartition(7)
      .selectExpr(
        s"id % $groups as g",
        s"pmod(hash(id * 31), $scoreDomain) as score",
        "id as item")
  }

  test("min_k_longs equals the window form and the typed udaf, with ties") {
    for ((n, groups, dom, k) <- Seq((5000, 7, 11, 5), (2000, 1, 3, 100),
        (300, 50, 1000, 3))) {
      val df = randFrame(n, groups, dom).cache()
      val native = graft.queries.Extensions.topKPerGroup(
        df, "g", col("score"), "item", k, "score", "rank")
      val w = Window.partitionBy(col("g"))
        .orderBy(col("score").desc, col("item").asc)
      val win = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("item"), col("score"),
          col("rank").cast("int").as("rank"))
      val udafAgg = udaf(new graft.functions.MinKByKey(k),
        org.apache.spark.sql.Encoders.product[graft.functions.KeyedId])
      val viaUdaf = df.groupBy("g")
        .agg(udafAgg(-col("score"), col("item")).as("t"))
        .select(col("g"), posexplode(col("t.ids")).as(Seq("p", "e")))
        .select(col("g"), col("e.id").as("item"), (-col("e.k")).as("score"),
          (col("p") + 1).cast("int").as("rank"))
      assert(native.exceptAll(win).isEmpty && win.exceptAll(native).isEmpty,
        s"native != window at (n=$n, groups=$groups, dom=$dom, k=$k)")
      assert(native.exceptAll(viaUdaf).isEmpty &&
        viaUdaf.exceptAll(native).isEmpty,
        s"native != udaf at (n=$n, groups=$groups, dom=$dom, k=$k)")
      df.unpersist()
    }
  }

  test("groups smaller than k emit all rows, still ordered") {
    val df = spark.range(4).selectExpr("0L as g", "id as score", "id as item")
    val out = graft.queries.Extensions.topKPerGroup(
        df, "g", col("score"), "item", 100, "score", "rank")
      .orderBy("rank").collect()
    assert(out.length == 4)
    // score desc, id asc: 3, 2, 1, 0
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L, 0L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3, 4))
  }
}
