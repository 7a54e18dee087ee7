package graft

import graft.queries.Extensions
import org.apache.spark.sql.DataFrame

/** incrementalClusters must be a pure SCHEDULING change against a full
  * clusterPairs recompute over the union pair set: whatever a delta does
  * to the component structure — merge two old clusters, extend one with
  * a new node, create a brand-new component, replay an already-known
  * pair, or nothing at all — the maintained labels equal the one-shot
  * labels, and components the delta never reaches carry over verbatim. */
class IncrementalClustersSpec extends SparkSpec {

  private def pairs(ps: (Long, Long)*): DataFrame = {
    import spark.implicits._
    ps.toDF("doc_a", "doc_b")
  }

  // Wave 1: three separate clusters {1,2,3}, {10,11}, {20,21}.
  private val wave1 = pairs((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))

  private def check(delta: DataFrame, hint: String): Unit = {
    val prev = Extensions.clusterPairs(wave1)
    val incr = Extensions.incrementalClusters(prev, delta)
    val full = Extensions.clusterPairs(wave1.unionByName(delta))
    assertSameRows(incr, full, hint)
  }

  test("delta merging two old clusters ≡ full recompute") {
    // (3,10) chains {1,2,3} and {10,11} into one min-1 component;
    // {20,21} is untouched.
    check(pairs((3L, 10L)), "merge across waves")
  }

  test("delta extending one cluster with a new node ≡ full recompute") {
    check(pairs((11L, 30L)), "extension")
  }

  test("delta of only previously-unpaired docs ≡ full recompute") {
    check(pairs((40L, 41L)), "brand-new component")
  }

  test("replayed known pair and empty delta leave labels unchanged") {
    val prev = Extensions.clusterPairs(wave1)
    assertSameRows(Extensions.incrementalClusters(prev, pairs((2L, 3L))),
      prev, "replayed pair")
    assertSameRows(Extensions.incrementalClusters(prev, pairs()),
      prev, "empty delta")
  }

  test("compound delta (merge + extend + new component at once) ≡ full") {
    check(pairs((3L, 10L), (21L, 50L), (60L, 61L), (61L, 62L)),
      "compound delta")
  }
}
