package graft

import graft.queries.Extensions

/** s09 (semantic dedup served off the stored index) must be a pure
  * STORAGE change against s05: same top-4 multi-assignment, same
  * cell-blocked candidates, same exact-cosine verification — only where
  * the assignment comes from differs (read vs recomputed). Row-for-row
  * equality pins that; if it holds, s09 inherits s05's measured recall
  * (0.759 on sf0.01) by construction — the same contract AnnIndexSpec
  * pins for the s07/s08 pair. The no-recompute plan shape (no
  * nested-loop quantizer join anywhere in s09) is pinned in PlanSpec. */
class SemDedupIndexSpec extends SparkSpec {

  test("s09 (indexed) ≡ s05 (recomputed) row-for-row (sf0.001)") {
    val dir = sf("sf0.001")
    Extensions.invalidateAnnIndex(dir)
    assertSameRows(
      Extensions.semdedupCells(spark, dir),
      Extensions.semdedupIndexed(spark, dir),
      "s09 vs s05 at sf0.001")
  }

  test("s09 (indexed) ≡ s05 (recomputed) row-for-row (sf0.01)") {
    val dir = sf("sf0.01")
    Extensions.invalidateAnnIndex(dir)
    assertSameRows(
      Extensions.semdedupCells(spark, dir),
      Extensions.semdedupIndexed(spark, dir),
      "s09 vs s05 at sf0.01")
  }
}
