package graft

import org.scalatest.funsuite.AnyFunSuite

/** The prior-round parser feeding Bench's sampling-width rule. The
  * driver's per-round artifact wraps the bench's own JSON line inside a
  * JSON string field, escaping every quote — a parser anchored on the
  * raw `"queries":{` silently returns empty on it, and an empty prior
  * map downgrades the widen rule to the current-median gate (exactly
  * the gate that misses drifted queries). Both shapes must parse. */
class BenchSpec extends AnyFunSuite {

  test("parses the raw bench line") {
    val line = """{"metric":"total","value":6.0,"unit":"sec","queries":{"q01":1.25,"d10":1.53},"mins":{"q01":1.1,"d10":1.4},"sf":"x"}"""
    assert(Bench.parsePrior(line) == Map("q01" -> 1.25, "d10" -> 1.53))
  }

  test("parses the driver-wrapped (escaped) artifact shape") {
    val wrapped =
      """{
        |  "n": 5,
        |  "rc": 0,
        |  "tail": "ric\":\"total\",\"value\":77.2,\"unit\":\"sec\",\"queries\":{\"q01_campaign_totals\":1.13,\"d10_dedup_incremental\":1.53},\"sf\":\"/root/testdata/sf0.1\"}",
        |  "parsed": null
        |}""".stripMargin
    assert(Bench.parsePrior(wrapped) ==
      Map("q01_campaign_totals" -> 1.13, "d10_dedup_incremental" -> 1.53))
  }

  test("empty / garbage input yields an empty prior (widen falls back)") {
    assert(Bench.parsePrior("") == Map.empty[String, Double])
    assert(Bench.parsePrior("{\"n\": 4}") == Map.empty[String, Double])
  }

  test("takes the FIRST queries object, not the mins/iters maps") {
    val line = """{"queries":{"a":2.0},"mins":{"a":1.0},"iters":{"a":7}}"""
    assert(Bench.parsePrior(line) == Map("a" -> 2.0))
  }
}
