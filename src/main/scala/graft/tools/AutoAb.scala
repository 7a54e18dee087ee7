package graft.tools

/** Manual trigger for Bench's auto-A/B adjudicator — runs the same
  * bounded same-host cross-commit A/B the compare pass invokes for
  * over-band suspects, and prints the parsed per-query verdicts. Used
  * to exercise the subprocess + artifact-parse path end-to-end outside
  * a full bench run (a broken adjudicator would otherwise only show up
  * in the next round's driver artifact).
  *
  * Usage: runMain graft.tools.AutoAb <prior-ref> <q1,q2,...> [sfDir]
  */
object AutoAb {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AutoAb <prior-ref> <q1,q2,...> [sfDir]")
    val sfDir =
      if (args.length >= 3) args(2) else "/root/testdata/sf0.1"
    val r = graft.Bench.runAutoAb(
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq, args(0), sfDir)
    if (r.isEmpty)
      println("AUTOAB: empty (tool unavailable, ref unknown, or run failed " +
        "- see the log path printed above)")
    else r.toSeq.sortBy(_._1).foreach { case (q, (ratio, verdict)) =>
      println(s"AUTOAB $q ratio=${ratio.getOrElse("-")} verdict=$verdict")
    }
  }
}
