package graft.tools

import graft.Bench

/** Repro probe for the ScalingBench level-transition NPE
  * (`SparkPlan.session() is null` mid-PageRank in the SECOND SparkContext
  * of one JVM, /tmp/scaling_r4.log): stop a session, create another at a
  * different core count, and hammer the superstep loop with repeated
  * LP + PR convergence runs. Small graphs keep each rep in seconds; many
  * reps give a timing-dependent race room to fire.
  *
  * Usage: scripts/run_main.sh graft.tools.TwoSessionProbe [nodes] [reps]
  */
object TwoSessionProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000L
    val reps = if (args.length > 1) args(1).toInt else 8

    val s1 = Bench.session(8, "two-session-probe-8")
    try {
      val g = Bench.graphBench(s1, n, 10)
      System.err.println(f"[probe] level1 rep=1 lpWall=${g.lpWallSec}%.1fs prWall=${g.prWallSec}%.1fs")
    } finally s1.stop()

    val s2 = Bench.session(32, "two-session-probe-32")
    try {
      for (r <- 1 to reps) {
        val g = Bench.graphBench(s2, n, 10)
        System.err.println(f"[probe] level2 rep=$r lpWall=${g.lpWallSec}%.1fs prWall=${g.prWallSec}%.1fs")
      }
      println("""{"probe":"two_session","status":"no_repro"}""")
    } finally s2.stop()
  }
}
