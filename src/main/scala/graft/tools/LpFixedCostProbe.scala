package graft.tools

import graft.{Bench, Tables}
import graft.algo.LabelPropagation

/** Wall attribution for `lp_derived` (the sf0.1 2K-vertex / 600K-edge
  * driver-bench shape): repeats the exact driver query in ONE warmed JVM —
  * the sweep-to-sweep wall for this query swings 6-15 s across rounds with
  * per-superstep phase medians that barely move, so the open question is
  * whether the non-superstep remainder (setup: adjacency pack + degree
  * scan + width probe + state init) is steady or drift. Run with
  * SPARK_GRAFT_LOOP_TIMERS=1 for the per-superstep build/plan/exec split.
  *
  * Usage: scripts/run_main.sh graft.tools.LpFixedCostProbe [sfDir] [reps]
  */
object LpFixedCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus, "lp-fixed-cost-probe")
    val e = Tables.edges(spark, sfDir).cache()
    val sd = Tables.seeds(spark, sfDir)
    println(s"[probe] derived edges=${e.count()} cpus=$cpus reps=$reps")
    for (r <- 1 to reps) {
      val t = Bench.timed(LabelPropagation.run(e, sd))
      val iterMs = t.value.stats.map(_.computeMs)
      println(f"[probe] rep=$r wall=${t.sec}%.1fs iters=${t.value.iterations} " +
        f"iterSumMs=${iterMs.sum} iterMs=${iterMs.mkString(",")} " +
        f"fp=${graft.algo.ConnectedComponents.fingerprint64(t.value.labels.toDF())}")
      t.value.release()
    }
    spark.stop()
  }
}
