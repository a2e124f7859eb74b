package graft.tools

import graft.ScalingBench

/** One parallelism level of [[graft.ScalingBench]] as a standalone main, so
  * a shell driver can run several JVMs CONCURRENTLY (one SparkContext per
  * JVM) for the memory-bandwidth counter-experiment: if two simultaneous
  * 8-core runs each slow down vs one solo 8-core run while 16 of 32 cores
  * sit busy, the box's shared memory channels — not the engine's shuffle
  * scaling — bound single-box strong scaling, which is the claim behind
  * reading the 2→8 pair (not 8→32) as the cluster-scale-out proxy.
  *
  * Env: SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_BENCH_NODES (default 4M),
  * SPARK_GRAFT_BENCH_DENSITY (10), SPARK_GRAFT_REPS (1), SPARK_GRAFT_TAG.
  * Prints one JSON line tagged for collection by the driver script.
  */
object OneLevelBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val nodes = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "4000000").toLong
    val density = sys.env.getOrElse("SPARK_GRAFT_BENCH_DENSITY", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val tag = sys.env.getOrElse("SPARK_GRAFT_TAG", "solo")
    val l = ScalingBench.runAt(cpus, nodes, density, reps)
    println(
      s"""{"tag":"$tag","cpus":$cpus,"nodes":$nodes,"edges":${l.edges},""" +
      s""""lp_med_iter_sec":${f"${l.lpMedIter}%.3f"},""" +
      s""""pr_med_iter_sec":${f"${l.prMedIter}%.3f"},""" +
      s""""lp_wall_sec":${f"${l.lpWall}%.2f"},"pr_wall_sec":${f"${l.prWall}%.2f"},""" +
      s""""lp_fp":${l.lpFp},"pr_fp":${l.prFp}}""")
  }
}
