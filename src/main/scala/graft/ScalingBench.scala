package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence for the north rule ("≥0.8 throughput
  * scaling efficiency between N and 4N executors").
  *
  * No real cluster exists in this sandbox, so the criterion is evidenced by
  * running the IDENTICAL job (LP + PageRank to convergence on the fixed
  * synthetic reference graph) at `local[N]` and `local[4N]` over the same
  * input, asserting bit-identical per-vertex results between the two runs,
  * and reporting edges-processed/sec per superstep at both plus
  * `eff = throughput(4N) / (4 × throughput(N))` — per-core-normalized
  * speedup, exactly the multi-executor efficiency the rule targets (each
  * local thread stands in for an executor core; shuffle partitioning tracks
  * the core count like a real cluster deployment would).
  *
  * Estimator: the sandbox host exhibits multi-second CPU-steal spikes that
  * can double any single wall-clock sample, so the primary statistic is the
  * MEDIAN per-superstep time (each superstep is an i.i.d. sample of the
  * same physical work — LP contributes ~6, PageRank ~75 samples per run),
  * minimized over repetitions; raw convergence wall times are reported
  * alongside. This mirrors the reference's per-iteration phase-window
  * methodology (`runtime_metrics.py:81-183`).
  *
  * Usage: SPARK_GRAFT_SCALE_N=8 SPARK_GRAFT_BENCH_NODES=4000000 \
  *        sbt "runMain graft.ScalingBench"
  * Prints one JSON line; BENCH.md records the results.
  */
object ScalingBench {

  final case class Level(
      cpus: Int, edges: Long,
      lpIters: Int, lpWall: Double, lpMedIter: Double,
      prIters: Int, prWall: Double, prMedIter: Double,
      lpFp: Long, prFp: Long) {
    def lpTput: Double = edges / lpMedIter        // edges/sec per superstep
    def prTput: Double = edges / prMedIter
    def combinedTput: Double =
      edges.toDouble * (lpIters + prIters) / (lpMedIter * lpIters + prMedIter * prIters)
  }

  def runAt(cpus: Int, n: Long, density: Int, reps: Int): Level = {
    val spark = Bench.session(cpus, s"graft-scaling-$cpus")
    try {
      Bench.graphBench(spark, 10000L, 10) // JIT/classloading warm-up
      val runs = (1 to reps).map { r =>
        val g = Bench.graphBench(spark, n, density)
        System.err.println(
          f"[scaling] cpus=$cpus rep=$r lpWall=${g.lpWallSec}%.1fs " +
          f"lpMedIter=${g.lpMedIterSec}%.2fs prWall=${g.prWallSec}%.1fs " +
          f"prMedIter=${g.prMedIterSec}%.2fs")
        g
      }
      require(runs.map(_.lpFp).distinct.size == 1 &&
              runs.map(_.prFp).distinct.size == 1,
        "nondeterministic results across repetitions")
      val g0 = runs.head
      Level(cpus, g0.edges,
        g0.lpIters, runs.map(_.lpWallSec).min, runs.map(_.lpMedIterSec).min,
        g0.prIters, runs.map(_.prWallSec).min, runs.map(_.prMedIterSec).min,
        g0.lpFp, g0.prFp)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nSmall = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val nLarge = nSmall * 4
    val nodes = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "4000000").toLong
    val density = sys.env.getOrElse("SPARK_GRAFT_BENCH_DENSITY", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt

    val small = runAt(nSmall, nodes, density, reps)
    val large = runAt(nLarge, nodes, density, reps)

    require(small.lpFp == large.lpFp,
      s"LP results differ across parallelism: ${small.lpFp} vs ${large.lpFp}")
    require(small.prFp == large.prFp,
      s"PageRank results differ across parallelism: ${small.prFp} vs ${large.prFp}")

    val lpEff = large.lpTput / (4.0 * small.lpTput)
    val prEff = large.prTput / (4.0 * small.prTput)
    val eff = large.combinedTput / (4.0 * small.combinedTput)

    def lvl(l: Level): String =
      s"""{"cpus":${l.cpus},"lp_wall_sec":${f"${l.lpWall}%.2f"},""" +
      s""""lp_med_iter_sec":${f"${l.lpMedIter}%.3f"},"lp_iters":${l.lpIters},""" +
      s""""lp_edges_per_sec_per_superstep":${f"${l.lpTput}%.0f"},""" +
      s""""pr_wall_sec":${f"${l.prWall}%.2f"},""" +
      s""""pr_med_iter_sec":${f"${l.prMedIter}%.3f"},"pr_iters":${l.prIters},""" +
      s""""pr_edges_per_sec_per_superstep":${f"${l.prTput}%.0f"}}"""

    println(
      s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio",""" +
      s""""nodes":$nodes,"density":$density,"edges":${small.edges},""" +
      s""""results_identical":true,"n_small":$nSmall,"n_large":$nLarge,""" +
      s""""lp_eff":${f"$lpEff%.3f"},"pr_eff":${f"$prEff%.3f"},""" +
      s""""small":${lvl(small)},"large":${lvl(large)}}""")
  }
}
