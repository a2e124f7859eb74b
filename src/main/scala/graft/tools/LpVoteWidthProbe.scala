package graft.tools

import graft.Bench
import graft.algo.LabelPropagation
import graft.gen.SyntheticGraph

/** Interleaved same-JVM A/B of the LP vote-row width: unit-weight graphs
  * can drop the constant w column from the per-superstep vote exchange
  * (sum(w) ≡ count(*) — see the `unitW` branch in
  * [[graft.algo.LabelPropagation.run]]). Reps alternate dropw/keepw inside
  * one host-drift window; per-vertex fingerprints must be identical.
  *
  * Usage: scripts/run_main.sh graft.tools.LpVoteWidthProbe [nodes] [reps]
  */
object LpVoteWidthProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus, "lp-vote-width-probe")
    val edges = SyntheticGraph.randomEdges(spark, n, 10)
    val seeds = SyntheticGraph.seeds(spark, n)
    Bench.graphBench(spark, 10000L, 10) // warm-up
    // SPARK_GRAFT_PROBE_ORDER=rev runs the weighted variant first in each
    // pair — the JVM's first big run is systematically slowest (JIT +
    // memory-manager growth outlive the 10K warm-up), so a one-order probe
    // biases against whichever variant leads
    val order = if (sys.env.get("SPARK_GRAFT_PROBE_ORDER").contains("rev"))
      Seq("1", "0") else Seq("0", "1")
    for (r <- 1 to reps; keepw <- order) {
      sys.props("graft.lp.keepw") = keepw
      val t = Bench.timed(LabelPropagation.run(edges, seeds))
      val med = t.value.stats.map(_.computeMs).sorted.apply(t.value.stats.size / 2)
      val shufW = t.value.stats.flatMap(_.phases).map(_.shuffleWriteBytes).sum
      println(f"[probe] rep=$r keepw=$keepw wall=${t.sec}%.1fs " +
        f"iters=${t.value.iterations} medIterMs=$med " +
        f"shufWriteMB=${shufW / 1e6}%.0f " +
        f"fp=${graft.algo.ConnectedComponents.fingerprint64(t.value.labels.toDF())}")
      t.value.release()
    }
    sys.props.remove("graft.lp.keepw")
    spark.stop()
  }
}
