package graft.tools

import graft.Bench
import graft.algo.LabelPropagation
import graft.gen.SyntheticGraph

/** Interleaved same-JVM A/B of the loop's materializing action
  * (toRdd-consume vs count()) × state-leaf (LogicalRDD vs InMemoryRelation)
  * on the 4M-node synthetic LP run — the workload where a regression was
  * suspected after the r4 materializeObserved change. Fingerprints must be
  * identical across all variants.
  *
  * Usage: scripts/run_main.sh graft.tools.LpActionProbe [nodes] [reps]
  */
object LpActionProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus, "lp-action-probe")
    val edges = SyntheticGraph.randomEdges(spark, n, 10)
    val seeds = SyntheticGraph.seeds(spark, n)
    Bench.graphBench(spark, 10000L, 10) // warm-up
    val variants = sys.env.getOrElse(
      "SPARK_GRAFT_PROBE_VARIANTS", "rdd:rdd,count:imr")
      .split(",").map(_.trim.split(":")).map(a => (a(0), a(1))).toSeq
    for (r <- 1 to reps; (action, leaf) <- variants) {
      sys.props("graft.loop.action") = action
      sys.props("graft.state.leaf") = leaf
      val t = Bench.timed(LabelPropagation.run(edges, seeds))
      val med = t.value.stats.map(_.computeMs).sorted.apply(t.value.stats.size / 2)
      println(f"[probe] rep=$r action=$action leaf=$leaf wall=${t.sec}%.1fs " +
        f"iters=${t.value.iterations} medIterMs=$med " +
        f"fp=${graft.algo.ConnectedComponents.fingerprint64(t.value.labels.toDF())}")
      t.value.release()
    }
    sys.props.remove("graft.loop.action")
    sys.props.remove("graft.state.leaf")
    spark.stop()
  }
}
