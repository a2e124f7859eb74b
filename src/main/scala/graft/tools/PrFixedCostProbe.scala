package graft.tools

import graft.{Bench, Tables}
import graft.algo.PageRank

/** Attribute the residual per-superstep driver fixed cost of
  * `pagerank_derived` (VERDICT r3 task 3): at sf0.1 the derived graph is
  * ~2K vertices / 600K edges — the extreme fixed-cost regime, where the
  * gather+apply stage windows (~300 ms) explain barely half of the
  * ~0.55 s/superstep wall. Runs the exact driver-bench query under
  * SPARK_GRAFT_LOOP_TIMERS so every superstep prints its
  * build / plan / count / obsGet / total split, interleaved over `reps`
  * runs in ONE warmed JVM (host drift makes cross-JVM comparison useless).
  *
  * Usage: SPARK_GRAFT_LOOP_TIMERS=1 scripts/run_main.sh \
  *          graft.tools.PrFixedCostProbe [sfDir] [reps]
  */
object PrFixedCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus, "pr-fixed-cost-probe")

    val e = Tables.edges(spark, sfDir).cache()
    val nEdges = e.count()
    println(s"[probe] derived edges=$nEdges cpus=$cpus reps=$reps")
    // interleave (stateLeaf, localCheckpointEvery) variants in ONE warmed
    // JVM (the only timing protocol this host's hour-scale drift permits)
    val variants = sys.env.getOrElse("SPARK_GRAFT_PROBE_VARIANTS", "imr:8,rdd:8,rdd:75")
      .split(",").map(_.trim.split(":")).map(a => (a(0), a(1).toInt)).toSeq
    for (r <- 1 to reps; (leaf, lce) <- variants) {
      // leaf variants named like "imr8" set the shuffle width too
      val (leafName, width) = leaf.span(!_.isDigit)
      if (width.nonEmpty) spark.conf.set("spark.sql.shuffle.partitions", width)
      sys.props("graft.state.leaf") = leafName
      val cfg = graft.model.RunConfig(localCheckpointEvery = lce)
      val t = Bench.timed(PageRank.run(e, cfg = cfg))
      val med = t.value.stats.map(_.computeMs).sorted.apply(t.value.stats.size / 2)
      println(f"[probe] rep=$r leaf=$leaf lce=$lce wall=${t.sec}%.1fs iters=${t.value.iterations} " +
        f"medIterMs=$med fp=${graft.algo.ConnectedComponents.fingerprint64(
          t.value.ranks.toDF())}")
      t.value.release()
    }
    sys.props.remove("graft.state.leaf")
    spark.stop()
  }
}
