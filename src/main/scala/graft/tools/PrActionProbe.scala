package graft.tools

import graft.Bench
import graft.algo.PageRank
import graft.gen.SyntheticGraph

/** Interleaved same-JVM A/B of the loop's materializing action (default
  * toRdd-consume vs count()) on the SYNTH PageRank run — the 100K-vertex /
  * 1M-edge × 75-superstep regime where the r4 driver bench showed the
  * per-superstep median dropping from 2.79M to ~2.15M edges/s vs r3
  * (count-based). The suspected cause is cache-consume width: count() over
  * an InMemoryRelation is column-pruned (batch row counts), while the
  * toRdd consume deserializes EVERY state column out of the columnar cache
  * each superstep — negligible at 2K vertices (scheduling-bound), O(state
  * bytes) at 100K+.
  *
  * Usage: scripts/run_main.sh graft.tools.PrActionProbe [nodes] [reps]
  */
object PrActionProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus, "pr-action-probe")
    spark.sparkContext.setLogLevel("ERROR")
    // the toRdd-vs-count action choice only exists on the IMR leaf path
    // (the r5 default "ckpt" leaf fuses its own action); pin it so the A/B
    // stays meaningful
    sys.props("graft.state.leaf") = "imr"
    val edges = SyntheticGraph.randomEdges(spark, n, 10)
    Bench.graphBench(spark, 10000L, 10) // JIT/classloading warm-up
    val meds = scala.collection.mutable.Map.empty[String, List[Long]]
    var fps = Set.empty[Long]
    for (r <- 1 to reps; action <- Seq("toRdd", "count")) {
      if (action == "count") sys.props("graft.loop.action") = "count"
      else sys.props.remove("graft.loop.action")
      val t = Bench.timed(PageRank.run(edges))
      val med = t.value.stats.map(_.computeMs).sorted.apply(t.value.stats.size / 2)
      meds(action) = med :: meds.getOrElse(action, Nil)
      fps += graft.algo.ConnectedComponents.fingerprint64(t.value.ranks.toDF())
      println(f"[probe] rep=$r action=$action wall=${t.sec}%.1fs " +
        f"iters=${t.value.iterations} medIterMs=$med")
      t.value.release()
    }
    sys.props.remove("graft.loop.action")
    require(fps.size == 1, s"actions disagree: $fps")
    for ((a, ms) <- meds.toSeq.sortBy(_._1))
      println(s"[probe] action=$a medIterMs min=${ms.min} all=${ms.reverse.mkString(",")}")
    spark.stop()
  }
}
