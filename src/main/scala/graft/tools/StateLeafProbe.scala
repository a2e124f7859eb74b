package graft.tools

import graft.Bench
import graft.algo.{ConnectedComponents, LabelPropagation, PageRank}
import graft.gen.SyntheticGraph

/** Interleaved same-JVM A/B of the loop's state-leaf mode (r5 "ckpt" —
  * materialize + copy + localCheckpoint fused into the one superstep job,
  * flat LogicalRDD leaf — vs r4 "imr" — columnar InMemoryRelation leaf with
  * a separate Dataset.localCheckpoint job every 8 supersteps) on the
  * north-rule synthetic workload (LP seeded + PageRank to convergence).
  * Per-vertex fingerprints are hard-asserted identical across modes and
  * reps — the leaf is a materialization detail, never a semantics change.
  *
  * Usage: scripts/run_main.sh graft.tools.StateLeafProbe [nodes] [reps]
  *        SPARK_GRAFT_PROBE_MODES=ckpt,imr (order within each rep)
  */
object StateLeafProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val modes = sys.env.getOrElse("SPARK_GRAFT_PROBE_MODES", "ckpt,imr")
      .split(",").map(_.trim).toSeq
    val spark = Bench.session(cpus, "state-leaf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val edges = SyntheticGraph.randomEdges(spark, n, 10)
    val seeds = SyntheticGraph.seeds(spark, n)
    Bench.graphBench(spark, 10000L, 10) // JIT/classloading warm-up
    val meds = scala.collection.mutable.Map.empty[String, List[(Long, Long)]]
    val walls = scala.collection.mutable.Map.empty[String, List[(Double, Double)]]
    var lpFps = Set.empty[Long]
    var prFps = Set.empty[Long]
    def med(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val skipPr = sys.env.contains("SPARK_GRAFT_PROBE_SKIP_PR")
    val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions")
    for (r <- 1 to reps; mode <- modes) {
      // mode variants named like "ckpt16" set the shuffle width too (the
      // PrFixedCostProbe convention) — the loop repartitions its contrib
      // and state tables at the session width, so this is the loop width
      val (leafName, width) = mode.span(!_.isDigit)
      spark.conf.set("spark.sql.shuffle.partitions",
        if (width.nonEmpty) width else sessionWidth)
      sys.props("graft.state.leaf") = leafName
      val lp = Bench.timed(LabelPropagation.run(edges, seeds))
      val lpMed = med(lp.value.stats.map(_.computeMs))
      val lpIters = lp.value.iterations
      lpFps += ConnectedComponents.fingerprint64(lp.value.labels.toDF())
      lp.value.release()
      val (prMed, prSec, prIters) = if (skipPr) (0L, 0.0, 0) else {
        val pr = Bench.timed(PageRank.run(edges))
        val m = med(pr.value.stats.map(_.computeMs))
        prFps += ConnectedComponents.fingerprint64(
          pr.value.ranks.toDF().select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.round(
              org.apache.spark.sql.functions.col("rank"), 6)))
        val out = (m, pr.sec, pr.value.iterations)
        pr.value.release()
        out
      }
      meds(mode) = (lpMed, prMed) :: meds.getOrElse(mode, Nil)
      walls(mode) = (lp.sec, prSec) :: walls.getOrElse(mode, Nil)
      println(f"[probe] rep=$r leaf=$mode lpWall=${lp.sec}%.1fs lpMedIterMs=$lpMed " +
        f"prWall=$prSec%.1fs prMedIterMs=$prMed iters=$lpIters/$prIters")
    }
    sys.props.remove("graft.state.leaf")
    require(lpFps.size == 1, s"LP fingerprints disagree across leaf modes: $lpFps")
    require(skipPr || prFps.size == 1,
      s"PR fingerprints disagree across leaf modes: $prFps")
    for (m <- modes) {
      val (lpMeds, prMeds) = meds(m).reverse.unzip
      val (lpW, prW) = walls(m).reverse.unzip
      println(s"[probe] leaf=$m lpMedIterMs min=${lpMeds.min} all=${lpMeds.mkString(",")} " +
        f"lpWall min=${lpW.min}%.1f prMedIterMs min=${prMeds.min} all=${prMeds.mkString(",")} " +
        f"prWall min=${prW.min}%.1f")
    }
    println("[probe] fingerprints identical across modes and reps")
    spark.stop()
  }
}
