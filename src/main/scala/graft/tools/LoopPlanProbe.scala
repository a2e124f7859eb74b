package graft.tools

import graft.Bench
import graft.algo.{ConnectedComponents, LabelPropagation, PageRank}
import graft.gen.SyntheticGraph

/** Interleaved same-JVM A/B of the r5 loop-plan fixes (Superstep.shj
  * shuffled-hash hints + LabelPropagation's packed-long vote + the
  * unit-weight narrow vote rows) against the r4 plan shape (sort-merge
  * joins, struct vote → SortAggregate, weighted rows). Variants alternate
  * inside one host-drift window; per-vertex fingerprints must be
  * identical.
  *
  * Usage: scripts/run_main.sh graft.tools.LoopPlanProbe [nodes] [reps] [algos]
  */
object LoopPlanProbe {
  private val LegacyProps =
    Seq("graft.loop.legacyplan", "graft.lp.structvote", "graft.lp.keepw")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val reps = if (args.length > 1) args(1).toInt else 2
    val algos = if (args.length > 2) args(2).split(",").toSeq
      else Seq("lp", "pr")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus, "loop-plan-probe")
    val edges = SyntheticGraph.randomEdges(spark, n, 10)
    val seeds = SyntheticGraph.seeds(spark, n)
    Bench.graphBench(spark, 10000L, 10) // warm-up
    val order = if (sys.env.get("SPARK_GRAFT_PROBE_ORDER").contains("rev"))
      Seq("legacy", "r5") else Seq("r5", "legacy")
    for (r <- 1 to reps; variant <- order; algo <- algos) {
      if (variant == "legacy") LegacyProps.foreach(sys.props(_) = "1")
      else LegacyProps.foreach(sys.props.remove)
      val (wall, iters, med, fp) = algo match {
        case "lp" =>
          val t = Bench.timed(LabelPropagation.run(edges, seeds))
          val m = t.value.stats.map(_.computeMs).sorted
            .apply(t.value.stats.size / 2)
          val f = ConnectedComponents.fingerprint64(t.value.labels.toDF())
          t.value.release()
          (t.sec, t.value.iterations, m, f)
        case "pr" =>
          val t = Bench.timed(PageRank.run(edges, maxIter = 25))
          val m = t.value.stats.map(_.computeMs).sorted
            .apply(t.value.stats.size / 2)
          // ranks are FP: fingerprint 6dp-rounded values like ScalingBench
          import org.apache.spark.sql.functions._
          val f = ConnectedComponents.fingerprint64(t.value.ranks.toDF()
            .select(col("id"), round(col("rank"), 6).as("r")))
          t.value.release()
          (t.sec, t.value.iterations, m, f)
        case "cc" =>
          val t = Bench.timed(ConnectedComponents.run(edges))
          val m = t.value.stats.map(_.computeMs).sorted
            .apply(t.value.stats.size / 2)
          val f = ConnectedComponents.fingerprint64(t.value.components.toDF())
          t.value.release()
          (t.sec, t.value.iterations, m, f)
        case "star" =>
          // the driver bench's high-diameter shape: star contraction on a
          // 1M-node path graph (Bench.scala cc_star_path1m)
          import spark.implicits._
          val path = spark.range(999999L)
            .select($"id".as("src"), ($"id" + 1L).as("dst"))
            .as[graft.model.Edge]
          val t = Bench.timed(ConnectedComponents.runStar(path))
          val m = t.value.stats.map(_.computeMs).sorted
            .apply(t.value.stats.size / 2)
          val f = ConnectedComponents.fingerprint64(t.value.components.toDF())
          t.value.release()
          (t.sec, t.value.iterations, m, f)
      }
      println(f"[probe] rep=$r variant=$variant algo=$algo wall=$wall%.1fs " +
        f"iters=$iters medIterMs=$med fp=$fp")
    }
    LegacyProps.foreach(sys.props.remove)
    spark.stop()
  }
}
