package graft.tools

import graft.Bench
import graft.algo.{ConnectedComponents, LabelPropagation}
import graft.gen.SyntheticGraph

/** Interleaved same-JVM A/B of the packed single-long exchange rows (r5)
  * against the pair rows: `graft.lp.packexchange` for LP's vote exchange,
  * `graft.cc.packexchange` for star CC's two per-round distinct()
  * exchanges — both target the measured DRAM ceiling at full occupancy
  * (BENCH.md §11b). Variants alternate inside one drift window; per-vertex
  * fingerprints must be identical.
  *
  * Usage: scripts/run_main.sh graft.tools.PackExchangeProbe [nodes] [reps] [lp|star]
  */
object PackExchangeProbe {
  private val Props = Seq("graft.lp.packexchange", "graft.cc.packexchange")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val reps = if (args.length > 1) args(1).toInt else 2
    val algo = if (args.length > 2) args(2) else "lp"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus, "pack-exchange-probe")
    import spark.implicits._
    val edges = SyntheticGraph.randomEdges(spark, n, 10)
    val seeds = SyntheticGraph.seeds(spark, n)
    // the driver bench's high-diameter shape (Bench.scala cc_star_path1m)
    val path = spark.range(n - 1)
      .select($"id".as("src"), ($"id" + 1L).as("dst"))
      .as[graft.model.Edge]
    Bench.graphBench(spark, 10000L, 10) // warm-up
    var fps = Set.empty[Long]
    val order = if (sys.env.get("SPARK_GRAFT_PROBE_ORDER").contains("rev"))
      Seq("pair", "pack") else Seq("pack", "pair")
    for (r <- 1 to reps; variant <- order) {
      if (variant == "pair") Props.foreach(sys.props(_) = "0")
      else Props.foreach(sys.props.remove)
      val (t, stats, fp) = algo match {
        case "star" =>
          val t = Bench.timed(ConnectedComponents.runStar(path))
          val f = ConnectedComponents.fingerprint64(t.value.components.toDF())
          t.value.release()
          (t.sec, t.value.stats, f)
        case _ =>
          val t = Bench.timed(LabelPropagation.run(edges, seeds))
          val f = ConnectedComponents.fingerprint64(t.value.labels.toDF())
          t.value.release()
          (t.sec, t.value.stats, f)
      }
      val med = stats.map(_.computeMs).sorted.apply(stats.size / 2)
      val shufMb = stats.flatMap(_.phases)
        .map(w => w.shuffleWriteBytes).sum / 1e6
      fps += fp
      println(f"rep=$r variant=$variant algo=$algo wall=$t%.1fs rounds=${stats.size} " +
        f"med_iter_ms=$med shuffle_write_mb=$shufMb%.1f fp=$fp")
    }
    Props.foreach(sys.props.remove)
    require(fps.size == 1, s"fingerprint mismatch across variants: $fps")
    println(s"fingerprints identical: ${fps.head}")
    spark.stop()
  }
}
