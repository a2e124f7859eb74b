package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.{Bench, Tables}
import graft.algo.{ConnectedComponents, TriangleCount}
import graft.gen.SyntheticGraph

/** Interleaved same-JVM A/B of the r5 triangle-count plan (shuffled-hash
  * hints + single-long packed closing-join keys, BENCH.md §12/§16 recipes)
  * against the r3 shape (`graft.tc.packexchange=0`: unhinted Catalyst join
  * choice, two-long pair join keys).
  *
  * Per-vertex triangle counts are fingerprint-asserted identical across
  * variants and reps. Reports wall seconds and the run's total shuffle
  * write (a stage-completion listener scoped to each run).
  *
  * Usage: scripts/run_main.sh graft.tools.TriangleProbe [reps] [sfDir|synth:N]
  */
object TriangleProbe {
  final class ShuffleTally extends SparkListener {
    @volatile var bytes = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus, "triangle-probe")
    val edges = (if (src.startsWith("synth:"))
      SyntheticGraph.randomEdges(spark, src.stripPrefix("synth:").toLong, 10)
    else Tables.edges(spark, src)).cache()
    println(s"edges=${edges.count()}")
    // warm-up: JIT + memory-manager growth (same rule as the §12 probes)
    TriangleCount.run(edges.limit(50000)).release()

    var fps = Set.empty[Long]
    val order = if (sys.env.get("SPARK_GRAFT_PROBE_ORDER").contains("rev"))
      Seq("pair", "pack") else Seq("pack", "pair")
    for (r <- 1 to reps; variant <- order) {
      if (variant == "pair") sys.props("graft.tc.packexchange") = "0"
      else sys.props.remove("graft.tc.packexchange")
      val tally = new ShuffleTally
      spark.sparkContext.addSparkListener(tally)
      val t = Bench.timed(TriangleCount.run(edges))
      val fp = ConnectedComponents.fingerprint64(t.value.counts.toDF())
      spark.sparkContext.removeSparkListener(tally)
      fps += fp
      println(f"rep=$r variant=$variant wall=${t.sec}%.1fs " +
        f"total=${t.value.totalTriangles} shuffle_write_mb=${tally.bytes / 1e6}%.1f fp=$fp")
      t.value.release()
    }
    sys.props.remove("graft.tc.packexchange")
    require(fps.size == 1, s"fingerprint mismatch across variants: $fps")
    println(s"fingerprints identical: ${fps.head}")
    spark.stop()
  }
}
