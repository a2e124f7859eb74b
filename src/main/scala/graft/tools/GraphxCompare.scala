package graft.tools

import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph, VertexId, EdgeContext}
import org.apache.spark.sql.SparkSession
import graft.gen.SyntheticGraph
import graft.model._

/** Benchmark-only comparison of this engine's Dataset LP against a GraphX
  * implementation of the reference's published baseline semantics
  * (`spark_baseline/scripts/labelpropagation_graphx_shell.scala`) on the
  * identical synthetic graph and hardware. GraphX is NOT part of the
  * engine — this tool exists to quantify "matches-or-beats the reference's
  * own Spark baseline" (the reference's campaign stopped at 2M nodes
  * because GraphX exceeded its per-repetition budget).
  *
  * The GraphX side is an independent implementation of the same
  * superstep: aggregateMessages dst→src carrying (label → weight) maps,
  * majority with min tie-break, seeds pinned, stop when no vertex changed.
  */
object GraphxCompare {

  private val Unlabeled = -1L

  def graphxLp(spark: SparkSession, n: Long, density: Int,
               maxIter: Int): (Long, Int, Double) = {
    val sc = spark.sparkContext
    val edges = sc.parallelize(0L until n * density, sc.defaultParallelism)
      .map { k =>
        val i = k / density
        val j = k % density
        GxEdge(i, SyntheticGraph.target(42L, density, n, i, j), 1)
      }
    val seeds = (0L until n by 10).map(i => i -> (i % 4) * 100).toMap
    val bSeeds = sc.broadcast(seeds)
    val vertices = sc.parallelize(0L until n).map { id =>
      val l = bSeeds.value.getOrElse(id, Unlabeled)
      (id, (l, l != Unlabeled))
    }
    var g = GxGraph(vertices, edges).cache()
    g.vertices.count()

    val t0 = System.nanoTime()
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val msgs = g.aggregateMessages[Map[Long, Long]](
        (ctx: EdgeContext[(Long, Boolean), Int, Map[Long, Long]]) => {
          val dstLabel = ctx.dstAttr._1
          if (dstLabel != Unlabeled) ctx.sendToSrc(Map(dstLabel -> 1L))
        },
        (a, b) => (a.keySet ++ b.keySet).iterator
          .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
      val updated = g.outerJoinVertices(msgs) {
        case (_, (label, seeded), opt) =>
          if (seeded) (label, seeded, false)
          else opt match {
            case Some(counts) if counts.nonEmpty =>
              val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
              (best, seeded, best != label)
            case _ => (label, seeded, false)
          }
      }.cache()
      changed = updated.vertices.filter(_._2._3).count()
      val next = updated.mapVertices { case (_, (l, s, _)) => (l, s) }.cache()
      next.vertices.count()
      g.unpersist(blocking = false)
      updated.unpersist(blocking = false)
      g = next
      iter += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val labeled = g.vertices.filter(_._2._1 != Unlabeled).count()
    (labeled, iter, sec)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "1000000").toLong
    val density = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.session(cpus, "graphx-compare")
    import spark.implicits._

    // our engine
    val t0 = System.nanoTime()
    val lp = graft.algo.LabelPropagation.run(
      SyntheticGraph.randomEdges(spark, n, density),
      SyntheticGraph.seeds(spark, n))
    val oursSec = (System.nanoTime() - t0) / 1e9
    val oursLabeled = lp.labels.count()

    val (gxLabeled, gxIters, gxSec) = graphxLp(spark, n, density, DefaultMaxIter)

    require(gxLabeled == oursLabeled,
      s"labeled-count mismatch: graphx $gxLabeled vs ours $oursLabeled")
    println(
      s"""{"metric":"lp_vs_graphx","nodes":$n,"edges":${n * density},"cpus":$cpus,""" +
      s""""ours_sec":${f"$oursSec%.2f"},"ours_iters":${lp.iterations},""" +
      s""""graphx_sec":${f"$gxSec%.2f"},"graphx_iters":$gxIters,""" +
      s""""speedup":${f"${gxSec / oursSec}%.2f"},"labeled":$oursLabeled}""")
    spark.stop()
  }
}
