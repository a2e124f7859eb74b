package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo._
import graft.gen.SyntheticGraph
import graft.model._
import graft.text.{Dedup, TextAnalysis}

/** Headline benchmark — one JSON line on stdout for the driver.
  *
  * Times the engine's flagship workloads at `SPARK_GRAFT_SF_DIR`:
  *  - LP + PageRank + CC + triangles on the lineitem-derived graph
  *  - LP + PageRank to convergence on the reference-topology synthetic
  *    random graph (n = SPARK_GRAFT_BENCH_NODES, default 100K, density 10 —
  *    the reference campaign's smallest point, `run_spark_graph_benchmarks
  *    .py:464`), reporting edges·iterations/sec — the north-rule metric
  *  - dedup + text-analysis sweep over `documents`
  *
  * Cores come from SPARK_GRAFT_CPUS (default 32); shuffle partitions track
  * cores so the identical job rescales with parallelism (the two-level
  * scaling evidence is produced by ScalingBench).
  */
object Bench {

  final case class Timed[T](value: T, sec: Double)
  def timed[T](f: => T): Timed[T] = {
    val t0 = System.nanoTime()
    val v = f
    Timed(v, (System.nanoTime() - t0) / 1e9)
  }

  def session(cpus: Int, app: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.default.parallelism", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** LP + PR on the synthetic reference graph; returns (lpSec, lpIters,
    * prSec, prIters, edges, perVertexFingerprint).
    */
  def graphBench(spark: SparkSession, n: Long, density: Int)
      : (Double, Int, Double, Int, Long, Long, Long) = {
    val edges = SyntheticGraph.randomEdges(spark, n, density)
    val seeds = SyntheticGraph.seeds(spark, n)
    val lp = timed(LabelPropagation.run(edges, seeds))
    val lpFp = ConnectedComponents.fingerprint64(lp.value.labels.toDF())
    val pr = timed(PageRank.run(edges))
    val prFp = ConnectedComponents.fingerprint64(
      pr.value.ranks.toDF().select(col("id"), round(col("rank"), 6).as("r")))
    (lp.sec, lp.value.iterations, pr.sec, pr.value.iterations,
      n * density, lpFp, prFp)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchNodes = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "100000").toLong
    val spark = session(cpus, "graft-bench")
    import spark.implicits._

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var extras = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // lineitem-derived graph workloads
    val e = Tables.edges(spark, sfDir).cache()
    val nEdges = e.count()
    val sd = Tables.seeds(spark, sfDir)
    val lp = timed(LabelPropagation.run(e, sd))
    results += "lp_derived" -> lp.sec
    val pr = timed(PageRank.run(e))
    results += "pagerank_derived" -> pr.sec
    val cc = timed(ConnectedComponents.run(e))
    results += "cc_derived" -> cc.sec
    val tc = timed(TriangleCount.run(e))
    results += "triangles_derived" -> tc.sec

    // synthetic reference-topology graph, north-rule metric
    val g = timed(graphBench(spark, benchNodes, 10))
    val (lpSec, lpIters, prSec, prIters, synEdges, _, _) = g.value
    results += "lp_synth" -> lpSec
    results += "pagerank_synth" -> prSec
    val lpThroughput = synEdges.toDouble * lpIters / lpSec
    val prThroughput = synEdges.toDouble * prIters / prSec
    extras += "lp_synth_iters" -> lpIters.toString
    extras += "pr_synth_iters" -> prIters.toString
    extras += "synth_edges" -> synEdges.toString
    extras += "lp_edges_iters_per_sec" -> f"$lpThroughput%.0f"
    extras += "pr_edges_iters_per_sec" -> f"$prThroughput%.0f"

    // documents pipeline sweep
    val docs = Tables.table(spark, sfDir, "documents").cache()
    docs.count()
    results += "text_analyze" ->
      timed(TextAnalysis.analyze(docs).agg(sum($"n_tokens")).head()).sec
    results += "minhash_neardups" ->
      timed(Dedup.minhashNearDups(docs, threshold = 0.7).count()).sec
    results += "simhash_neardups" ->
      timed(Dedup.simhashNearDups(docs).count()).sec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ex = extras.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","cpus":$cpus,"derived_edges":$nEdges,"extras":$ex}""")
    spark.stop()
  }
}
