package graft.tools

import graft.algo.PageRank
import graft.gen.SyntheticGraph
import graft.model.RunConfig

/** Scratch probe: PageRank batched vs unbatched, alternated inside ONE
  * warmed JVM so JIT/classloading and slow host drift cancel — single
  * fresh-JVM samples on this box vary by 1.5×, far above the effect size.
  */
object PrBatchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "100000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = graft.Bench.session(cpus, "pr-batch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val edges = SyntheticGraph.randomEdges(spark, n, 10)
    // warm-up at a small size
    PageRank.run(SyntheticGraph.randomEdges(spark, 10000L, 10))
    val results = scala.collection.mutable.Map.empty[Int, List[Double]]
    for (r <- 1 to reps; k <- Seq(1, 4)) {
      val t0 = System.nanoTime()
      val res = PageRank.run(edges, cfg = RunConfig(batchK = k))
      val sec = (System.nanoTime() - t0) / 1e9
      results(k) = sec :: results.getOrElse(k, Nil)
      println(f"rep=$r batchK=$k wall=$sec%.1fs iters=${res.iterations}")
    }
    for ((k, ts) <- results.toSeq.sortBy(_._1))
      println(f"batchK=$k min=${ts.min}%.1fs all=${ts.map(t => f"$t%.1f").mkString(",")}")
    spark.stop()
  }
}
