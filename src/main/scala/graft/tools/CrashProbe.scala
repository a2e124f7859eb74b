package graft.tools

import graft.algo.LabelPropagation
import graft.gen.SyntheticGraph
import graft.model._

/** Scratch probe: reproduce the InMemoryRelation.withOutput attribute-map
  * crash seen with cache-backed loop state views.
  */
object CrashProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      for (n <- Seq(50L, 200L, 1000L); d <- Seq(2, 5); s <- Seq(1L, 2L)) {
        val edges = spark.createDataset(
          SyntheticGraph.randomEdgesLocal(n, d, seed = s).map { case (a, b) => Edge(a, b) })
        val seeds = spark.createDataset(
          SyntheticGraph.seedsLocal(n).toSeq.map { case (k, l) => Seed(k, l) })
        val res = LabelPropagation.run(edges, seeds)
        println(s"n=$n d=$d s=$s iters=${res.iterations} labels=${res.labels.count()}")
      }
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        sys.exit(1)
    }
    spark.stop()
  }
}
