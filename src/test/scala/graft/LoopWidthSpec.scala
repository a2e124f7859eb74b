package graft

import graft.model._
import graft.algo.{ConnectedComponents, LabelPropagation, PageRank, Paths, Superstep}
import graft.gen.SyntheticGraph
import graft.oracle.SerialOracles
import org.apache.spark.sql.functions.round

/** The round-4 loop fixed-cost paths: the tiny-state narrow shuffle width
  * (Superstep.autoWidth + the per-algo loopWidth wiring) and the count()
  * materializing-action escape hatch (graft.loop.action) must both produce
  * results identical to the default path — they are performance choices,
  * never semantic ones.
  */
class LoopWidthSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDs(edges: Seq[(Long, Long)]) =
    spark.createDataset(edges.map { case (s, d) => Edge(s, d) })

  test("autoWidth: tiny states narrow to 8-way only under a wider session") {
    Superstep.autoWidth(spark, 2000L) shouldBe None // test session is 8-way
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      Superstep.autoWidth(spark, 2000L) shouldBe Some(8)
      Superstep.autoWidth(spark, 16384L) shouldBe Some(8)
      Superstep.autoWidth(spark, 16385L) shouldBe None // big state: session width
    } finally spark.conf.set("spark.sql.shuffle.partitions", "8")
  }

  test("tiny-state loop width: LP/PR/CC/SSSP identical under a 32-way session") {
    val n = 200
    val edges = SyntheticGraph.randomEdgesLocal(n, 3, seed = 7L)
    val vertices = edges.flatMap { case (s, d) => Seq(s, d) }.distinct
    val seeds = Seq(1L -> 10L, 5L -> 20L, 9L -> 30L)
    val e = edgeDs(edges)
    val s = spark.createDataset(seeds.map { case (node, l) => Seed(node, l) })

    def fps(): Seq[Long] = {
      val lp = LabelPropagation.run(e, s)
      val pr = PageRank.run(e)
      val cc = ConnectedComponents.run(e)
      val ss = Paths.sssp(e.select($"src", $"dst",
        (($"src" + $"dst") % 5 + 1).cast("double").as("weight")).as[WEdge],
        source = vertices.min)
      val out = Seq(
        ConnectedComponents.fingerprint64(lp.labels.toDF()),
        ConnectedComponents.fingerprint64(
          pr.ranks.toDF().select($"id", round($"rank", 9).as("r"))),
        ConnectedComponents.fingerprint64(cc.components.toDF()),
        ConnectedComponents.fingerprint64(ss.dists.toDF()))
      Seq(lp.release, pr.release, cc.release, ss.release).foreach(_())
      out
    }

    val at8 = fps() // session width 8: autoWidth declines, loop runs 8-way anyway
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val at32 =
      try fps() // tiny state: autoWidth narrows the whole loop back to 8-way
      finally spark.conf.set("spark.sql.shuffle.partitions", "8")
    at32 shouldBe at8
    // and the narrowed CC still matches the serial oracle
    val got = ConnectedComponents.run(e)
    got.components.collect().map(c => c.id -> c.component).toMap shouldBe
      SerialOracles.connectedComponents(vertices, edges)
    got.release()
  }

  test("count-action escape hatch: identical result and per-step stats") {
    val edges = SyntheticGraph.randomEdgesLocal(300, 3, seed = 11L)
    val e = edgeDs(edges)
    def runOnce(): (Long, Seq[(Int, Long, Long)]) = {
      val r = PageRank.run(e)
      val fp = ConnectedComponents.fingerprint64(
        r.ranks.toDF().select($"id", round($"rank", 9).as("r")))
      val st = r.stats.map(s => (s.iteration, s.changed, s.rows))
      r.release()
      (fp, st)
    }
    val (fpDefault, stDefault) = runOnce()
    sys.props("graft.loop.action") = "count"
    val (fpCount, stCount) =
      try runOnce()
      finally sys.props.remove("graft.loop.action")
    fpCount shouldBe fpDefault
    stCount shouldBe stDefault
  }
}
