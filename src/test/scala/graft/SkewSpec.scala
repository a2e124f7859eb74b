package graft

import graft.algo.{LabelPropagation, PageRank}
import graft.gen.SyntheticGraph
import graft.model._

/** Hub-skew salting: salted plans must produce identical results to the
  * unsalted ones (labels exact; PageRank within FP-reassociation noise) on
  * a graph with a hot hub key.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hub graph: every node links to node 0 (hot gather key), node 0 links
  // back to a few, plus random background edges
  private val hubEdges: Seq[(Long, Long)] = {
    val toHub = (1L to 300L).map(i => (i, 0L))
    val fromHub = (1L to 10L).map(i => (0L, i))
    val background = SyntheticGraph.randomEdgesLocal(300, 2, seed = 31L)
      .map { case (s, d) => (s + 1, d + 1) }
    toHub ++ fromHub ++ background
  }

  private def ds(edges: Seq[(Long, Long)]) =
    spark.createDataset(edges.map { case (s, d) => Edge(s, d) })

  test("LP: salted == unsalted on a hub graph") {
    val seeds = spark.createDataset(Seq(Seed(0L, 100L), Seed(7L, 300L)))
    val plain = LabelPropagation.run(ds(hubEdges), seeds)
      .labels.collect().map(v => v.id -> v.label).toMap
    val salted = LabelPropagation.run(ds(hubEdges), seeds,
      RunConfig(hubSaltK = 4, hubDegreeThreshold = 20))
      .labels.collect().map(v => v.id -> v.label).toMap
    salted shouldBe plain
  }

  test("PR: salted == unsalted on a hub graph (1e-9)") {
    val plain = PageRank.run(ds(hubEdges))
      .ranks.collect().map(r => r.id -> r.rank).toMap
    val salted = PageRank.run(ds(hubEdges),
      cfg = RunConfig(hubSaltK = 4, hubDegreeThreshold = 20))
      .ranks.collect().map(r => r.id -> r.rank).toMap
    salted.keySet shouldBe plain.keySet
    salted.foreach { case (k, v) => v shouldBe plain(k) +- 1e-9 }
  }

  test("auto mode engages on a hub graph and stays identical to unsalted") {
    import graft.graph.SkewJoin
    import org.apache.spark.sql.functions._
    val packed = ds(hubEdges).groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    // detection: the hub's 300-row dst key is hot at threshold 20...
    val p = SkewJoin.plan(packed, "dst", "src", SkewJoin.AutoK, 20)
    p.isDefined shouldBe true
    p.get.nHot shouldBe 1L
    // ...and a uniform graph yields no plan at all (zero loop overhead)
    val uniform = spark.createDataset(
      SyntheticGraph.randomEdgesLocal(100, 3, seed = 17L)
        .map { case (s, d) => Edge(s, d) })
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    SkewJoin.plan(uniform, "dst", "src", SkewJoin.AutoK, 1000) shouldBe None
    // end-to-end: auto (default cfg + low threshold) == explicitly disabled
    val seeds = spark.createDataset(Seq(Seed(0L, 100L), Seed(7L, 300L)))
    val auto = LabelPropagation.run(ds(hubEdges), seeds,
      RunConfig(hubDegreeThreshold = 20)) // hubSaltK stays -1 = auto
      .labels.collect().map(v => v.id -> v.label).toMap
    val off = LabelPropagation.run(ds(hubEdges), seeds,
      RunConfig(hubSaltK = 1))
      .labels.collect().map(v => v.id -> v.label).toMap
    auto shouldBe off
  }

  test("salting ignores graphs with no hot keys (same results, plan built)") {
    val edges = SyntheticGraph.randomEdgesLocal(100, 3, seed = 3L)
    val seeds = spark.createDataset(
      SyntheticGraph.seedsLocal(100).toSeq.map { case (n, l) => Seed(n, l) })
    val plain = LabelPropagation.run(ds(edges), seeds)
      .labels.collect().map(v => v.id -> v.label).toMap
    val salted = LabelPropagation.run(ds(edges), seeds,
      RunConfig(hubSaltK = 8, hubDegreeThreshold = 1000))
      .labels.collect().map(v => v.id -> v.label).toMap
    salted shouldBe plain
  }
}
