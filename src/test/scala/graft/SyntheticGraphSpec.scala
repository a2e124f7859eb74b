package graft

import graft.gen.SyntheticGraph
import org.apache.spark.sql.functions._

/** Generator determinism: the distributed column pipeline must equal the
  * serial mirror bit-for-bit at any parallelism (this is the fixed-input
  * precondition of the two-parallelism scaling benchmark).
  */
class SyntheticGraphSpec extends SparkSpec {
  import spark.implicits._

  test("column splitmix64 == scala splitmix64") {
    val xs = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    val got = spark.createDataset(xs).toDF("x")
      .select(SyntheticGraph.splitmix64Col($"x")).as[Long].collect()
    got shouldBe xs.map(SyntheticGraph.splitmix64).toArray
  }

  test("distributed random edges == serial mirror, any partitioning") {
    val n = 200L
    val expected = SyntheticGraph.randomEdgesLocal(n, 4).sorted
    val base = SyntheticGraph.randomEdges(spark, n, 4)
      .collect().map(e => (e.src, e.dst)).toSeq.sorted
    base shouldBe expected
    val repart = SyntheticGraph.randomEdges(spark, n, 4).repartition(13)
      .collect().map(e => (e.src, e.dst)).toSeq.sorted
    repart shouldBe expected
  }

  test("edges have no self-loops and targets in range") {
    val edges = SyntheticGraph.randomEdgesLocal(100, 10)
    edges.foreach { case (s, d) =>
      s should not be d
      d should (be >= 0L and be < 100L)
    }
    edges.size shouldBe 1000
  }

  test("seed rule: every 10th node, label (i%4)*100") {
    val s = SyntheticGraph.seeds(spark, 50L).collect().map(x => x.node -> x.label).toMap
    s shouldBe SyntheticGraph.seedsLocal(50L)
    s(0L) shouldBe 0L
    s(10L) shouldBe 200L
    s(20L) shouldBe 0L
    s(30L) shouldBe 200L
  }

  test("ring edges match the legacy generator rule") {
    val got = SyntheticGraph.ringEdges(spark, 6L, 2)
      .collect().map(e => (e.src, e.dst)).toSeq.sorted
    val expected = (for {
      i <- 0L until 6L; o <- 1L to 2L
    } yield (i, (i + o) % 6)).sorted
    got shouldBe expected
  }

  test("grid edges: reference formula, distributed == serial mirror") {
    // 3x3 grid (n=9, side=3), reference generate_grid_graph semantics
    val expected9 = Seq(
      (0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L), (6L, 7L), (7L, 8L), // right
      (0L, 3L), (1L, 4L), (2L, 5L), (3L, 6L), (4L, 7L), (5L, 8L)) // down
    SyntheticGraph.gridEdgesLocal(9).sorted shouldBe expected9.sorted
    SyntheticGraph.gridEdges(spark, 9).collect()
      .map(e => (e.src, e.dst)).toSeq.sorted shouldBe expected9.sorted
    // non-square n: truncated last row, still mirror-equal
    val n = 37L
    SyntheticGraph.gridEdges(spark, n).collect()
      .map(e => (e.src, e.dst)).toSeq.sorted shouldBe
      SyntheticGraph.gridEdgesLocal(n).sorted
  }

  test("small-world edges: distributed == serial mirror, WS shape") {
    val (n, k, p) = (300L, 6, 0.2)
    val local = SyntheticGraph.smallWorldEdgesLocal(n, k, p)
    val dist = SyntheticGraph.smallWorldEdges(spark, n, k, p)
      .collect().map(e => (e.src, e.dst)).toSeq
    dist.sorted shouldBe local.sorted
    // canonical, no self-loops, about n*k/2 edges (rewiring dedup loses a few)
    dist.foreach { case (a, b) => a should be < b }
    dist.size.toDouble shouldBe (n * k / 2).toDouble +- n * k * 0.05
    // some but not all edges rewired out of the lattice band
    val nonLattice = dist.count { case (a, b) =>
      val d = math.min(b - a, n - (b - a)); d > k / 2
    }
    nonLattice.toDouble shouldBe (n * k / 2 * p) +- n * k * 0.08
  }

  test("community edges: distributed == serial mirror, dense intra / sparse inter") {
    val n = 400L
    val local = SyntheticGraph.communityEdgesLocal(n, 4, 0.3, 0.01)
    val dist = SyntheticGraph.communityEdges(spark, n, 4, 0.3, 0.01)
      .collect().map(e => (e.src, e.dst)).toSeq
    dist.sorted shouldBe local.sorted
    def comm(i: Long): Long = math.min(i / 100, 3L)
    val (intra, inter) = dist.partition { case (a, b) => comm(a) == comm(b) }
    // every node draws round(0.3*99/2)=15 intra and round(0.01*300/2)=2 inter
    intra.size should be > inter.size * 5
    inter.size should be > 0
    dist.foreach { case (a, b) =>
      a should be < b
      b should be < n
    }
  }
}
