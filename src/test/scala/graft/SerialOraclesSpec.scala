package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.oracle.SerialOracles._

/** Golden algorithm fixtures from the reference's own test suites
  * (FIXTURES.md F1–F9), pinned against the serial oracle. These lock the
  * semantics the distributed engine is then differentially tested against.
  */
class SerialOraclesSpec extends AnyFunSuite with Matchers {

  // triangle used by ow-lp integration tests (ow-lp/src/lib.rs:1094-1138)
  private val triangle = Seq[(Long, Long)]((0, 1), (0, 2), (2, 0), (2, 1), (1, 0), (1, 2))

  test("F1 triangle supervised: seed 0→100 labels everything 100") {
    val r = labelPropagation(3, triangle, Map(0L -> 100L))
    r.map(_.get) shouldBe Array(100L, 100L, 100L)
  }

  test("F2 unsupervised triangle: min id 0 wins everywhere") {
    val r = labelPropagation(3, triangle, Map.empty)
    r.map(_.get) shouldBe Array(0L, 0L, 0L)
  }

  test("F3 conflicting seeds resolved by min before the run") {
    // dedup_seed_pairs keeps min label per node (ow-lp/src/lib.rs:224-235);
    // callers pass the deduped map
    val seeds = Map(0L -> math.min(50L, 30L))
    val r = labelPropagation(3, triangle, seeds)
    r.map(_.get) shouldBe Array(30L, 30L, 30L)
  }

  test("F4 direction probe: labels flow dst→src over out-edges") {
    val r = labelPropagation(2, Seq((0L, 1L)), Map(1L -> 7L))
    r(0) shouldBe Some(7L)
    r(1) shouldBe Some(7L)
    // reversed edge leaves node 1 as the only labelled node
    val rev = labelPropagation(2, Seq((1L, 0L)), Map(1L -> 7L))
    rev(0) shouldBe None
    rev(1) shouldBe Some(7L)
  }

  test("F5 tie-break: 1-1 tie resolved to smallest label") {
    val edges = Seq[(Long, Long)]((0, 2), (1, 2), (2, 0), (2, 1))
    val r = labelPropagation(3, edges, Map(0L -> 50L, 1L -> 30L))
    r(2) shouldBe Some(30L)
  }

  test("F6 two components get their own seed labels") {
    val k3a = Seq[(Long, Long)]((0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0))
    val k3b = Seq[(Long, Long)]((3, 4), (4, 3), (4, 5), (5, 4), (3, 5), (5, 3))
    val r = labelPropagation(6, k3a ++ k3b, Map(0L -> 10L, 3L -> 20L))
    r.map(_.get) shouldBe Array(10L, 10L, 10L, 20L, 20L, 20L)
  }

  test("F7 star: hub seed reaches all spokes") {
    val edges = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L)))
    val r = labelPropagation(5, edges, Map(0L -> 10L))
    r.map(_.get) shouldBe Array.fill(5)(10L)
  }

  test("F8 line with two seeds: ends pinned, middles labelled, deterministic") {
    val edges = (0L until 4L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val r1 = labelPropagation(5, edges, Map(0L -> 100L, 4L -> 200L))
    val r2 = labelPropagation(5, edges, Map(0L -> 100L, 4L -> 200L))
    r1 shouldBe r2
    r1(0) shouldBe Some(100L)
    r1(4) shouldBe Some(200L)
    (1 to 3).foreach(i => Set(100L, 200L) should contain(r1(i).get))
  }

  test("F9 mutually seeded pair converges immediately") {
    val r = labelPropagation(3, Seq((0L, 1L), (1L, 0L)), Map(0L -> 100L, 1L -> 200L))
    r(0) shouldBe Some(100L)
    r(1) shouldBe Some(200L)
    r(2) shouldBe None
  }

  test("majority vote: empty keeps current; tie → smallest; counts weigh") {
    majorityLabel(Nil, 42L) shouldBe 42L
    majorityLabel(Seq(50L, 30L), 99L) shouldBe 30L
    majorityLabel(Seq(50L, 50L, 30L), 99L) shouldBe 50L
    majorityLabel(Seq(7L), model.Unknown) shouldBe 7L
  }

  test("maxIter caps the loop") {
    // long line, 1 iteration: only direct predecessors of the seed move
    val edges = (0L until 9L).map(i => (i, i + 1))
    val r = labelPropagation(10, edges, Map(9L -> 5L), maxIter = 1)
    r(8) shouldBe Some(5L)
    r(7) shouldBe None
  }

  test("F10 connected components: two K3s, min-id component, FNV hash stable") {
    val und = Seq[(Long, Long)]((0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5))
    val comp = connectedComponents(0L to 5L, und)
    comp shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L)
    fnvComponentHash(comp) shouldBe fnvComponentHash(comp)
  }

  test("F11 PageRank on symmetric triangle: equal ranks summing to n") {
    val pr = pageRank(Seq(0L, 1L, 2L), triangle)
    val vals = pr.values.toSeq
    vals.sum shouldBe 3.0 +- 1e-9
    all(vals.map(v => math.abs(v - 1.0))) should be < 1e-6
  }

  test("F12 triangles: K3 plus pendant edge") {
    val edges = Seq[(Long, Long)]((0, 1), (1, 2), (0, 2), (2, 3))
    val t = triangleCounts(0L to 3L, edges)
    t shouldBe Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L)
  }

  test("BFS levels and reachability") {
    val edges = Seq[(Long, Long)]((0, 1), (1, 2), (2, 3), (0, 2))
    val d = bfs(0L to 4L, edges, 0L)
    d(0L) shouldBe Some(0L)
    d(1L) shouldBe Some(1L)
    d(2L) shouldBe Some(1L)
    d(3L) shouldBe Some(2L)
    d(4L) shouldBe None
  }

  test("SSSP with weights") {
    val edges = Seq[(Long, Long, Double)]((0, 1, 5.0), (0, 2, 1.0), (2, 1, 1.0))
    val d = sssp(Seq(0L, 1L, 2L), edges, 0L)
    d(1L) shouldBe Some(2.0)
  }
}
