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
}
