package graft

import graft.io.EdgeTsv
import graft.model._

/** Parser golden cases from the reference test suite (FIXTURES.md §"Parser
  * golden cases", `ow-lp/src/lib.rs:847-978`).
  */
class EdgeTsvSpec extends SparkSpec {
  import spark.implicits._

  private def parseLines(lines: Seq[String], numNodes: Long) = {
    val df = spark.createDataset(lines).toDF("value")
    val parsed = EdgeTsv.parse(df, numNodes).collect()
    val edges = parsed.map(r => (r.getLong(0), r.getLong(1)))
    val seeds = parsed.filter(!_.isNullAt(2)).map(r => (r.getLong(0), r.getLong(2)))
    (edges.toSeq, seeds.toSeq)
  }

  test("invalid lines, out-of-range endpoints, negative labels") {
    val lines = Seq("0\t1\t5", "1\t99\t3", "bad line", "2\t0\t-1", "3\t1")
    val (edges, seeds) = parseLines(lines, 4)
    edges should contain theSameElementsAs Seq((0L, 1L), (2L, 0L), (3L, 1L))
    seeds shouldBe Seq((0L, 5L))
  }

  test("label above u32::MAX dropped, edge kept") {
    val lines = Seq("0\t1\t4294967296", "1\t2\t7")
    val (edges, seeds) = parseLines(lines, 3)
    edges should contain theSameElementsAs Seq((0L, 1L), (1L, 2L))
    seeds shouldBe Seq((1L, 7L))
  }

  test("empty body → nothing") {
    val (edges, seeds) = parseLines(Seq("", "   ", "\t"), 10)
    edges shouldBe empty
    seeds shouldBe empty
  }

  test("endpoint above u32::MAX → line skipped (u32 parse failure)") {
    val (edges, _) = parseLines(Seq("4294967296\t1", "0\t1"), -1)
    edges shouldBe Seq((0L, 1L))
  }

  test("non-integer numerics rejected like Rust parse") {
    val (edges, seeds) = parseLines(Seq("1.5\t2", "0\t2\t3.7", "0\t2\t1e3"), 10)
    edges should contain theSameElementsAs Seq((0L, 2L), (0L, 2L))
    seeds shouldBe empty
  }

  test("seed dedup keeps min label per node") {
    val seeds = spark.createDataset(Seq(
      Seed(4, 90), Seed(2, 50), Seed(4, 70), Seed(2, 60)))
    EdgeTsv.dedupSeeds(seeds).collect().map(s => s.node -> s.label).toMap shouldBe
      Map(2L -> 50L, 4L -> 70L)
  }

  test("TSV roundtrip through files") {
    val dir = java.nio.file.Files.createTempDirectory("edgetsv").toString
    val path = s"$dir/edges.tsv"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "0\t1\t100\n1\t2\n2\t0\n".getBytes)
    val edges = EdgeTsv.readEdges(spark, path, 3)
    edges.collect().map(e => (e.src, e.dst)) should contain theSameElementsAs
      Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val seeds = EdgeTsv.readSeeds(spark, path, 3)
    seeds.collect().map(s => (s.node, s.label)) shouldBe Seq((0L, 100L))
  }
}
