package graft

import graft.io.{EdgeTsv, Sinks}
import graft.graph.Adjacency
import graft.model._
import graft.oracle.SerialOracles

/** Remaining I/O surface: lpst JSON graph fixtures (S4), sharded TSV sink
  * (S9), labels JSON sink (S6), CSR-style adjacency blocks.
  */
class IoSpec extends SparkSpec {
  import spark.implicits._

  test("S4: lpst JSON graph load with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("jsongraph").toString
    val json = """{"edges": [[0,1],[1,2],[2,0],[0,1]],
                 | "labeled_nodes": {"0": 5, "2": 9},
                 | "num_nodes": 3}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/g.json"), json.getBytes)
    val (edges, seeds, n) = EdgeTsv.readJsonGraph(spark, s"$dir/g.json")
    n shouldBe 3
    edges.collect().map(e => (e.src, e.dst)).sorted.toSeq shouldBe
      Seq((0L, 1L), (0L, 1L), (1L, 2L), (2L, 0L))
    seeds.collect().map(s => s.node -> s.label).toMap shouldBe
      Map(0L -> 5L, 2L -> 9L)
  }

  test("S9: sharded TSV writer round-trips through the reference parser") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString + "/out"
    val edges = spark.createDataset(Seq(
      Edge(0, 1), Edge(1, 2), Edge(2, 0), Edge(3, 1), Edge(0, 2)))
    val seeds = spark.createDataset(Seq(Seed(0, 100)))
    EdgeTsv.writeShards(edges, seeds, 2, dir)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    shards shouldBe Array("shard=0", "shard=1")
    // shard i holds exactly the edges with src % 2 == i, labels on seeded src
    val back = EdgeTsv.readEdges(spark, s"$dir/shard=0")
    back.collect().map(e => (e.src, e.dst)).sorted.toSeq shouldBe
      Seq((0L, 1L), (0L, 2L), (2L, 0L))
    val backSeeds = EdgeTsv.readSeeds(spark, s"$dir/shard=0")
    backSeeds.collect().map(s => (s.node, s.label)).toSeq shouldBe Seq((0L, 100L))
  }

  test("S6: labels JSON sink with the n<10M guard") {
    val dir = java.nio.file.Files.createTempDirectory("labelsjson").toString
    val labels = spark.createDataset(Seq(
      VertexLabel(2, 200), VertexLabel(0, 100), VertexLabel(1, 100)))
    Sinks.writeLabelsJson(labels, s"$dir/labels.json") shouldBe true
    val got = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/labels.json")))
    got shouldBe """{"labels": {"0": 100, "1": 100, "2": 200}}"""
    Sinks.writeLabelsJson(labels, s"$dir/nope.json", maxNodes = 2) shouldBe false
  }

  test("adjacency blocks: sorted neighbours with multiplicities (CSR shape)") {
    val edges = spark.createDataset(Seq(
      Edge(1, 5), Edge(1, 3), Edge(1, 5), Edge(2, 7)))
    val blocks = Adjacency.blocks(edges).collect().map(b =>
      b.src -> (b.neighbors.toSeq, b.weights.toSeq)).toMap
    blocks(1L) shouldBe ((Seq(3L, 5L), Seq(1L, 2L)))
    blocks(2L) shouldBe ((Seq(7L), Seq(1L)))
    Adjacency.outDegrees(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe Map(1L -> 3L, 2L -> 1L)
  }

  test("S8: benchmark result line format") {
    Sinks.benchmarkResultLine(Seq("a" -> "1", "b" -> "\"x\"")) shouldBe
      """SPARK_BENCHMARK_RESULT_JSON:{"a":1,"b":"x"}"""
  }
}
