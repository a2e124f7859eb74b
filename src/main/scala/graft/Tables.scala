package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Shared access to the driver-generated testdata tables and the
  * deterministic graph derived from them.
  *
  * The graph for the relational/iterative queries is derived from
  * `lineitem` by a pure modulo projection — exactly reproducible in the
  * DuckDB oracle SQL, which is what makes the graph-prep operators
  * hash-checkable end-to-end. Duplicate (src,dst) pairs are preserved (they
  * weight the LP vote, `ow-lp/src/lib.rs:282`).
  */
object Tables {

  val VertexMod = 2000L

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Directed multi-edge table over ids [0, VertexMod). */
  def edges(spark: SparkSession, sfDir: String): Dataset[Edge] = {
    import spark.implicits._
    table(spark, sfDir, "lineitem")
      .select((col("l_orderkey") % VertexMod).as("src"),
        (col("l_partkey") % VertexMod).as("dst"))
      .as[Edge]
  }

  /** Reference-rule seeds over the derived graph's vertex set:
    * node % 10 == 0 → label (node % 4) * 100 (`setup_large_lp_data.py:40-42`).
    */
  def seeds(spark: SparkSession, sfDir: String): Dataset[Seed] = {
    import spark.implicits._
    val e = edges(spark, sfDir)
    e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct()
      .filter(col("id") % 10 === 0)
      .select(col("id").as("node"), ((col("id") % 4) * 100).as("label"))
      .as[Seed]
  }

  /** The same derivations as ANSI SQL fragments for the DuckDB oracle. */
  val edgesSql: String =
    s"SELECT l_orderkey % $VertexMod AS src, l_partkey % $VertexMod AS dst FROM lineitem"
  val verticesSql: String =
    s"SELECT DISTINCT src AS id FROM ($edgesSql) UNION SELECT DISTINCT dst AS id FROM ($edgesSql)"
  val seedsSql: String =
    s"SELECT id AS node, (id % 4) * 100 AS label FROM ($verticesSql) WHERE id % 10 = 0"
}
