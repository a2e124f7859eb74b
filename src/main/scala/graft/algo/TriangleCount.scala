package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.model._

/** Exact per-vertex triangle counting with GraphX `TriangleCount` semantics
  * (the north rule's addition — the reference itself has no triangle code):
  * self-loops dropped, edges canonicalized to the undirected distinct set,
  * each triangle counted once per member vertex.
  *
  * Algorithm: degree-ordered edge orientation ("node-iterator++"). Every
  * undirected edge is oriented from its lower (degree, id) endpoint to the
  * higher; wedges are enumerated only at a triangle's lowest-ordered vertex,
  * so per-vertex enumeration work is bounded by O(m^1.5) total and hub
  * vertices never enumerate their full neighbour square — the skew-safe
  * formulation for power-law web graphs (standard technique, cf.
  * Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11).
  *
  * Wholly relational: two self-joins + one aggregation, all
  * broadcast/sort-merge joins chosen by Catalyst, AQE skew-split capable.
  */
object TriangleCount {

  final case class TcResult(
      counts: Dataset[VertexTriangles],
      totalTriangles: Long,
      // frees the persisted per-vertex counts once the result is consumed
      release: () => Unit = () => ())

  /** Per-vertex triangle counts; includes zero rows for triangle-free
    * vertices. Vertex ids must fit in unsigned 32 bits (reference id domain,
    * `ow-lp/src/lib.rs:54`) — the (degree, id) order key is packed into one
    * Long for cheap comparisons.
    */
  def run(edges: Dataset[Edge]): TcResult = {
    val spark = edges.sparkSession
    import spark.implicits._

    val canon = edges.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // undirected degree per vertex → total-order key deg·2^32 + id
    val deg = canon.select($"a".as("id")).union(canon.select($"b".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("deg"))
      .select($"id", (shiftleft($"deg", 32) + $"id").as("key"))

    val da = deg.withColumnRenamed("id", "a").withColumnRenamed("key", "ka")
    val db = deg.withColumnRenamed("id", "b").withColumnRenamed("key", "kb")
    // orient each edge from lower to higher (degree, id) key
    val oriented = canon.join(da, "a").join(db, "b")
      .select(
        when($"ka" < $"kb", $"ka").otherwise($"kb").as("u"),
        when($"ka" < $"kb", $"kb").otherwise($"ka").as("v"))
      .repartition($"u")
      .persist(StorageLevel.MEMORY_AND_DISK)
    oriented.count()
    canon.unpersist(blocking = false)

    // wedges at the lowest-ordered vertex, ordered v1 < v2 so each candidate
    // wedge is generated exactly once; closing edge must be (v1 → v2)
    val e1 = oriented.select($"u", $"v".as("v1"))
    val e2 = oriented.select($"u", $"v".as("v2"))
    val wedges = e1.join(e2, Seq("u")).filter($"v1" < $"v2")
    val closing = oriented.select($"u".as("v1"), $"v".as("v2"))
    val triangles = wedges.join(closing, Seq("v1", "v2"))
      .select($"u", $"v1", $"v2")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val total = triangles.count()

    val unpack = (c: org.apache.spark.sql.Column) => c.bitwiseAND(lit(0xffffffffL))
    val perVertex = triangles
      .select(explode(array(unpack($"u"), unpack($"v1"), unpack($"v2"))).as("id"))
      .groupBy($"id").agg(count(lit(1)).as("triangles"))

    val vertices = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct()
    val counts = vertices.join(perVertex, Seq("id"), "left_outer")
      .select($"id", coalesce($"triangles", lit(0L)).as("triangles"))
      .as[VertexTriangles]
      .persist(StorageLevel.MEMORY_AND_DISK)
    counts.count()
    oriented.unpersist(blocking = false)
    triangles.unpersist(blocking = false)
    TcResult(counts, total, release = () => counts.unpersist(blocking = false))
  }
}
