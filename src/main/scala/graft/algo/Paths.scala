package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.model._

/** Frontier-based shortest-path programs: BFS min-hop levels and SSSP
  * min-distance, matching the reference's Pregel formulations
  * (`bfs_graphx_shell.scala:82-92`, `sssp_graphx_shell.scala:87-98`).
  *
  * State rows exist only for reached vertices (absent row = unreachable =
  * the reference's `Int.MaxValue` / `+∞` sentinel, rendered at the sink);
  * each superstep joins only the frontier (vertices improved last round)
  * against the edge table, so the shuffle volume per round is proportional
  * to the frontier's out-degree sum, not the whole graph.
  */
object Paths {

  final case class PathResult(
      dists: Dataset[VertexDist],
      iterations: Int,
      reachable: Long,
      maxDist: Double,
      stats: List[Superstep.IterStats])

  /** BFS levels from `source`; `maxLevels` caps rounds (reference default 500). */
  def bfs(edges: Dataset[Edge], source: Long, maxLevels: Int = 500): PathResult = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select($"src", $"dst", lit(1.0).as("weight")).as[WEdge]
    sssp(e, source, maxLevels)
  }

  /** SSSP from `source` over weighted edges (missing weights already
    * defaulted to 1.0 by the caller/parser, `sssp_graphx_shell.scala:30-39`).
    */
  def sssp(edges: Dataset[WEdge], source: Long,
           maxIter: Int = Int.MaxValue): PathResult = {
    val spark = edges.sparkSession
    import spark.implicits._

    val packed = edges.groupBy($"src", $"dst").agg(min($"weight").as("weight"))
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // DENSE state (one row per vertex, +∞ = unreached — the reference's
    // sentinel, `sssp_graphx_shell.scala:27`): keeps the apply join
    // left-outer so the state's partitioning survives each superstep (a
    // full-outer join on a grow-as-reached state would force two state
    // re-exchanges per superstep — see LabelPropagation).
    val vertices = packed.select($"src".as("id"))
      .union(packed.select($"dst".as("id")))
      .union(spark.range(1).select(lit(source).as("id"))) // isolated source
      .distinct()
    val init: DataFrame = vertices.select(
      $"id",
      when($"id" === source, 0.0).otherwise(Double.PositiveInfinity).as("dist"))

    def step(state: DataFrame, iter: Int): DataFrame = {
      val frontier =
        (if (iter == 0) state.filter($"dist" < Double.PositiveInfinity)
         else state.filter($"_chg")).select($"id", $"dist")
      val msgs = packed.join(frontier, packed("src") === frontier("id"))
        .groupBy(packed("dst").as("id"))
        .agg(min($"dist" + $"weight").as("m"))
      state.select($"id", $"dist").join(msgs, Seq("id"), "left_outer")
        .select(
          $"id",
          least($"dist", $"m").as("dist"),
          coalesce($"m" < $"dist", lit(false)).as("_chg"))
    }

    val res = Superstep.loop(init, step, maxIter, 0L, algo = "sssp")
    // absent-row output contract: unreachable vertices are not emitted
    val dists = res.state.filter($"dist" < Double.PositiveInfinity)
      .select($"id", $"dist").as[VertexDist]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val agg = dists.agg(count(lit(1)), max($"dist")).head()
    packed.unpersist(blocking = false)
    PathResult(dists, res.iterations, agg.getLong(0),
      if (agg.isNullAt(1)) 0.0 else agg.getDouble(1), res.stats)
  }
}
