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
  *
  * Both programs run on [[Superstep.loopResumable]] (r4): with
  * `cfg.checkpointDir` set, any superstep is durably resumable
  * mid-convergence — the checkpointed state carries the `_chg` frontier
  * column, so a resumed run relaxes exactly the frontier the crashed run
  * would have. The manifest records an input fingerprint of
  * (adjacency ⊕ source), and resume refuses a checkpoint taken against a
  * different edge table OR a different source vertex (same-table/different-
  * source checkpoints are distinct runs, not resumable state).
  */
object Paths {

  final case class PathResult(
      dists: Dataset[VertexDist],
      iterations: Int,
      reachable: Long,
      maxDist: Double,
      stats: List[Superstep.IterStats],
      converged: Boolean = true,
      // frees the loop state backing `dists` once the result is consumed
      release: () => Unit = () => ())

  /** BFS levels from `source`; `maxLevels` caps rounds (reference default
    * 500). `cfg` supplies the durable-checkpoint / convergence knobs;
    * its `maxIter` is overridden by `maxLevels` (the reference's cap).
    */
  def bfs(edges: Dataset[Edge], source: Long, maxLevels: Int = 500,
          cfg: RunConfig = RunConfig()): PathResult = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select($"src", $"dst", lit(1.0).as("weight")).as[WEdge]
    run(e, source, cfg.copy(maxIter = maxLevels), algo = "bfs")
  }

  /** SSSP from `source` over weighted edges (missing weights already
    * defaulted to 1.0 by the caller/parser, `sssp_graphx_shell.scala:30-39`).
    */
  def sssp(edges: Dataset[WEdge], source: Long,
           maxIter: Int = Int.MaxValue): PathResult =
    run(edges, source, RunConfig(maxIter = maxIter), algo = "sssp")

  /** SSSP with the full run config (checkpointing, convergence knobs). */
  def sssp(edges: Dataset[WEdge], source: Long, cfg: RunConfig): PathResult =
    run(edges, source, cfg, algo = "sssp")

  private def run(edges: Dataset[WEdge], source: Long,
                  cfg: RunConfig, algo: String): PathResult = {
    val spark = edges.sparkSession
    import spark.implicits._

    val packedSession = edges.groupBy($"src", $"dst").agg(min($"weight").as("weight"))
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val packedCount = packedSession.count()

    // tiny vertex states run the whole loop at a narrower shuffle width
    // (Superstep.autoWidth — measured 2.3× at 2K vertices, BENCH.md §9.3);
    // the adjacency is re-partitioned at the SAME width so the gather join
    // stays co-partitioned. The vertex count is only derived when the
    // (already-materialized) edge count is itself small — no extra driver
    // job at scale. min over doubles is exact (no re-association), so the
    // result is bit-identical at any width.
    val loopWidth =
      if (packedCount <= (1L << 20))
        Superstep.autoWidth(spark, packedSession.select($"src".as("id"))
          .union(packedSession.select($"dst".as("id"))).distinct().count())
      else None
    val packed = loopWidth match {
      case Some(w) =>
        val p = packedSession.repartition(w, $"src")
          .persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        packedSession.unpersist(blocking = false)
        p
      case None => packedSession
    }

    // DENSE state (one row per vertex, +∞ = unreached — the reference's
    // sentinel, `sssp_graphx_shell.scala:27`): keeps the apply join
    // left-outer so the state's partitioning survives each superstep (a
    // full-outer join on a grow-as-reached state would force two state
    // re-exchanges per superstep — see LabelPropagation).
    def init: DataFrame = {
      val vertices = packed.select($"src".as("id"))
        .union(packed.select($"dst".as("id")))
        .union(spark.range(1).select(lit(source).as("id"))) // isolated source
        .distinct()
      val st = vertices.select(
        $"id",
        when($"id" === source, 0.0).otherwise(Double.PositiveInfinity).as("dist"))
      // enter the loop at the loop width (see PageRank.init — a
      // session-width init otherwise forces a re-exchange every superstep)
      loopWidth.fold(st)(w => st.repartition(w, $"id"))
    }

    def step(state: DataFrame, iter: Int): DataFrame = {
      val frontier =
        (if (iter == 0) state.filter($"dist" < Double.PositiveInfinity)
         else state.filter($"_chg")).select($"id", $"dist")
      val msgs = packed
        .join(Superstep.shj(frontier), packed("src") === frontier("id"))
        .groupBy(packed("dst").as("id"))
        .agg(min($"dist" + $"weight").as("m"))
      state.select($"id", $"dist")
        .join(Superstep.shj(msgs), Seq("id"), "left_outer")
        .select(
          $"id",
          least($"dist", $"m").as("dist"),
          coalesce($"m" < $"dist", lit(false)).as("_chg"))
    }

    // input identity for checkpoint manifests: adjacency ⊕ mixed source id
    // (a different source is a different run over the same table — the
    // plain id would cancel against nothing, so it goes through splitmix64)
    val inputFp = cfg.checkpointDir.map(_ =>
      ConnectedComponents.fingerprint64(packed.toDF()) ^
        graft.functions.SplitMix64Expr.mix(source))
    val res = Superstep.loopResumable(init, step, cfg, algo = algo,
      inputFingerprint = inputFp, shuffleWidth = loopWidth)
    // absent-row output contract: unreachable vertices are not emitted
    val dists = res.state.filter($"dist" < Double.PositiveInfinity)
      .select($"id", $"dist").as[VertexDist]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val agg = dists.agg(count(lit(1)), max($"dist")).head()
    packed.unpersist(blocking = false)
    PathResult(dists, res.iterations, agg.getLong(0),
      if (agg.isNullAt(1)) 0.0 else agg.getDouble(1), res.stats, res.converged,
      release = res.release)
  }
}
