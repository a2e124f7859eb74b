package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.model._

/** Dynamic (delta-based) PageRank to convergence, reproducing the exact
  * semantics of GraphX `PageRank.runUntilConvergence` — the formulation the
  * reference benchmarks (`pagerank_graphx_shell.scala:59-65`, tol 1e-6,
  * damping 0.85) — without any GraphX dependency:
  *
  *  - every vertex starts at rank 0 and receives the initial message
  *    resetProb/(1−resetProb), so after superstep 0: rank = resetProb,
  *    delta = resetProb
  *  - a vertex that received a message applies
  *    rank += (1−resetProb)·msgSum, delta = (1−resetProb)·msgSum
  *  - messages flow only out of vertices that received one last round AND
  *    whose delta > tol (Pregel activeDirection = Out); each out-edge
  *    carries delta/outDegree, parallel edges counted in the degree and
  *    contributing multiplicity-many times (we fold multiplicity into a
  *    per-(src,dst) weight — identical arithmetic up to FP association,
  *    covered by the 1e-6 allclose contract)
  *  - terminate when no messages are in flight
  *  - finally normalize ranks to sum to the vertex count (SPARK-18847
  *    `normalizeRankSum`, confirmed present in the Spark 4.1.2 graphx jar).
  *
  * Differentially tested against GraphX itself in PageRankSpec.
  *
  * Physical shape per superstep: frontier ⋈ contribution-weighted edges
  * (edges pre-partitioned by src, persisted once) → groupBy(dst).sum →
  * left join back to rank state. Only active vertices shuffle; the frontier
  * collapses geometrically as deltas fall below tol.
  */
object PageRank {

  final case class PrResult(
      ranks: Dataset[VertexRank],
      iterations: Int,
      numVertices: Long,
      maxRank: Double,
      sumRank: Double,
      stats: List[Superstep.IterStats],
      // frees the persisted ranks once the result is consumed
      release: () => Unit = () => ())

  def run(
      edges: Dataset[Edge],
      tol: Double = 1e-6,
      resetProb: Double = 0.15,
      maxIter: Int = Int.MaxValue,
      cfg: RunConfig = RunConfig()): PrResult = {
    val spark = edges.sparkSession
    import spark.implicits._

    val packed = edges.groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = packed.groupBy($"src").agg(sum($"w").as("deg"))
    // contribution weight per distinct (src,dst): multiplicity / outDegree
    val contribRaw = packed.join(outDeg, "src")
      .select($"src", $"dst", ($"w".cast("double") * (lit(1.0) / $"deg")).as("cw"))
    // scatter-side hub salting: a src with 10^7 out-edges would pin one
    // reducer; split it across hubSaltK salted partitions (SkewJoin)
    val saltPlan: Option[graft.graph.SkewJoin.SaltPlan] =
      LabelPropagation.saltK(cfg).flatMap(k => graft.graph.SkewJoin.plan(
        contribRaw, "src", "dst", k, cfg.hubDegreeThreshold))

    val vertices = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val numVertices = vertices.count()
    // tiny vertex states run the whole loop at a narrower shuffle width
    // (Superstep.autoWidth — measured 2.3× at 2K vertices); the contrib
    // table is pre-partitioned at the SAME width so the gather join stays
    // co-partitioned and exchange-free. The salted path keeps the session
    // width (hub skew implies a graph far above the tiny-state branch).
    val loopWidth = if (saltPlan.isDefined) None
      else Superstep.autoWidth(spark, numVertices)
    val contrib = saltPlan.map(_.salted).getOrElse {
      val byCfg = loopWidth match {
        case Some(w) => contribRaw.repartition(w, $"src")
        case None => contribRaw.repartition($"src")
      }
      byCfg.persist(StorageLevel.MEMORY_AND_DISK)
    }
    contrib.count()
    packed.unpersist(blocking = false)

    // after Pregel superstep 0 (initial message to every vertex). The init
    // state must ENTER the loop at the loop width: a session-width state
    // otherwise propagates its partitioning through every apply join (the
    // join side that already satisfies the distribution wins), forcing a
    // re-exchange of the loop-width contrib table every superstep.
    val init0: DataFrame = vertices.select(
      $"id", lit(resetProb).as("rank"), lit(resetProb).as("delta"))
    val init = loopWidth.fold(init0)(w => init0.repartition(w, $"id"))

    def step(state: DataFrame, iter: Int): DataFrame = {
      val frontier = (if (iter == 0) state else state.filter($"_chg"))
        .filter($"delta" > tol).select($"id", $"delta")
      val scattered = saltPlan match {
        case Some(p) => graft.graph.SkewJoin.joinState(p, frontier, "id")
        case None =>
          contrib.join(Superstep.shj(frontier), contrib("src") === frontier("id"))
      }
      val msgs = scattered
        .groupBy(col("dst").as("id"))
        .agg(sum($"delta" * $"cw").as("msg"))
      state.select($"id", $"rank", $"delta")
        .join(Superstep.shj(msgs), Seq("id"), "left_outer")
        .select(
          $"id",
          when($"msg".isNotNull, $"rank" + lit(1.0 - resetProb) * $"msg")
            .otherwise($"rank").as("rank"),
          when($"msg".isNotNull, lit(1.0 - resetProb) * $"msg")
            .otherwise($"delta").as("delta"),
          $"msg".isNotNull.as("_chg"))
    }

    val inputFp = cfg.checkpointDir.map(_ =>
      ConnectedComponents.fingerprint64(contrib.select($"src", $"dst", $"cw")))
    val res = Superstep.loopResumable(init, step,
      cfg.copy(maxIter = maxIter), algo = "pagerank", inputFingerprint = inputFp,
      shuffleWidth = loopWidth)

    // SPARK-18847: scale ranks so they sum to the vertex count
    val rawSum = res.state.agg(sum($"rank")).head().getDouble(0)
    val factor = numVertices.toDouble / rawSum
    val ranks = res.state
      .select($"id", ($"rank" * factor).as("rank")).as[VertexRank]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val agg = ranks.agg(max($"rank"), sum($"rank")).head()
    contrib.unpersist(blocking = false)
    saltPlan.foreach(_.hotKeys.unpersist(blocking = false))
    vertices.unpersist(blocking = false)
    // ranks is persisted + materialized above — the loop state behind it
    // can be freed now rather than leaking one retired state per run
    res.release()
    PrResult(ranks, res.iterations, numVertices,
      agg.getDouble(0), agg.getDouble(1), res.stats,
      release = () => ranks.unpersist(blocking = false))
  }
}
