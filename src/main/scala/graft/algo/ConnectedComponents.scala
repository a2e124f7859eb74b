package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.model._

/** Weakly-connected components by iterative min-id propagation.
  *
  * Semantics: the reference doubles every directed edge and runs GraphX
  * `connectedComponents` (`connected_components_shell.scala:21-29,75`);
  * the fixpoint is "component id = min vertex id in the weak component" —
  * any correct algorithm yields identical output, so we use a
  * frontier-restricted min propagation: only vertices whose component id
  * dropped last round resend. At cluster scale the round count is bounded
  * by graph diameter; web graphs have small effective diameter, and the
  * frontier shrinks geometrically after the giant component collapses.
  */
object ConnectedComponents {

  final case class CcResult(
      components: Dataset[VertexComponent],
      iterations: Int,
      componentCount: Long,
      stats: List[Superstep.IterStats],
      // frees the persisted components once the result is consumed
      release: () => Unit = () => ())

  def run(edges: Dataset[Edge], cfg: RunConfig = RunConfig(maxIter = Int.MaxValue)): CcResult = {
    val spark = edges.sparkSession
    import spark.implicits._

    // undirected doubling, deduped (duplicates are irrelevant for min),
    // partitioned by src once — every superstep's join reuses this exchange
    val undSession = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val undCount = undSession.count()

    // tiny vertex states run the whole loop at a narrower shuffle width
    // (Superstep.autoWidth — measured 2.3× at 2K vertices, BENCH.md §9.3);
    // the doubled edge table is re-partitioned at the SAME width so the
    // gather join stays co-partitioned. The vertex count is only derived
    // when the (already-materialized) edge count is itself small, so no
    // extra driver job appears at scale. `und` is doubled, so distinct
    // src covers every non-isolated vertex.
    val loopWidth =
      if (undCount <= (1L << 20))
        Superstep.autoWidth(spark, undSession.select($"src").distinct().count())
      else None
    val und = loopWidth match {
      case Some(w) =>
        val p = undSession.repartition(w, $"src")
          .persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        undSession.unpersist(blocking = false)
        p
      case None => undSession
    }

    val vertices = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct()
    // enter the loop at the loop width (see PageRank.init — a session-width
    // init otherwise forces a message re-exchange every superstep)
    val init0 = vertices.select($"id", $"id".as("comp"))
    val init = loopWidth.fold(init0)(w => init0.repartition(w, $"id"))

    def step(state: DataFrame, iter: Int): DataFrame = {
      val frontier =
        (if (iter == 0) state else state.filter($"_chg")).select($"id", $"comp")
      val msgs = und.join(Superstep.shj(frontier), und("src") === frontier("id"))
        .groupBy(und("dst").as("id")).agg(min($"comp").as("m"))
      state.select($"id", $"comp")
        .join(Superstep.shj(msgs), Seq("id"), "left_outer")
        .select(
          $"id",
          least($"comp", $"m").as("comp"),
          coalesce($"m" < $"comp", lit(false)).as("_chg"))
    }

    val inputFp = cfg.checkpointDir.map(_ => fingerprint64(und.toDF()))
    val res = Superstep.loopResumable(init, step,
      cfg.copy(convergenceThreshold = 0L), algo = "cc", inputFingerprint = inputFp,
      shuffleWidth = loopWidth)
    val comps = res.state.select($"id", $"comp".as("component"))
      .as[VertexComponent].persist(StorageLevel.MEMORY_AND_DISK)
    val nComp = comps.agg(countDistinct($"component")).head().getLong(0)
    und.unpersist(blocking = false)
    // comps is persisted + materialized — free the loop state behind it
    res.release()
    CcResult(comps, res.iterations, nComp, res.stats,
      release = () => comps.unpersist(blocking = false))
  }

  /** Weakly-connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"), converging in O(log² n) rounds *independent of graph
    * diameter* — the scale path for high-diameter graphs (long chains,
    * crawl frontiers), where [[run]]'s min-propagation needs
    * diameter-many rounds. Identical output contract: component = min
    * vertex id in the weak component (equivalence-tested against [[run]],
    * and round-bounded on a path graph in DiameterSpec).
    *
    * Each round is two relational half-steps over the evolving edge list:
    *  - large-star: every node points its *larger* neighbours at the
    *    minimum of its neighbourhood (incl. itself)
    *  - small-star: every node and its smaller neighbours re-point at that
    *    minimum — after large-star all edges already point large→small.
    * Convergence: the (distinct) edge multiset is a fixpoint — detected by
    * an order-insensitive xxhash64 XOR fingerprint + count on the persisted
    * set (one tiny agg job per round on cached data).
    */
  def runStar(edges: Dataset[Edge], maxRounds: Int = 100,
      cfg: RunConfig = RunConfig()): CcResult = {
    val spark = edges.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlShim

    // rounds run under the pinned loop session (broadcast ban, shuffled-hash
    // preference, AQE off) exactly like Superstep.loop: with caller-default
    // confs the sub-threshold minsL/minsS aggregates are collected to the
    // driver and re-broadcast EVERY round — the documented per-superstep
    // trap, measured as ~4.8 s/round of driver fixed cost on a 1M-edge
    // path graph
    val loopSession = GraftSqlShim.sessionWithConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // job-group scoping, same as Superstep.loop: concurrent loops in one
    // session keep disjoint phase windows
    val loopId = java.util.UUID.randomUUID().toString
    val listener = new Superstep.PhaseListener(Some(loopId))
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setLocalProperty(Superstep.LoopIdProperty, loopId)
    try {
      val vertices = edges.select($"src".as("id"))
        .union(edges.select($"dst".as("id"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // u32-id graphs pack each round's two distinct() exchanges onto ONE
      // long pk=(u<<32)|v — 16 vs 24 B of UnsafeRow per edge on the two
      // biggest per-round exchanges (same recipe as LP's packExchange;
      // bijective for ids < 2^32, so the distinct sets are identical).
      // `graft.cc.packexchange=0` restores the pair rows (A/B hatch).
      val idB = vertices.agg(
        coalesce(min($"id"), lit(0L)), coalesce(max($"id"), lit(0L))).head()
      val packStar = idB.getLong(0) >= 0L && idB.getLong(1) < (1L << 32) &&
        !sys.props.get("graft.cc.packexchange").contains("0")
      def distinctEdges(df: DataFrame): DataFrame =
        if (!packStar) df.distinct()
        else df.select((shiftleft($"u", 32) + $"v").as("pk")).distinct()
          .select(shiftrightunsigned($"pk", 32).as("u"),
            $"pk".bitwiseAND(lit((1L << 32) - 1)).as("v"))

      val initial = edges.select(
        least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
        .filter($"u" =!= $"v").distinct()
        .select($"v".as("u"), $"u".as("v")) // point large→small like small-star input

      // input identity = the canonical undirected distinct edge set (raw
      // `edges` would let duplicate rows cancel in the XOR fold)
      val inputFp = cfg.checkpointDir.map(_ => fingerprint64(initial.toDF()))
      val (state0, rounds0, resumedConverged) = cfg.checkpointDir match {
        case Some(dir) =>
          Superstep.resumeOrInit(spark, dir, initial.toDF(), "cc_star", inputFp)
        case None => (initial.toDF(), 0, false)
      }

      var g = GraftSqlShim.bind(loopSession, state0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      var backing = g // owns the persisted blocks behind the current view
      var rounds = rounds0
      var converged = resumedConverged
      var fp = if (converged) (0L, 0L) else fingerprintAndCount(g)
      GraftSqlShim.waitListenerBus(spark)
      listener.drainAs("init") // init/resume stages are not round phases
      var stats = List.empty[Superstep.IterStats]
      while (!converged && rounds < maxRounds) {
        val t0 = System.nanoTime()
        // large-star: Γ taken over both directions; m(u) = min(Γ(u) ∪ {u});
        // every neighbour v > u re-points to m(u)
        val bidir = g.select($"u", $"v").union(g.select($"v".as("u"), $"u".as("v")))
        // least AFTER the aggregation: u is the group key, so folding it
        // into the agg as least(min(v), first(u)) only added a first()
        // buffer (value + valueSet) to every partial-agg exchange row —
        // identical m, two fewer shuffled fields
        val minsL = bidir.groupBy($"u").agg(min($"v").as("mv"))
          .select($"u", least($"mv", $"u").as("m"))
        val ls = distinctEdges(bidir.join(Superstep.shj(minsL), "u")
          .filter($"v" > $"u")
          .select($"v".as("u"), $"m".as("v"))
          .filter($"u" =!= $"v"))
        // small-star: all edges now point large→small; m(u) = min(N(u) ∪ {u});
        // u and its neighbours except m re-point to m
        val minsS = ls.groupBy($"u").agg(min($"v").as("m"))
        val ss = distinctEdges(ls.join(Superstep.shj(minsS), "u")
          .filter($"v" =!= $"m")
          .select($"v".as("u"), $"m".as("v"))
          .union(minsS.select($"u", $"m".as("v")))
          .filter($"u" =!= $"v"))
        // persist a FLAT LogicalRDD view of the round result: the IMR the
        // next round references then carries a one-node cachedPlan (scan of
        // this round's executed RDD) instead of the whole round plan. A
        // round plan references the previous state ~12× (bidir twice, both
        // star joins, the union), so IMR-over-raw-plan nests 12^depth
        // previous-round references into every plan STRING the driver
        // renders (SparkPlanInfo/UI) — OOM after a handful of rounds. The
        // superstep loop can't use this trick (observations must ride the
        // persisted plan); star rounds use fingerprints, so they can.
        val ssB = GraftSqlShim.truncatedView(GraftSqlShim.bind(loopSession, ss))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val newFp = fingerprintAndCount(ssB) // materializes the persisted set
        GraftSqlShim.waitListenerBus(spark)
        val phases = listener.drainAs("star")
        // logical-plan truncation every round (each half-step references its
        // input twice → untruncated plans double per round); a real
        // localCheckpoint every K rounds bounds the RDD DAG
        val (view, newBacking) =
          if ((rounds + 1 - rounds0) % cfg.localCheckpointEvery == 0) {
            val lc = ssB.localCheckpoint(eager = true)
            ssB.unpersist(blocking = false)
            lc.persist(StorageLevel.MEMORY_AND_DISK)
            (GraftSqlShim.cachedView(lc), lc)
          } else (GraftSqlShim.cachedView(ssB), ssB)
        GraftSqlShim.waitListenerBus(spark)
        listener.drainAs("lc") // discard the localCheckpoint job's stages
        rounds += 1
        converged = newFp == fp
        fp = newFp
        val computeMs = (System.nanoTime() - t0) / 1000000L
        val t1 = System.nanoTime()
        cfg.checkpointDir.foreach { dir =>
          if (converged || rounds % cfg.checkpointEvery == 0 || rounds >= maxRounds) {
            Superstep.writeCheckpoint(dir, "cc_star", rounds,
              changed = if (converged) 0L else newFp._2, rows = newFp._2,
              state = view, converged = converged, threshold = 0L,
              phases = phases, inputFingerprint = inputFp)
            GraftSqlShim.waitListenerBus(spark)
            listener.drainAs("ckpt") // keep next round's phases clean
          }
        }
        val checkpointMs = (System.nanoTime() - t1) / 1000000L
        backing.unpersist(blocking = false)
        g = view
        backing = newBacking
        stats ::= Superstep.IterStats(rounds, if (converged) 0 else 1, newFp._2,
          computeMs, checkpointMs, phases)
      }

      // final vertex mapping + count plan under the CALLER's session/confs
      val comps = vertices
        .join(GraftSqlShim.bind(spark, g).select($"u".as("id"), $"v".as("c")),
          Seq("id"), "left_outer")
        .select($"id", coalesce($"c", $"id").as("component"))
        .as[VertexComponent].persist(StorageLevel.MEMORY_AND_DISK)
      val nComp = comps.agg(countDistinct($"component")).head().getLong(0)
      backing.unpersist(blocking = false)
      vertices.unpersist(blocking = false)
      CcResult(comps, rounds - rounds0, nComp, stats.reverse,
        release = () => comps.unpersist(blocking = false))
    } finally {
      spark.sparkContext.setLocalProperty(Superstep.LoopIdProperty, null)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  private def fingerprintAndCount(df: DataFrame): (Long, Long) = {
    val r = df.agg(bit_xor(xxhash64(df.columns.map(col): _*)), count(lit(1))).head()
    (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
  }

  /** Order-sensitive FNV-64 fingerprint of the component column sorted by
    * vertex id — exact parity with `connected_components_shell.scala:34-37,
    * 77-83`. FNV chaining cannot be merged across partitions, so this runs
    * as a single ordered pass; use [[fingerprint64]] for a scalable,
    * order-insensitive fingerprint at 100 TB.
    */
  def fnvHash(components: Dataset[VertexComponent]): Long = {
    val spark = components.sparkSession
    import spark.implicits._
    components.orderBy($"id").select($"component").as[Long]
      .coalesce(1)
      .mapPartitions { it =>
        var acc = 0xcbf29ce484222325L
        it.foreach(c => acc = (acc ^ c) * 0x100000001b3L)
        Iterator.single(acc)
      }.head()
  }

  /** Order-insensitive distributed fingerprint: XOR-fold of xxhash64 over
    * all rows (XOR is associative/commutative → identical across any
    * partitioning, O(1) driver data, no ANSI overflow — unlike a Long sum).
    * Collision caveat: duplicate rows cancel pairwise; callers fingerprint
    * keyed result sets (unique ids), where that cannot happen.
    */
  def fingerprint64(df: DataFrame): Long = {
    val cols = df.columns.map(col)
    val r = df.agg(bit_xor(xxhash64(cols: _*))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
