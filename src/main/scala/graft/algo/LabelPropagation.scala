package graft.algo

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.model._

/** Synchronous semi-supervised / unsupervised label propagation as an
  * iterative Dataset pipeline.
  *
  * Semantics are the reference's canonical LP kernel
  * (`lpst/src/lib.rs:177-221` `run_lp_csr`, `ow-lp/src/lib.rs:501-630`),
  * differentially tested against a direct transcription
  * ([[graft.oracle.SerialOracles.labelPropagation]]):
  *
  *  - message direction: each node gathers the labels of its
  *    **out-neighbours** (dst labels flow to src — GraphX `sendToSrc`,
  *    `labelpropagation_graphx_shell.scala:108-116`)
  *  - new label = most frequent neighbour label, ties → smallest label,
  *    no labelled neighbour → keep current (`ow-lp/src/lib.rs:456-481`)
  *  - duplicate edges weight the vote (multiplicity preserved via a
  *    pre-aggregated weight column, mathematically identical)
  *  - seeds are min-deduped per node and pinned forever
  *    (`ow-lp/src/lib.rs:224-235,576-579`)
  *  - zero seeds globally → unsupervised mode, label(i) = i, no pinning
  *    (`ow-lp/src/lib.rs:538-546`)
  *  - stop when changed ≤ threshold (default 0) or maxIter (default 50)
  *
  * Physical plan per superstep (2 exchanges on the state, none on the
  * pre-partitioned edges, zero sorts):
  *   gather  = packedEdges ⋈ labels on dst          (labels shuffled to the
  *             persisted edge partitioning and hash-joined — shuffled-hash
  *             forced by Superstep.shj, the broadcast ban otherwise
  *             degrades the join to a per-superstep sort-merge; explicit
  *             hub salting via SkewJoin, vote levels are salt-compatible
  *             since label counts are associative)
  *   vote    = repartition(src) → groupBy(src, label).sum(w)
  *             → groupBy(src).max((cnt<<32)|(2^32-1-label)) — both agg
  *             levels chained codegen HashAggregates in one post-shuffle
  *             stage (the packed-long argmax replaces max(struct(...)),
  *             whose struct buffer forced a SortAggregate; struct fallback
  *             when labels exceed u32 or counts exceed 31 bits); when every
  *             multiplicity is 1 (deduplicated edge table) the w column is
  *             dropped from the exchange and sum(w) becomes count(*) —
  *             bit-identical votes, ~25% narrower shuffle rows; when src
  *             ids AND labels both fit u32 the exchange row packs further
  *             into ONE long pk=(src<<32)|label (16 B vs 24 B UnsafeRow)
  *             with the plan still single-exchange (see packExchange)
  *   apply   = state ⟗ votes on id (shuffled-hash, votes build), seeded
  *             rows keep their label, changed flag folded into the same
  *             projection (no extra action).
  */
object LabelPropagation {

  /** Effective salt factor: None = disabled, Some(k) = detect-and-salt. */
  private[algo] def saltK(cfg: RunConfig): Option[Int] = cfg.hubSaltK match {
    case 0 | 1 => None
    case k if k > 1 => Some(k)
    case _ => Some(graft.graph.SkewJoin.AutoK) // -1 = auto
  }

  final case class LpResult(
      labels: Dataset[VertexLabel],
      iterations: Int,
      converged: Boolean,
      stats: List[Superstep.IterStats],
      edgeCount: Long,
      // frees the loop state backing `labels` once the result is consumed
      release: () => Unit = () => ())

  /** Run LP over a directed edge table. `seeds` may be empty → unsupervised.
    *
    * `numNodes`: optional declared vertex-universe size (the TSV/CLI
    * `num_nodes` argument of the reference). When set, unsupervised init
    * covers every id in [0, numNodes) — including isolated vertices with no
    * edges, which keep label = id forever, exactly like `init_labels`
    * (`lpst/src/lib.rs:158-172`). When absent, the vertex set is derived
    * from edge endpoints (isolated ids cannot be known).
    */
  def run(
      edges: Dataset[Edge],
      seeds: Dataset[Seed],
      cfg: RunConfig = RunConfig(),
      numNodes: Option[Long] = None): LpResult = {
    val spark = edges.sparkSession
    import spark.implicits._

    // Under a declared universe the reference TOLERATES out-of-range srcs
    // and seeds: build_csr_from_edges silently skips edges with src >= n
    // (lpst/src/lib.rs:49-71) and init_labels silently skips seeds with
    // node >= n (lib.rs:158-172) — matched here so the driver contract is
    // identical. dst >= n is NOT tolerated: see the guard at init below.
    val boundedEdges = numNodes match {
      case Some(n) => edges.filter($"src" < n)
      case None => edges
    }

    // adjacency at rest: duplicate edges collapsed to a weight, partitioned
    // by dst once so every gather join reuses the same exchange; with
    // salting enabled, hub dst keys are split across hubSaltK partitions
    val packedRaw = boundedEdges.groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
    val saltPlan: Option[graft.graph.SkewJoin.SaltPlan] =
      saltK(cfg).flatMap(k => graft.graph.SkewJoin.plan(
        packedRaw, "dst", "src", k, cfg.hubDegreeThreshold))
    val packedSession = saltPlan.map(_.salted).getOrElse(
      packedRaw.repartition($"dst").persist(StorageLevel.MEMORY_AND_DISK))
    val eAgg = packedSession.agg(
      coalesce(sum($"w"), lit(0L)),
      count(lit(1)),
      coalesce(max($"w"), lit(1L)),
      coalesce(min($"src"), lit(0L)),
      coalesce(max($"src"), lit(0L))).head()
    val edgeCount = eAgg.getLong(0)
    val (srcMin, srcMax) = (eAgg.getLong(3), eAgg.getLong(4))
    // Near-unit multiplicities (Σw ≤ 1.01·rows — the common case: a
    // deduplicated or near-deduplicated edge table; the reference's random
    // generator leaves only birthday-collision duplicates, ~50 in 40M) let
    // the adjacency expand those rare duplicates back into duplicate ROWS
    // once at setup and drop the w column everywhere: the vote's sum(w)
    // becomes count(*) over multiplicity-many rows — identical integer
    // votes. That narrows the ONE per-superstep exchange (the raw vote
    // rows — map-side combine cannot compress them: at degree d over p
    // shuffle partitions a given (src,label) pair appears ~d/p ≤ 1 times
    // per map task) from (src,label,w) to (src,label) — 24 vs 32 bytes of
    // unsafe-row payload, ~25% less shuffle write+read DRAM traffic on the
    // loop's hot path, plus a narrower cached adjacency. Skipped under
    // salting (the salted table is built/persisted inside SkewJoin with w;
    // hub-skewed graphs keep the weighted vote). The max(w) guard bounds
    // the per-row array_repeat. `graft.lp.keepw=1` forces the weighted
    // shape (A/B probe hatch).
    val unitW = saltPlan.isEmpty &&
      eAgg.getLong(0) <= eAgg.getLong(1) + eAgg.getLong(1) / 100 &&
      eAgg.getLong(2) <= 4096L &&
      !sys.props.get("graft.lp.keepw").contains("1")

    // tiny vertex states run the whole loop at a narrower shuffle width
    // (Superstep.autoWidth — 8-way measured 2.3× faster at 2K vertices);
    // the adjacency is then re-partitioned at the SAME width so the gather
    // join stays co-partitioned and exchange-free. The decision is free at
    // scale: a declared universe sizes directly, and the vertex count is
    // only computed when the (already-known) edge count is itself small.
    // The salted path keeps the session width (hub skew ⇒ a big graph).
    lazy val derivedVertexCount = packedSession
      .select($"src".as("id")).union(packedSession.select($"dst".as("id")))
      .union(graft.io.EdgeTsv.dedupSeeds(seeds).select($"node".as("id")))
      .distinct().count()
    val loopWidth =
      if (saltPlan.isDefined) None
      else numNodes match {
        case Some(n) => Superstep.autoWidth(spark, n)
        case None if edgeCount <= (1L << 20) =>
          Superstep.autoWidth(spark, derivedVertexCount)
        case None => None
      }
    // one setup-time rebuild of the persisted adjacency when either the
    // loop width narrows or the near-unit expansion drops the w column; the
    // explicit repartition($"dst") keeps the cached plan exchange-rooted so
    // the gather join stays provably co-partitioned with the state
    val packed =
      if (loopWidth.isEmpty && !unitW) packedSession
      else {
        val base =
          if (unitW) packedSession.select($"src", $"dst",
              explode(array_repeat(lit(0), $"w".cast("int"))).as("_d"))
            .select($"src", $"dst")
          else packedSession
        val q = (loopWidth match {
          case Some(w) => base.repartition(w, $"dst")
          case None => base.repartition($"dst")
        }).persist(StorageLevel.MEMORY_AND_DISK)
        q.count()
        packedSession.unpersist(blocking = false)
        q
      }

    val dedupedSeedsAll = graft.io.EdgeTsv.dedupSeeds(seeds)
    // unsupervised ⇔ the RAW seed map is empty (lib.rs:160 checks
    // is_empty() BEFORE any range filtering): seeds that are all
    // out-of-range leave a seeded run with zero effective seeds — every
    // label stays UNKNOWN — they do not flip the run to unsupervised.
    val unsupervised = dedupedSeedsAll.isEmpty
    val dedupedSeeds = numNodes.fold(dedupedSeedsAll)(n =>
        dedupedSeedsAll.filter($"node" < n))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // DENSE state: one row per vertex from the start, null label = UNKNOWN.
    // This keeps the apply join LEFT-outer (state side streams, its `id`
    // and partitioning survive to the next superstep) — a full-outer join
    // on a grow-as-labeled sparse state reports UnknownPartitioning (its
    // id is coalesce(l,r)), which forced TWO state re-exchanges per
    // superstep (observed as 5-stage superstep jobs vs PR's 3).
    val vertices = numNodes match {
      // declared universe covers isolated ids too (lpst init_labels)
      case Some(n) =>
        // fail fast on out-of-range DESTINATIONS only (srcs/seeds >= n were
        // silently dropped above, matching the reference): the reference
        // stores any dst in the CSR and its gather indexes labels[dst] —
        // dst >= n panics there (lib.rs:200-204); here the dense range(n)
        // state + left-outer apply would swallow those votes silently, so
        // the panic becomes one cheap agg over the persisted adjacency.
        val mxDst = packed.agg(coalesce(max($"dst"), lit(-1L))).head().getLong(0)
        require(mxDst < n,
          s"numNodes=$n but an edge destination references out-of-range id " +
          s"$mxDst — the reference panics on gather for dst >= num_nodes")
        spark.range(n).toDF("id")
      case None => packed.select($"src".as("id"))
        .union(packed.select($"dst".as("id")))
        .union(dedupedSeeds.select($"node".as("id"))) // seeded isolated ids
        .distinct()
    }
    val init0: DataFrame =
      if (unsupervised) {
        // label(i) = i for every vertex (ow-lp/src/lib.rs:538-546)
        vertices.select($"id", $"id".as("label"), lit(false).as("seeded"))
      } else {
        vertices.join(dedupedSeeds, $"id" === $"node", "left_outer")
          .select($"id", $"label", $"label".isNotNull.as("seeded"))
      }

    // LP only ever propagates labels that exist in the INITIAL state, so the
    // label domain is fixed at setup: unsupervised = the vertex-id range,
    // seeded = the (tiny, persisted) seed label set. When every label fits
    // in an unsigned 32-bit lane and every possible vote count fits in 31
    // bits (cnt ≤ Σw = edgeCount), the vote's argmax packs into ONE long —
    // (cnt << 32) | (2^32-1-label) — whose max() hash-aggregates: the
    // max(struct(cnt,-label)) form has an immutable struct buffer, which
    // HashAggregate cannot hold, so Spark silently planned a SortAggregate
    // that re-SORTED the per-partition vote stream every superstep (caught
    // in the r5 plan audit together with the SMJ degradation — see
    // Superstep.shj). Identical integer argmax → bit-identical labels;
    // `graft.lp.structvote=1` forces the struct shape (A/B probe hatch).
    val labelBounds: (Long, Long) =
      if (unsupervised) numNodes match {
        case Some(n) => (0L, n - 1)
        case None =>
          val r = vertices.agg(
            coalesce(min($"id"), lit(0L)), coalesce(max($"id"), lit(0L))).head()
          (r.getLong(0), r.getLong(1))
      } else {
        val r = dedupedSeeds.agg(
          coalesce(min($"label"), lit(0L)), coalesce(max($"label"), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
    val packedVote = labelBounds._1 >= 0L && labelBounds._2 < (1L << 32) &&
      edgeCount < (1L << 31) &&
      !sys.props.get("graft.lp.structvote").contains("1")
    // Packed EXCHANGE row (r5): when both the voting src ids and the label
    // domain fit unsigned 32-bit lanes, the gather output ships ONE long
    // pk = (src<<32)|label instead of the (src,label) pair — a 16-byte
    // UnsafeRow instead of 24 bytes on the loop's only per-superstep
    // exchange, whose write+read DRAM traffic is LP's measured scaling
    // bottleneck at full core occupancy (BENCH.md §11b: the vote exchange
    // is the largest per-superstep DRAM consumer). Repartitioning by
    // `shiftrightunsigned(pk,32)` and projecting that same expression back out as
    // `src` lets alias-aware output partitioning rewrite the exchange's
    // HashPartitioning(shiftrightunsigned(pk,32)) to HashPartitioning(src), so
    // both vote aggregation levels AND the apply join stay exchange-free
    // (plan-verified: graft.tools.PackPlanProbe — identical exchange count,
    // all four HashAggregates + the apply SHJ in one post-shuffle codegen
    // stage). Murmur3 of shiftrightunsigned(pk,32) equals Murmur3 of src value-wise,
    // so co-partitioning with the cached state holds numerically too.
    // Applies to BOTH vote shapes: the unit-multiplicity row packs to just
    // (pk) — 16 vs 24 B — and the weighted row (salted hub-skew graphs,
    // the 100 TB web shape, or multiplicity-heavy tables) to (pk, w) —
    // 24 vs 32 B. `graft.lp.packexchange=0` restores the pair rows
    // (A/B probe hatch).
    val packExchange = packedVote &&
      srcMin >= 0L && srcMax < (1L << 32) &&
      !sys.props.get("graft.lp.packexchange").contains("0")
    // enter the loop at the loop width (see PageRank.init — a session-width
    // init otherwise forces a contrib re-exchange every superstep)
    val init = loopWidth.fold(init0)(w => init0.repartition(w, $"id"))

    def step(state: DataFrame, iter: Int): DataFrame = {
      // P6 UNKNOWN filter: unlabeled vertices contribute nothing
      val labels = state.filter($"label".isNotNull).select($"id", $"label")
      val joined = saltPlan match {
        case Some(p) => graft.graph.SkewJoin.joinState(p, labels, "id")
        case None =>
          packed.join(Superstep.shj(labels), packed("dst") === labels("id"))
      }
      // unit multiplicities ⇒ w is constant 1: keep it out of the exchange
      val gather =
        if (unitW) joined.select($"src", $"label")
        else joined.select($"src", $"label", $"w")
      // single-exchange majority, fully codegen: repartition the gather
      // output by src once, then BOTH aggregation levels (label counts,
      // then max(count, min-label tiebreak)) run in the same post-shuffle
      // stage as chained codegen HashAggregates — hash(src) already
      // clusters (src, label). The earlier TypedImperativeAggregate
      // ([[graft.functions.MajorityVoteAgg]], kept as the §2.8 UDAF
      // surface) plans as ObjectHashAggregate, which falls back to
      // SORT-based aggregation beyond 128 groups per partition
      // (spark.sql.objectHashAggregate.sortBased.fallbackThreshold) —
      // at 4M vertices that sorted all 40M gather rows every superstep,
      // ~20× the task time of this plan.
      val counted =
        if (packExchange) {
          // packed exchange row: pk = (src<<32)|label (label < 2^32 so +
          // is bitwise OR), plus w on the weighted shape; the repartition
          // expression and the projected src are the SAME tree, which is
          // what keeps the downstream plan exchange-free — see the
          // packExchange gate's comment
          val pk = (shiftleft($"src", 32) + $"label").as("pk")
          val packed =
            (if (unitW) gather.select(pk) else gather.select(pk, $"w"))
              .repartition(shiftrightunsigned($"pk", 32))
          val unpacked = Seq(
            shiftrightunsigned($"pk", 32).as("src"),
            $"pk".bitwiseAND(lit((1L << 32) - 1)).as("label")) ++
            (if (unitW) Nil else Seq($"w"))
          packed.select(unpacked: _*)
            .groupBy($"src", $"label")
            .agg((if (unitW) count(lit(1)) else sum($"w")).as("cnt"))
        } else gather
          .repartition($"src")
          .groupBy($"src", $"label")
          .agg((if (unitW) count(lit(1)) else sum($"w")).as("cnt"))
      val votes =
        if (packedVote)
          // hash-aggregable single-long argmax: bigger cnt wins, ties break
          // to the SMALLER label (2^32-1-label is larger for smaller label)
          counted.groupBy($"src")
            .agg(max(shiftleft($"cnt", 32) +
              (lit((1L << 32) - 1) - $"label")).as("m"))
            .select($"src".as("id"),
              (lit((1L << 32) - 1) - $"m".bitwiseAND(lit((1L << 32) - 1)))
                .as("vote"))
        else
          counted.groupBy($"src")
            .agg(max(struct($"cnt", (-$"label").as("neg"))).as("m"))
            .select($"src".as("id"), (-$"m.neg").as("vote"))
      state.as("s").join(Superstep.shj(votes.as("v")), Seq("id"), "left_outer")
        .select(
          $"id",
          when($"s.seeded" === true, $"s.label")
            .otherwise(coalesce($"v.vote", $"s.label")).as("label"),
          $"s.seeded".as("seeded"),
          // changed ⇔ new label differs from previous (UNKNOWN = null never
          // equals a real label; labels are ≥ 0 so -1 is a safe sentinel)
          (coalesce(when($"s.seeded" === true, $"s.label")
              .otherwise(coalesce($"v.vote", $"s.label")), lit(-1L)) =!=
            coalesce($"s.label", lit(-1L))).as("_chg"))
    }

    // input identity for checkpoint manifests: adjacency ⊕ seeds (computed
    // only when durable checkpointing is on — one agg over cached data)
    // fingerprint the logical multigraph (src,dst,w): under the near-unit
    // expansion the w column is re-derived by re-grouping — duplicate ROWS
    // must never reach the XOR-fold (identical rows cancel pairwise, see
    // fingerprint64's caveat), and re-grouping keeps the fingerprint equal
    // to the weighted representation's, so manifests stay interchangeable
    val inputFp = cfg.checkpointDir.map { _ =>
      val edgeRows =
        if (unitW) packed.groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
        else packed.select($"src", $"dst", $"w")
      ConnectedComponents.fingerprint64(edgeRows) ^
        ConnectedComponents.fingerprint64(dedupedSeeds.toDF())
    }
    // superstep batching is forced OFF for LP: its step references the
    // state in two structurally DIFFERENT subtrees (gather's filtered
    // projection vs the apply join), and the vote's repartition + chained
    // aggregates defeat ReuseExchange when steps compose — a batched LP
    // job re-executes each prior step's gather/vote up to 3× (measured:
    // 4-step batch 29.7 s vs 4 × 2.4 s unbatched at 100k nodes), while LP
    // converges in ≤ ~10 supersteps at every size measured, so there is
    // almost no fixed cost to amortize. PageRank batching was ALSO measured
    // a regression (2.3×: 101.8 s vs 44.7 s at 100k nodes × 75 steps —
    // ReuseExchange never collapses the duplicated state subtrees because
    // self-join dedup remints exprIds), so Superstep.DefaultBatchK = 1
    // everywhere; see BENCH.md §2.
    val res = Superstep.loopResumable(
      init, step, cfg.copy(batchK = 1), algo = "lp", inputFingerprint = inputFp,
      shuffleWidth = loopWidth)

    val labelsOut = res.state.filter($"label".isNotNull)
      .select($"id", $"label").as[VertexLabel]
    packed.unpersist(blocking = false)
    saltPlan.foreach(_.hotKeys.unpersist(blocking = false))
    dedupedSeeds.unpersist(blocking = false)
    LpResult(labelsOut, res.iterations, res.converged, res.stats, edgeCount,
      release = res.release)
  }

  /** Label histogram report (`ow-lp/src/lib.rs:336-356`): 20 smallest-id
    * distinct labels with occurrence counts.
    */
  def labelHistogram(labels: Dataset[VertexLabel]): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    labels.groupBy($"label").agg(count(lit(1)).as("cnt"))
      .orderBy($"label").limit(20)
  }
}
