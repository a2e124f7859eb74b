package graft.algo

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Generic bulk-synchronous superstep driver shared by every iterative
  * vertex program (LP / PageRank / CC / BFS / SSSP).
  *
  * Replaces the reference's hand-rolled reduce+broadcast loop
  * (`ow-lp/src/lib.rs:501-630`) and the GraphX shell's Pregel loop
  * (`labelpropagation_graphx_shell.scala:107-138`) with a driver-side loop
  * over declarative Dataset plans. The GraphX-shell mistake of one extra
  * `count()` join per superstep (SURVEY.md §7.6) is avoided by folding the
  * changed-count into the single materializing aggregation via `observe()`.
  *
  * Per-superstep cost model (this loop is the engine's hot path — every
  * avoidable fixed cost here divides directly into scaling efficiency):
  *  - exactly ONE job per superstep, and the cheapest possible one
  *    ([[org.apache.spark.sql.GraftSqlShim.materializeLocalCheckpointed]],
  *    the r5 default "ckpt" leaf): the step plan executes once, rows are
  *    defensively copied once and stored as deserialized MEMORY_AND_DISK
  *    blocks, `localCheckpoint` is marked BEFORE the job so the job's own
  *    blocks become the checkpoint — plan-lineage AND RDD-lineage are
  *    truncated every superstep at zero extra cost, the state is re-rooted
  *    on a flat `LogicalRDD` over stable rows (no columnar encode at
  *    materialization, no decode on the two per-superstep scans), and
  *    every per-step CollectMetrics accumulator fires in the same job and
  *    is read SYNCHRONOUSLY. Measured vs the r4 IMR flow (BENCH.md §13):
  *    per-superstep medians 114-145 vs 166-186 ms at the 2K-vertex /
  *    600K-edge derived graph, PR 411-469 vs 499-525 ms at 100K
  *    vertices, LP pairwise faster in both drift windows at 1M-4M;
  *  - the r4 flow remains as `graft.state.leaf=imr` (columnar
  *    `InMemoryRelation` leaf via
  *    [[org.apache.spark.sql.GraftSqlShim.cachedView]], a separate
  *    `Dataset.localCheckpoint` job every `localCheckpointEvery` steps —
  *    it pays a columnar encode + two decodes per superstep, and its
  *    driver/task costs GROW between truncations: build 42→372 ms and
  *    exec 318→1038 ms across one 8-step window at 100K vertices) and
  *    `=rdd` (flat view with per-scan defensive copy) — both probe
  *    hatches, each the measured best of its round;
  *  - loop-specific SQL confs (AQE off — its runtime coalescing breaks the
  *    hash-partitioning match between the persisted edge side and the
  *    evolving state side; shuffled-hash over sort-merge — per-superstep
  *    re-sorts are pure waste against a hash-partitioned cached state) are
  *    scoped to a cloned child session, NOT mutated on the caller's session,
  *    so concurrent loops / relational queries never race on global conf.
  *
  * Per-iteration phase windows (reference evidence style,
  * `runtime_metrics.py:48-118`): a SparkListener attributes the superstep
  * job's stages to gather / apply / collect windows with wall time, summed
  * task time and shuffle bytes; they land in [[IterStats.phases]] and the
  * checkpoint manifest.
  *
  * Durable checkpointing (the north rule's "resumable mid-convergence"):
  * every `checkpointEvery` iterations the state parquet is written under
  * `dir/iter=K/state` followed by `dir/iter=K/manifest.json` (manifest
  * written last = commit marker, so a torn write is never resumed from).
  * [[resumeOrInit]] restarts the loop from the newest committed manifest
  * and refuses to resume a checkpoint written by a different algorithm.
  * The reference has no equivalent (a failed worker fails the run).
  */
object Superstep {

  /** One stage of the superstep job, attributed to a loop phase. */
  final case class PhaseWindow(
      phase: String,
      wallMs: Long,
      taskTimeMs: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long)

  /** Per-iteration phase metrics (reference style: `runtime_metrics.py:81-183`).
    * One entry per superstep even under batching: `changed`/`rows` come from
    * the step's own observation, `computeMs` is the superstep's equal share
    * of its job, and `steps` records how many supersteps shared that job
    * (phases + checkpointMs ride the batch's last entry).
    */
  final case class IterStats(
      iteration: Int,
      changed: Long,
      rows: Long,
      computeMs: Long,
      checkpointMs: Long,
      phases: List[PhaseWindow] = Nil,
      steps: Int = 1)

  final case class LoopResult(
      state: DataFrame,
      iterations: Int,
      converged: Boolean,
      stats: List[IterStats],
      // frees the persisted/localCheckpointed blocks backing `state`; call
      // once the result has been consumed (benchmark reps otherwise
      // accumulate one retired state per run). After release() the state
      // may be unrecomputable (localCheckpoint truncates lineage).
      release: () => Unit = () => ())

  /** One superstep: previous state → new state carrying a boolean `_chg`
    * column (true on every row whose vertex value changed this step). The
    * previous state still carries its own `_chg` (absent on iteration 0) so
    * frontier-based algorithms can restrict work to changed vertices; the
    * driver aggregates the new `_chg` to decide convergence.
    */
  type Step = (DataFrame, Int) => DataFrame

  /** Mark `df` as the BUILD side of a shuffled-hash join (loop hot paths
    * only). The loop session prefers shuffled-hash over sort-merge, but
    * Spark's JoinSelection only *considers* SHJ when `canBuildLocalHashMap`
    * holds — a check against `autoBroadcastJoinThreshold`, which the loop
    * pins to -1 to ban frontier re-broadcasts. With the threshold negative
    * the check is always false, so every loop join silently degraded to
    * SortMergeJoin: each superstep re-SORTED the persisted multi-million-row
    * adjacency, the state, and the vote/message stream (caught in the r5
    * plan audit; measured on LP at 1.1-2.0× per-superstep across
    * drift-paired probe runs, PR within drift noise — BENCH.md §12). The
    * explicit hint forces SHJ with this side as the build map regardless of
    * size estimates while keeping broadcasts banned. The build side is
    * always the per-partition vertex state / message slice — bounded by
    * |V|/shuffle-partitions, the same per-worker-memory assumption the
    * reference's dense label arrays make globally; size partitions
    * accordingly at scale. `graft.loop.legacyplan=1` restores the unhinted
    * planner choice (A/B probe hatch).
    */
  def shj(df: DataFrame): DataFrame =
    if (sys.props.get("graft.loop.legacyplan").contains("1")) df
    else df.hint("shuffle_hash")

  /** The thread-local SparkContext property that tags every job a loop
    * submits with its owning loop's id (local properties are inherited by
    * the submitting thread's jobs only, so concurrent loops on different
    * driver threads tag disjoint job sets).
    */
  private[graft] val LoopIdProperty = "graft.loop.id"

  /** Collects per-stage windows; drained once per superstep. Stage events
    * for the materializing job are flushed by an explicit listener-bus
    * barrier (waitListenerBus) before the drain, so the drain is race-free
    * for the job it attributes.
    *
    * `loopId`: when set, only stages belonging to jobs tagged with this
    * loop's [[LoopIdProperty]] are collected — a SparkListener is
    * SparkContext-global, so without the scope two concurrent loops in one
    * session would cross-pollute each other's phase windows. `None`
    * collects everything (ad-hoc measurement, e.g. Bench's LSH
    * shuffle-byte receipt).
    */
  private[graft] final class PhaseListener(loopId: Option[String] = None)
      extends SparkListener {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, PhaseWindow)]
    // stage ids owned by this loop's jobs (only consulted when loopId is set)
    private val owned = scala.collection.mutable.HashSet.empty[Int]
    override def onJobStart(ev: SparkListenerJobStart): Unit =
      loopId.foreach { id =>
        if (Option(ev.properties).exists(p => p.getProperty(LoopIdProperty) == id))
          owned.synchronized { ev.stageInfos.foreach(owned += _.stageId) }
      }
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val si = ev.stageInfo
      if (loopId.isDefined && !owned.synchronized(owned.contains(si.stageId)))
        return
      val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s)
        .getOrElse(0L)
      val m = si.taskMetrics
      val w = PhaseWindow("", wall, m.executorRunTime,
        m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten)
      buf.synchronized { buf += ((si.stageId, w)) }
    }
    /** Stages completed since the last drain, in stage order, phase-named.
      * `steps` = supersteps materialized by the drained job; the canonical
      * unbatched job shape is gather (map-side scatter + partial agg) then
      * apply (final agg + apply join + state materialization — the toRdd
      * consume rides this stage; there is no separate count/collect stage
      * since r4). The legacy 2·steps+1 template (trailing single-task
      * count stage) is kept for any caller still materializing via an
      * aggregate action. Batched jobs rarely match either template (their
      * duplicated subtrees re-execute, see [[DefaultBatchK]]) and fall
      * back to positional stage names.
      */
    def drain(steps: Int = 1): List[PhaseWindow] = {
      val raw = buf.synchronized { val r = buf.sortBy(_._1).toList; buf.clear(); r }
      val names =
        if (raw.size == 2 * steps)
          (0 until 2 * steps).map(i => if (i % 2 == 0) "gather" else "apply").toList
        else if (raw.size == 2 * steps + 1)
          (0 until 2 * steps).map(i => if (i % 2 == 0) "gather" else "apply").toList :+ "collect"
        else (0 until raw.size).map(i => s"stage$i").toList
      raw.zip(names).map { case ((_, w), n) => w.copy(phase = n) }
    }
    /** Drain with positional `prefix0..prefixN` names (loops whose job
      * shape is not the canonical gather/apply superstep, e.g. star CC
      * rounds).
      */
    def drainAs(prefix: String): List[PhaseWindow] = {
      val raw = buf.synchronized { val r = buf.sortBy(_._1).toList; buf.clear(); r }
      raw.zipWithIndex.map { case ((_, w), i) => w.copy(phase = s"$prefix$i") }
    }
  }

  /** Loop shuffle width for a vertex state of `numKeys` rows. Measured
    * (interleaved same-JVM, BENCH.md §9): at 2K vertices an 8-way loop runs
    * the whole 75-superstep PageRank 2.3× faster than the 32-way session
    * width (median superstep 180 ms vs 510 ms — task scheduling dominates
    * tiny states), while at 100K vertices 32-way is ~1.17× faster than
    * 8-way and at ≥4M the session width wins outright. Session width
    * therefore stands unless the state is tiny. A 100 TB deployment never
    * triggers the small branch (its states are billions of rows); this is
    * purely the small-graph fixed-cost guard.
    */
  def autoWidth(session: SparkSession, numKeys: Long): Option[Int] = {
    val sessionWidth = session.conf.get("spark.sql.shuffle.partitions").toInt
    if (numKeys <= 16384 && sessionWidth > 8) Some(8) else None
  }

  /** Supersteps composed into one materializing job once the frontier is
    * at most this many changed rows (fixed driver cost per job — plan
    * build, scheduling, observation round-trip — dominates real work
    * there). Bounded so large-frontier iterations, whose per-reference
    * post-shuffle re-execution cost is O(|state|), never batch.
    */
  val DefaultBatchFrontierMax: Long = 262144L

  /** Supersteps per batched job. OFF (1) by default: measured on both the
    * LP and PageRank step shapes, the composed job re-executes duplicated
    * state references instead of reusing them (LP 4-step batch = 3× the
    * unbatched cost; PR = 2.3× min-of-reps, 44.7 s vs 101.8 s at 100k
    * nodes × 75 supersteps) — ReuseExchange does not collapse the
    * duplicated subtrees in practice even with an InMemoryRelation state
    * leaf. The machinery stays (correctness is proven equal by
    * PageRankSpec's bit-identical batched-vs-serial test) for callers
    * whose step shape does compose.
    */
  val DefaultBatchK: Int = 1


  /** Run `step` from `init` until the number of changed rows is ≤ `threshold`
    * or `maxIter` supersteps have completed. `startIter` > 0 resumes
    * counting from a checkpoint.
    *
    * Convergence mirrors `should_continue` (`ow-lp/src/lib.rs:424-426`):
    * iterate while iterations < maxIter and changed > threshold.
    *
    * Superstep batching: under the exact-fixpoint rule (threshold 0, no
    * ratio rule) any superstep past convergence is a no-op — the frontier
    * is empty, messages vanish and every `_chg` is false — so once the
    * frontier drops to ≤ `batchFrontierMax` changed rows, `batchK`
    * supersteps share ONE job (one plan build, one action) and
    * per-superstep driver fixed cost divides by `batchK`. Each composed
    * step carries its own observation, so the loop still detects the
    * EARLIEST converged superstep: the batch tail past it is executed
    * no-ops, and both the reported iteration count and the final state
    * match the unbatched run exactly. Batching never engages for
    * threshold/ratio rules (a no-op tail is only guaranteed under the
    * exact fixpoint rule) and never crosses a checkpoint boundary or
    * `maxIter`.
    *
    * `inputFingerprint`: recorded in every checkpoint manifest; resume
    * refuses a manifest whose fingerprint differs (see [[resumeOrInit]]).
    */
  def loop(
      init: DataFrame,
      step: Step,
      maxIter: Int,
      threshold: Long = 0L,
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 5,
      localCheckpointEvery: Int = 8,
      startIter: Int = 0,
      algo: String = "superstep",
      ratioThreshold: Option[Double] = None,
      batchK: Int = DefaultBatchK,
      batchFrontierMax: Long = DefaultBatchFrontierMax,
      inputFingerprint: Option[Long] = None,
      shuffleWidth: Option[Int] = None): LoopResult = {
    require(checkpointEvery > 0, s"checkpointEvery must be positive, got $checkpointEvery")
    require(localCheckpointEvery > 0,
      s"localCheckpointEvery must be positive, got $localCheckpointEvery")
    require(batchK > 0, s"batchK must be positive, got $batchK")

    val session = SparkSession.active
    val loopSession = GraftSqlShim.sessionWithConfs(session,
      Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.join.preferSortMergeJoin" -> "false",
      // NO broadcast joins inside the loop: with a sub-threshold state the
      // planner would otherwise collect + re-broadcast the evolving frontier
      // EVERY superstep (serial driver cost growing with |V| — measured as
      // the dominant per-superstep fixed cost at 100K vertices, and fatal
      // to scaling at 4M). The co-partitioned shuffled-hash gather join
      // needs zero exchanges and builds only |partition|-sized hash maps.
      // Loop shuffle width: the session conf unless the caller passes
      // `shuffleWidth` (see [[autoWidth]] — tiny states run ~2.3× faster
      // 8-way; at ≥100K-row states the session width was measured better:
      // PR 1M edges × 75 steps, 48 s at 8-way vs 41 s at 32-way).
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") ++
      shuffleWidth.map(w => "spark.sql.shuffle.partitions" -> w.toString): _*)
    // every job this loop submits (supersteps, localCheckpoints, durable
    // checkpoint writes) is tagged with a unique loop id via a thread-local
    // SparkContext property, and the listener collects ONLY those stages —
    // concurrent loops in one session keep disjoint phase windows
    val loopId = java.util.UUID.randomUUID().toString
    val listener = new PhaseListener(Some(loopId))
    session.sparkContext.addSparkListener(listener)
    session.sparkContext.setLocalProperty(LoopIdProperty, loopId)

    // state-leaf mode (BENCH.md §9/§13, measured): "ckpt" (default) fuses
    // materialize + defensive copy + localCheckpoint into the ONE superstep
    // job and re-roots the state on a flat LogicalRDD over the checkpointed
    // rows ([[GraftSqlShim.materializeLocalCheckpointed]]); "imr" persists
    // the state as a columnar InMemoryRelation with a separate
    // Dataset.localCheckpoint job every `localCheckpointEvery` steps; "rdd"
    // is imr's flat-view variant (per-scan defensive copy). The probe
    // hatches exist because each was the measured best of its round.
    val leafMode = sys.props.get("graft.state.leaf")
      .orElse(sys.env.get("SPARK_GRAFT_STATE_LEAF")).getOrElse("ckpt")
    val ckptLeaf = leafMode == "ckpt"
    // initial state: materialized once, lineage truncated
    var state = GraftSqlShim.bind(loopSession, init).localCheckpoint(eager = true)
    GraftSqlShim.waitListenerBus(session)
    listener.drain() // init stages are not superstep phases
    // frees the blocks backing `state` (a truncated view is only a window
    // onto its backing iteration's cached/checkpointed blocks)
    var releaseBacking: () => Unit = {
      val b = state; () => b.unpersist(blocking = false)
    }
    var iter = startIter
    var converged = false
    var stats = List.empty[IterStats]

    val loopTimers = sys.env.contains("SPARK_GRAFT_LOOP_TIMERS")
    // exact-fixpoint rule ⇒ oversteps are no-ops ⇒ batching is sound
    val mayBatch = threshold == 0L && ratioThreshold.isEmpty
    var lastChanged = Long.MaxValue // frontier size unknown before step 1
    try while (iter < maxIter && !converged) {
      val t0 = System.nanoTime()
      val k0 = if (mayBatch && lastChanged <= batchFrontierMax) batchK else 1
      val k1 = math.min(k0, maxIter - iter)
      // never batch across a durable-checkpoint boundary
      val k = checkpointDir match {
        case Some(_) => math.min(k1, (iter / checkpointEvery + 1) * checkpointEvery - iter)
        case None => k1
      }
      val doneIter = iter + k
      // changed/row counts ride the materializing job via observe()
      // (accumulator-backed) — no separate aggregation job per superstep,
      // which at converged-frontier sizes costs as much as the superstep.
      // A batched job carries ONE CollectMetrics node per composed step
      // (pass-through: partitioning/ordering preserved, no stage break),
      // so per-superstep changed counts — and the exact convergence
      // iteration — survive batching.
      val obsNames = (iter until doneIter).map(i => s"superstep_${i + 1}")
      var composed = state
      for (i <- iter until doneIter) {
        composed = GraftSqlShim.bind(loopSession, step(composed, i))
          .observe(obsNames(i - iter), count(lit(1)).as("rows"),
            sum(when(col("_chg"), 1L).otherwise(0L)).as("changed"))
      }
      // ckpt mode materializes into checkpointed row blocks instead — no
      // cache-manager registration, no columnar encode/decode
      val next = if (ckptLeaf) composed
        else composed.persist(StorageLevel.MEMORY_AND_DISK)
      val tBuilt = System.nanoTime()
      // force optimization + physical planning + codegen eagerly so the
      // timer split can attribute plan time separately from job execution
      // (count() reuses the lazily-cached executedPlan, so this moves cost,
      // never duplicates it)
      if (loopTimers) next.queryExecution.executedPlan
      val tPlanned = System.nanoTime()
      if (doneIter >= 3 && iter < 3 && sys.env.contains("SPARK_GRAFT_EXPLAIN_STEP"))
        next.explain("formatted") // debug: dump one steady-state superstep plan
      // tag the materializing job so driver logs / the UI attribute every
      // stage to its superstep (and stray jobs stand out)
      session.sparkContext.setJobDescription(
        s"$algo superstep ${iter + 1}${if (k > 1) s"-$doneIter" else ""}")
      // THE one job: consume toRdd (caches state, fires every CollectMetrics
      // accumulator) and read the per-step metrics synchronously — no
      // count() Aggregate plan, no extra single-task final stage, no
      // Observation listener-bus round-trip (measured ~0.1 s/superstep of
      // job scaffolding at converged-frontier sizes, BENCH.md §9)
      val ckptOut = if (ckptLeaf)
        Some(GraftSqlShim.materializeLocalCheckpointed(next)) else None
      val observed = ckptOut.map(_._3)
        .getOrElse(GraftSqlShim.materializeObserved(next))
      session.sparkContext.setJobDescription(null)
      val tCounted = System.nanoTime()
      // per-step (changed, rows), all fired by the single job above
      val perStep: Seq[(Long, Long)] = obsNames.map { n =>
        val m = observed.getOrElse(n, throw new IllegalStateException(
          s"observed metrics for $n missing from the materializing job"))
        val chg = m.getAs[Any]("changed") match {
          case null => 0L
          case v => v.asInstanceOf[Long]
        }
        (chg, m.getAs[Any]("rows").asInstanceOf[Long])
      }
      if (loopTimers) {
        val tObs = System.nanoTime()
        System.err.println(f"[loop] iter=$doneIter k=$k build=${(tBuilt - t0) / 1e6}%.0fms " +
          f"plan=${(tPlanned - tBuilt) / 1e6}%.0fms " +
          f"exec=${(tCounted - tPlanned) / 1e6}%.0fms obsGet=${(tObs - tCounted) / 1e6}%.0fms " +
          s"changed=${perStep.map(_._1).mkString(",")}")
      }
      GraftSqlShim.waitListenerBus(session)
      val phases = listener.drain(k)

      // logical lineage truncation every step is free; the LEAF choice is
      // measured, not aesthetic (BENCH.md §9):
      //  - the InMemoryRelation leaf (default) scans the cache without the
      //    per-row defensive copy that a LogicalRDD view must pay
      //    (truncatedView maps _.copy() — load-bearing, the state feeds
      //    hash-join builds that buffer rows), and keeps ReuseExchange
      //    working inside batched plans. Interleaved same-JVM A/B at 4M
      //    nodes: LP median 2.4-2.8 s/iter (imr) vs 2.9-4.5 s (rdd leaf) —
      //    the copy is real money once the state is millions of rows;
      //  - the flat LogicalRDD leaf avoids the IMR plan-STRING growth
      //    (an IMR leaf prints its cachedPlan via innerChildren, which
      //    embeds the previous IMR — 2× per superstep, exponential between
      //    localCheckpoints) and at 2K-vertex graphs measured faster in
      //    one probe and slower in another (±10%, host-noise bound).
      // A real localCheckpoint every K steps stays mandatory either way:
      // the RDD DAG rides along in every task closure and a 75-deep chain
      // overflows the task-deserialization stack (measured), and it also
      // resets the IMR string growth.
      // graft.state.leaf / SPARK_GRAFT_STATE_LEAF selects the mode; the
      // default "ckpt" leaf never reaches this block's checkpoint branch —
      // its materializing job already stored + truncated the state.
      val (view, newRelease): (DataFrame, () => Unit) = ckptOut match {
        case Some((v, rel, _)) => (v, rel)
        case None =>
          val rddLeaf = leafMode == "rdd"
          val tookLocalCheckpoint =
            (doneIter - startIter) % localCheckpointEvery < k
          val (v, nb) =
            if (tookLocalCheckpoint) {
              val lc = next.localCheckpoint(eager = true)
              next.unpersist(blocking = false)
              if (rddLeaf) (lc, lc)
              else {
                lc.persist(StorageLevel.MEMORY_AND_DISK)
                (GraftSqlShim.cachedView(lc), lc)
              }
            } else if (rddLeaf) (GraftSqlShim.truncatedView(next), next)
            else (GraftSqlShim.cachedView(next), next)
          if (tookLocalCheckpoint) {
            // only the localCheckpoint path runs a job whose stages must be
            // discarded; cachedView/truncatedView spawn none, so the common
            // iteration skips this second listener-bus barrier entirely
            GraftSqlShim.waitListenerBus(session)
            listener.drain()
          }
          (v, () => nb.unpersist(blocking = false))
      }
      if (loopTimers)
        System.err.println(f"[loop] iter=$doneIter total=${(System.nanoTime() - t0) / 1e6}%.0fms")
      val computeMs = (System.nanoTime() - t0) / 1000000L

      // the FULL convergence decision (absolute count, `ow-lp/src/lib.rs:
      // 424-426`, OR the lpst class-API change-ratio rule, `lpst/src/lib
      // .rs:484-496`) is computed once per SUPERSTEP and drives loop exit,
      // the checkpoint-write gate and the manifest's converged field alike.
      // In a batched job the loop stops at the EARLIEST converged step —
      // the batch tail past it consists of executed-but-uncounted no-ops,
      // so the reported iteration count and final state both match the
      // unbatched run exactly.
      def decide(chg: Long, rws: Long): Boolean = chg <= threshold ||
        ratioThreshold.exists(r => rws > 0 && chg.toDouble / rws <= r)
      val firstConv = perStep.indexWhere { case (c, r) => decide(c, r) }
      converged = firstConv >= 0
      val effK = if (converged) firstConv + 1 else k
      val effIter = iter + effK
      val (chgEff, rowsEff) = perStep(effK - 1)

      val t1 = System.nanoTime()
      checkpointDir.foreach { dir =>
        // state is checkpointed WITH its _chg column: frontier algorithms
        // need it to resume with the correct active set
        if (converged || effIter % checkpointEvery == 0 || effIter >= maxIter) {
          writeCheckpoint(dir, algo, effIter, chgEff, rowsEff, view, converged,
            threshold, phases, inputFingerprint)
          // the parquet write + per-partition count are their own jobs:
          // drain their stages so the NEXT iteration's phase windows stay
          // attributed to its own superstep job only
          GraftSqlShim.waitListenerBus(session)
          listener.drain()
        }
      }
      val checkpointMs = (System.nanoTime() - t1) / 1000000L

      releaseBacking()
      state = view
      releaseBacking = newRelease
      iter = effIter
      lastChanged = chgEff
      // one IterStats per counted superstep: exact per-step changed/rows
      // from its observation; computeMs is the per-step share of the
      // (possibly batched) job; `steps` records the job's batch width;
      // job-level phases + checkpoint time ride the batch's last entry
      // divide by effK (not k) so per-step computeMs sums to the job's wall
      // time even when convergence truncates the batch mid-job
      for (j <- 0 until effK) {
        val (c, r) = perStep(j)
        val last = j == effK - 1
        stats ::= IterStats(iter - effK + j + 1, c, r, computeMs / effK,
          if (last) checkpointMs else 0L, if (last) phases else Nil, k)
      }
    } finally {
      session.sparkContext.setLocalProperty(LoopIdProperty, null)
      session.sparkContext.removeSparkListener(listener)
    }
    // rebind the final state to the CALLER's session: downstream one-shot
    // queries (result aggregations, orderBys, sinks) must plan under the
    // caller's confs, not the loop-pinned ones (AQE off, broadcast ban)
    LoopResult(GraftSqlShim.bind(session, state.drop("_chg")),
      iter - startIter, converged, stats.reverse,
      release = releaseBacking)
  }

  /** [[loop]] with automatic resume: when `cfg.checkpointDir` holds a
    * committed manifest, the loop restarts from that state and iteration
    * (skipping the loop entirely if the manifest says converged); otherwise
    * it starts from `init`. `cfg.maxIter` counts TOTAL supersteps including
    * the pre-crash ones, matching the reference's iteration cap semantics.
    */
  def loopResumable(
      init: => DataFrame,
      step: Step,
      cfg: graft.model.RunConfig,
      algo: String,
      inputFingerprint: Option[Long] = None,
      shuffleWidth: Option[Int] = None): LoopResult = {
    cfg.checkpointDir match {
      case None =>
        loop(init, step, cfg.maxIter, cfg.convergenceThreshold,
          None, cfg.checkpointEvery, cfg.localCheckpointEvery, algo = algo,
          ratioThreshold = cfg.convergenceRatio,
          batchK = cfg.batchK, batchFrontierMax = cfg.batchFrontierMax,
          shuffleWidth = shuffleWidth)
      case Some(dir) =>
        val (state, doneIter, converged) = {
          val spark = SparkSession.active
          resumeOrInit(spark, dir, init, algo, inputFingerprint)
        }
        if (converged) LoopResult(state.drop("_chg"), 0, converged = true, Nil)
        else loop(state, step, cfg.maxIter, cfg.convergenceThreshold,
          Some(dir), cfg.checkpointEvery, cfg.localCheckpointEvery,
          startIter = doneIter, algo = algo, ratioThreshold = cfg.convergenceRatio,
          batchK = cfg.batchK, batchFrontierMax = cfg.batchFrontierMax,
          inputFingerprint = inputFingerprint, shuffleWidth = shuffleWidth)
    }
  }

  /** Resume state from the newest committed checkpoint under `dir`, or fall
    * back to `init`. Returns (state, iterationAlreadyCompleted, converged).
    * A manifest written by a different algorithm (or a pre-`algo` layout)
    * fails loudly instead of silently returning the other run's state; so
    * does a manifest whose recorded input fingerprint differs from
    * `inputFingerprint` — resuming an old run against a mutated edge table
    * would silently continue from stale state (SURVEY §7.5's
    * `inputFingerprint` contract).
    */
  def resumeOrInit(
      spark: SparkSession,
      dir: String,
      init: => DataFrame,
      expectedAlgo: String,
      inputFingerprint: Option[Long] = None): (DataFrame, Int, Boolean) = {
    latestManifest(spark, dir) match {
      case Some((iterDone, manifest)) =>
        val found = "\"algo\":\"([^\"]*)\"".r
          .findFirstMatchIn(manifest).map(_.group(1))
        if (!found.contains(expectedAlgo))
          throw new IllegalStateException(
            s"checkpoint at $dir was written by algo '${found.getOrElse("<unknown>")}', " +
            s"not '$expectedAlgo' — refusing to resume from another run's state")
        val foundFp = "\"input_fp\":(-?\\d+)".r
          .findFirstMatchIn(manifest).map(_.group(1).toLong)
        (inputFingerprint, foundFp) match {
          case (Some(now), Some(then_)) if now != then_ =>
            throw new IllegalStateException(
              s"checkpoint at $dir was written for input fingerprint $then_, " +
              s"but the current input fingerprints to $now — refusing to resume " +
              "a run against a different input table")
          case _ => ()
        }
        val state = spark.read.parquet(s"$dir/iter=$iterDone/state")
        val converged = manifest.contains("\"converged\":true")
        (state, iterDone, converged)
      case None => (init, 0, false)
    }
  }

  /** Newest iteration number with a committed manifest, plus its JSON. */
  def latestManifest(spark: SparkSession, dir: String): Option[(Int, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val iters = fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("iter=") => n.drop(5).toInt }
      .sorted(Ordering[Int].reverse)
    iters.iterator.flatMap { k =>
      val mf = new Path(s"$dir/iter=$k/manifest.json")
      if (fs.exists(mf)) {
        val in = fs.open(mf)
        try {
          val bytes = new Array[Byte](fs.getFileStatus(mf).getLen.toInt)
          in.readFully(bytes)
          Some(k -> new String(bytes, StandardCharsets.UTF_8))
        } finally in.close()
      } else None
    }.nextOption()
  }

  private[graft] def writeCheckpoint(
      dir: String, algo: String, iteration: Int,
      changed: Long, rows: Long, state: DataFrame,
      converged: Boolean, threshold: Long, phases: List[PhaseWindow],
      inputFingerprint: Option[Long] = None): Unit = {
    val spark = state.sparkSession
    val statePath = s"$dir/iter=$iteration/state"
    state.write.mode("overwrite").parquet(statePath)
    // per-partition row counts of the written state = lineage metric
    val perPart = spark.read.parquet(statePath)
      .groupBy(spark_partition_id().as("p")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val phaseJson = phases.map(w =>
      s"""{"phase":"${w.phase}","wall_ms":${w.wallMs},""" +
      s""""task_time_ms":${w.taskTimeMs},"shuffle_read_bytes":${w.shuffleReadBytes},""" +
      s""""shuffle_write_bytes":${w.shuffleWriteBytes}}""").mkString("[", ",", "]")
    val fpJson = inputFingerprint.map(fp => s""""input_fp":$fp,""").getOrElse("")
    val manifest =
      s"""{"algo":"${algo}","iteration":$iteration,"changed":$changed,""" +
      s""""rows":$rows,"converged":$converged,""" +
      s""""convergence_threshold":$threshold,$fpJson""" +
      s""""perPartitionRows":[${perPart.map(_._2).mkString(",")}],""" +
      s""""phases":$phaseJson}"""
    val conf = spark.sparkContext.hadoopConfiguration
    val mf = new Path(s"$dir/iter=$iteration/manifest.json")
    val fs = mf.getFileSystem(conf)
    val out = fs.create(mf, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
