package graft.algo

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, GraftSqlShim, Observation, SparkSession}
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
  *  - exactly ONE job per superstep: `count()` on the persisted new state,
  *    which materializes the cache and fires the changed-count observation;
  *  - logical-plan lineage is truncated EVERY step at zero execution cost
  *    by wrapping the cached result's RDD in a `LogicalRDD`
  *    ([[org.apache.spark.sql.GraftSqlShim.truncatedView]]) — a step
  *    references its input twice, so an untruncated plan doubles per
  *    superstep and Catalyst analysis comes to dominate small iterations;
  *  - the RDD-level DAG (which grows a few nodes per superstep and rides
  *    along in every task closure) is truncated with a real
  *    `localCheckpoint` only every `localCheckpointEvery` steps;
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

  /** Per-iteration phase metrics (reference style: `runtime_metrics.py:81-183`). */
  final case class IterStats(
      iteration: Int,
      changed: Long,
      rows: Long,
      computeMs: Long,
      checkpointMs: Long,
      phases: List[PhaseWindow] = Nil)

  final case class LoopResult(
      state: DataFrame,
      iterations: Int,
      converged: Boolean,
      stats: List[IterStats])

  /** One superstep: previous state → new state carrying a boolean `_chg`
    * column (true on every row whose vertex value changed this step). The
    * previous state still carries its own `_chg` (absent on iteration 0) so
    * frontier-based algorithms can restrict work to changed vertices; the
    * driver aggregates the new `_chg` to decide convergence.
    */
  type Step = (DataFrame, Int) => DataFrame

  /** Collects per-stage windows; drained once per superstep. Stage events
    * for the materializing job are flushed before `Observation.get`
    * returns (same listener queue), so the drain is race-free for the job
    * it attributes.
    */
  private final class PhaseListener extends SparkListener {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, PhaseWindow)]
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val si = ev.stageInfo
      val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s)
        .getOrElse(0L)
      val m = si.taskMetrics
      val w = PhaseWindow("", wall, m.executorRunTime,
        m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten)
      buf.synchronized { buf += ((si.stageId, w)) }
    }
    /** Stages completed since the last drain, in stage order, phase-named. */
    def drain(): List[PhaseWindow] = {
      val raw = buf.synchronized { val r = buf.sortBy(_._1).toList; buf.clear(); r }
      val names = raw.size match {
        // canonical superstep job: map-side gather/scatter + partial agg,
        // final agg + apply join + persist, single-task count collect
        case 3 => List("gather", "apply", "collect")
        case n => (0 until n).map(i => s"stage$i").toList
      }
      raw.zip(names).map { case ((_, w), n) => w.copy(phase = n) }
    }
  }

  /** Run `step` from `init` until the number of changed rows is ≤ `threshold`
    * or `maxIter` supersteps have completed. `startIter` > 0 resumes
    * counting from a checkpoint.
    *
    * Convergence mirrors `should_continue` (`ow-lp/src/lib.rs:424-426`):
    * iterate while iterations < maxIter and changed > threshold.
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
      ratioThreshold: Option[Double] = None): LoopResult = {
    require(checkpointEvery > 0, s"checkpointEvery must be positive, got $checkpointEvery")
    require(localCheckpointEvery > 0,
      s"localCheckpointEvery must be positive, got $localCheckpointEvery")

    val session = SparkSession.active
    val loopSession = GraftSqlShim.sessionWithConfs(session,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.join.preferSortMergeJoin" -> "false",
      // NO broadcast joins inside the loop: with a sub-threshold state the
      // planner would otherwise collect + re-broadcast the evolving frontier
      // EVERY superstep (serial driver cost growing with |V| — measured as
      // the dominant per-superstep fixed cost at 100K vertices, and fatal
      // to scaling at 4M). The co-partitioned shuffled-hash gather join
      // needs zero exchanges and builds only |partition|-sized hash maps.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val listener = new PhaseListener
    session.sparkContext.addSparkListener(listener)

    // initial state: materialized once, lineage truncated
    var state = GraftSqlShim.bind(loopSession, init).localCheckpoint(eager = true)
    // the dataset owning `state`'s cached/checkpointed blocks (a truncated
    // view is only a window onto its backing iteration's cache)
    var backing: DataFrame = state
    var iter = startIter
    var converged = false
    var stats = List.empty[IterStats]

    val loopTimers = sys.env.contains("SPARK_GRAFT_LOOP_TIMERS")
    try while (iter < maxIter && !converged) {
      val t0 = System.nanoTime()
      val doneIter = iter + 1
      // changed/row counts ride the materializing count() via observe()
      // (accumulator-backed) — no separate aggregation job per superstep,
      // which at converged-frontier sizes costs as much as the superstep
      val obs = new Observation(s"superstep_$doneIter")
      val next = GraftSqlShim.bind(loopSession, step(state, iter))
        .observe(obs, count(lit(1)).as("rows"),
          sum(when(col("_chg"), 1L).otherwise(0L)).as("changed"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val tBuilt = System.nanoTime()
      if (doneIter == 3 && sys.env.contains("SPARK_GRAFT_EXPLAIN_STEP"))
        next.explain("formatted") // debug: dump one steady-state superstep plan
      val rows = next.count() // THE one job: caches state + fires the observation
      val tCounted = System.nanoTime()
      val metrics = obs.get
      if (loopTimers) {
        val tObs = System.nanoTime()
        System.err.println(f"[loop] iter=$doneIter build=${(tBuilt - t0) / 1e6}%.0fms " +
          f"count=${(tCounted - tBuilt) / 1e6}%.0fms obsGet=${(tObs - tCounted) / 1e6}%.0fms")
      }
      val changed = metrics.get("changed").map {
        case null => 0L
        case v => v.asInstanceOf[Long]
      }.getOrElse(0L)
      val phases = listener.drain()

      // logical lineage truncation every step is free (LogicalRDD over the
      // cache); a real localCheckpoint every K steps bounds the RDD DAG
      // that task closures carry
      val (view, newBacking) =
        if ((doneIter - startIter) % localCheckpointEvery == 0) {
          val lc = next.localCheckpoint(eager = true)
          next.unpersist(blocking = false)
          (lc, lc)
        } else (GraftSqlShim.truncatedView(next), next)
      listener.drain() // discard the localCheckpoint job's stages, if any
      if (loopTimers)
        System.err.println(f"[loop] iter=$doneIter total=${(System.nanoTime() - t0) / 1e6}%.0fms")
      val computeMs = (System.nanoTime() - t0) / 1000000L

      val t1 = System.nanoTime()
      checkpointDir.foreach { dir =>
        // state is checkpointed WITH its _chg column: frontier algorithms
        // need it to resume with the correct active set
        if (changed <= threshold || doneIter % checkpointEvery == 0 || doneIter >= maxIter)
          writeCheckpoint(dir, algo, doneIter, changed, rows, view, threshold, phases)
      }
      val checkpointMs = (System.nanoTime() - t1) / 1000000L

      backing.unpersist(blocking = false)
      state = view
      backing = newBacking
      iter = doneIter
      stats ::= IterStats(doneIter, changed, rows, computeMs, checkpointMs, phases)
      // absolute count (`ow-lp/src/lib.rs:424-426`), plus the optional
      // lpst class-API change-ratio rule (`lpst/src/lib.rs:484-496`)
      converged = changed <= threshold ||
        ratioThreshold.exists(r => rows > 0 && changed.toDouble / rows <= r)
    } finally session.sparkContext.removeSparkListener(listener)
    LoopResult(state.drop("_chg"), iter - startIter, converged, stats.reverse)
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
      algo: String): LoopResult = {
    cfg.checkpointDir match {
      case None =>
        loop(init, step, cfg.maxIter, cfg.convergenceThreshold,
          None, cfg.checkpointEvery, cfg.localCheckpointEvery, algo = algo,
          ratioThreshold = cfg.convergenceRatio)
      case Some(dir) =>
        val (state, doneIter, converged) = {
          val spark = SparkSession.active
          resumeOrInit(spark, dir, init, algo)
        }
        if (converged) LoopResult(state.drop("_chg"), 0, converged = true, Nil)
        else loop(state, step, cfg.maxIter, cfg.convergenceThreshold,
          Some(dir), cfg.checkpointEvery, cfg.localCheckpointEvery,
          startIter = doneIter, algo = algo, ratioThreshold = cfg.convergenceRatio)
    }
  }

  /** Resume state from the newest committed checkpoint under `dir`, or fall
    * back to `init`. Returns (state, iterationAlreadyCompleted, converged).
    * A manifest written by a different algorithm (or a pre-`algo` layout)
    * fails loudly instead of silently returning the other run's state.
    */
  def resumeOrInit(
      spark: SparkSession,
      dir: String,
      init: => DataFrame,
      expectedAlgo: String): (DataFrame, Int, Boolean) = {
    latestManifest(spark, dir) match {
      case Some((iterDone, manifest)) =>
        val found = "\"algo\":\"([^\"]*)\"".r
          .findFirstMatchIn(manifest).map(_.group(1))
        if (!found.contains(expectedAlgo))
          throw new IllegalStateException(
            s"checkpoint at $dir was written by algo '${found.getOrElse("<unknown>")}', " +
            s"not '$expectedAlgo' — refusing to resume from another run's state")
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

  private def writeCheckpoint(
      dir: String, algo: String, iteration: Int,
      changed: Long, rows: Long, state: DataFrame,
      threshold: Long, phases: List[PhaseWindow]): Unit = {
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
    val manifest =
      s"""{"algo":"${algo}","iteration":$iteration,"changed":$changed,""" +
      s""""rows":$rows,"converged":${changed <= threshold},""" +
      s""""convergence_threshold":$threshold,""" +
      s""""perPartitionRows":[${perPart.map(_._2).mkString(",")}],""" +
      s""""phases":$phaseJson}"""
    val conf = spark.sparkContext.hadoopConfiguration
    val mf = new Path(s"$dir/iter=$iteration/manifest.json")
    val fs = mf.getFileSystem(conf)
    val out = fs.create(mf, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
