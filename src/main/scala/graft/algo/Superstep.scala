package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * over declarative Dataset plans: each superstep is a fresh Catalyst plan
  * (predicate pushdown / codegen apply per step), state is persisted and the
  * previous iteration's state unpersisted, and lineage is truncated with
  * `localCheckpoint` every `localCheckpointEvery` steps — the GraphX-shell
  * mistake of one extra `count()` join per superstep (SURVEY.md §7.6) is
  * avoided by folding the changed-count into the single materializing
  * aggregation.
  *
  * Durable checkpointing (the north rule's "resumable mid-convergence"):
  * every `checkpointEvery` iterations the state parquet is written under
  * `dir/iter=K/state` followed by `dir/iter=K/manifest.json` (manifest
  * written last = commit marker, so a torn write is never resumed from).
  * The manifest carries the changed-count, total and per-partition row
  * counts, and phase wall times — the per-partition lineage metrics.
  * [[resumeOrInit]] restarts the loop from the newest committed manifest.
  * The reference has no equivalent (a failed worker fails the run).
  */
object Superstep {

  /** Per-iteration phase metrics (reference style: `runtime_metrics.py:81-183`). */
  final case class IterStats(
      iteration: Int,
      changed: Long,
      rows: Long,
      computeMs: Long,
      checkpointMs: Long)

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
      localCheckpointEvery: Int = 4,
      startIter: Int = 0,
      algo: String = "superstep"): LoopResult = {

    // AQE is disabled inside the loop: its runtime partition coalescing
    // re-plans every tiny superstep and breaks the hash-partitioning
    // match between the persisted edge side and the evolving state side
    // (turning free co-partitioned joins into fresh exchanges). Measured
    // ~15-20% per-superstep win at 10M edges; AQE stays on for the one-shot
    // relational queries where skew-split/coalesce actually pay.
    val session = org.apache.spark.sql.SparkSession.active
    val aqeBefore = session.conf.get("spark.sql.adaptive.enabled", "true")
    session.conf.set("spark.sql.adaptive.enabled", "false")
    // shuffled-hash over sort-merge inside the loop: the per-superstep
    // gather/apply joins re-sort O(n+m) rows every iteration under SMJ,
    // while hash join streams them (state fits the per-partition hash map
    // by construction — it is the persisted, evenly hash-partitioned side)
    val smjBefore = session.conf.get("spark.sql.join.preferSortMergeJoin", "true")
    session.conf.set("spark.sql.join.preferSortMergeJoin", "false")

    // localCheckpoint (not plain persist) — a step references its input
    // more than once, so without lineage truncation the logical plan doubles
    // every superstep and analysis/AQE cost grows exponentially
    var state = init.localCheckpoint(eager = true)
    var iter = startIter
    var converged = false
    var stats = List.empty[IterStats]

    try while (iter < maxIter && !converged) {
      val t0 = System.nanoTime()
      val doneIter = iter + 1
      // changed/row counts ride the materializing count() via observe()
      // (accumulator-backed) — no separate aggregation job per superstep,
      // which at converged-frontier sizes costs as much as the superstep
      val obs = new org.apache.spark.sql.Observation(s"superstep_$doneIter")
      var next = step(state, iter)
        .observe(obs, count(lit(1)).as("rows"),
          sum(when(col("_chg"), 1L).otherwise(0L)).as("changed"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val rows = next.count() // one job: caches state + fires the observation
      val metrics = obs.get
      val changed = metrics.get("changed").map {
        case null => 0L
        case v => v.asInstanceOf[Long]
      }.getOrElse(0L)
      // lineage truncation every K supersteps (a step references its input
      // twice, so the logical plan doubles per untruncated iteration —
      // bounded at 2^K × base; the checkpoint pass reads from the cache)
      if ((doneIter - startIter) % localCheckpointEvery == 0) {
        val cached = next
        next = next.localCheckpoint(eager = true)
        cached.unpersist(blocking = false)
      }
      val computeMs = (System.nanoTime() - t0) / 1000000L

      val t1 = System.nanoTime()
      checkpointDir.foreach { dir =>
        // state is checkpointed WITH its _chg column: frontier algorithms
        // need it to resume with the correct active set
        if (changed <= threshold || doneIter % checkpointEvery == 0 || doneIter >= maxIter)
          writeCheckpoint(dir, algo, doneIter, changed, rows, next)
      }
      val checkpointMs = (System.nanoTime() - t1) / 1000000L


      state.unpersist(blocking = false)
      state = next
      iter = doneIter
      stats ::= IterStats(doneIter, changed, rows, computeMs, checkpointMs)
      converged = changed <= threshold
    } finally {
      session.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      session.conf.set("spark.sql.join.preferSortMergeJoin", smjBefore)
    }
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
          None, cfg.checkpointEvery, cfg.localCheckpointEvery, algo = algo)
      case Some(dir) =>
        val (state, doneIter, converged) = {
          val spark = org.apache.spark.sql.SparkSession.active
          resumeOrInit(spark, dir, init)
        }
        if (converged) LoopResult(state.drop("_chg"), 0, converged = true, Nil)
        else loop(state, step, cfg.maxIter, cfg.convergenceThreshold,
          Some(dir), cfg.checkpointEvery, cfg.localCheckpointEvery,
          startIter = doneIter, algo = algo)
    }
  }

  /** Resume state from the newest committed checkpoint under `dir`, or fall
    * back to `init`. Returns (state, iterationAlreadyCompleted, converged).
    */
  def resumeOrInit(
      spark: SparkSession,
      dir: String,
      init: => DataFrame): (DataFrame, Int, Boolean) = {
    latestManifest(spark, dir) match {
      case Some((iterDone, manifest)) =>
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
      changed: Long, rows: Long, state: DataFrame): Unit = {
    val spark = state.sparkSession
    val statePath = s"$dir/iter=$iteration/state"
    state.write.mode("overwrite").parquet(statePath)
    // per-partition row counts of the written state = lineage metric
    val perPart = spark.read.parquet(statePath)
      .groupBy(spark_partition_id().as("p")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val manifest =
      s"""{"algo":"${algo}","iteration":$iteration,"changed":$changed,""" +
      s""""rows":$rows,"converged":${changed <= 0L},""" +
      s""""perPartitionRows":[${perPart.map(_._2).mkString(",")}]}"""
    val conf = spark.sparkContext.hadoopConfiguration
    val mf = new Path(s"$dir/iter=$iteration/manifest.json")
    val fs = mf.getFileSystem(conf)
    val out = fs.create(mf, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
