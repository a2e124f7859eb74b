package graft.oracle

import scala.collection.mutable

/** Single-threaded reference oracles, used by the differential test suite to
  * pin the distributed Dataset engine to the reference's exact semantics.
  *
  * `SerialLP` transcribes the canonical CSR loop of the reference
  * (`lpst/src/lib.rs:177-221` `run_lp_csr` + `:133-155`
  * `majority_label_sorted`); the other oracles transcribe the published
  * GraphX formulations the reference benchmarks against
  * (`spark_baseline/scripts/`). None of this code touches Spark.
  */
object SerialOracles {

  /** Majority label among `votes` (labelled neighbours only), ties broken by
    * smallest label, `current` when no votes — exact transcription of
    * `lpst/src/lib.rs:133-155` / `ow-lp/src/lib.rs:456-481`.
    */
  def majorityLabel(votes: Seq[Long], current: Long): Long = {
    if (votes.isEmpty) return current
    val counts = mutable.Map.empty[Long, Int]
    votes.foreach(l => counts(l) = counts.getOrElse(l, 0) + 1)
    var best = current
    var bestCount = 0
    // ascending label order + strictly-greater replacement = largest count,
    // smallest label on ties
    counts.toSeq.sortBy(_._1).foreach { case (label, c) =>
      if (c > bestCount) { best = label; bestCount = c }
    }
    best
  }

  /** Synchronous label propagation to convergence.
    *
    * Semantics (reference `run_lp_csr`, `lpst/src/lib.rs:177-221`):
    *  - seeds present  → semi-supervised: seeded nodes pinned forever;
    *    unseeded nodes start unlabeled (None)
    *  - no seeds       → unsupervised: every node starts with label = id
    *  - per superstep, each node's new label = majority of its
    *    out-neighbours' previous labels (unlabeled neighbours contribute
    *    nothing; duplicates weight the vote); no labelled neighbour → keep
    *  - stop when no label changed, or after `maxIter` supersteps.
    *
    * Seeds must already be min-deduped per node (`ow-lp/src/lib.rs:224-235`).
    * Returns the label per node id in [0, numNodes); None = never labelled.
    */
  def labelPropagation(
      numNodes: Int,
      edges: Seq[(Long, Long)],
      seeds: Map[Long, Long],
      maxIter: Int = graft.model.DefaultMaxIter,
      threshold: Long = 0L): Array[Option[Long]] = {
    val adj = Array.fill(numNodes)(mutable.ArrayBuffer.empty[Int])
    edges.foreach { case (s, d) =>
      if (s >= 0 && s < numNodes && d >= 0 && d < numNodes)
        adj(s.toInt) += d.toInt
    }
    val unsupervised = seeds.isEmpty
    val labels: Array[Option[Long]] =
      if (unsupervised) Array.tabulate(numNodes)(i => Some(i.toLong))
      else Array.tabulate(numNodes)(i => seeds.get(i.toLong))

    var iter = 0
    var continue = true
    while (continue && iter < maxIter) {
      val prev = labels.clone()
      var changed = 0L
      var i = 0
      while (i < numNodes) {
        val pinned = !unsupervised && seeds.contains(i.toLong)
        if (!pinned) {
          val votes = adj(i).flatMap(n => prev(n))
          val current = prev(i)
          val next = current match {
            case Some(c) => Some(majorityLabel(votes.toSeq, c))
            case None => if (votes.isEmpty) None
                         else Some(majorityLabel(votes.toSeq, graft.model.Unknown))
          }
          if (next != current) { labels(i) = next; changed += 1 }
        }
        i += 1
      }
      iter += 1
      continue = changed > threshold
    }
    labels
  }

  /** GraphX-equivalent dynamic PageRank (`PageRank.runUntilConvergence`):
    * delta-based Pregel, vertices start at (rank=0, delta=0), initial message
    * resetProb/(1-resetProb), newPR = oldPR + (1-resetProb)·msgSum, messages
    * sent only from vertices active last round with delta > tol, final ranks
    * normalized to sum = numVertices (SPARK-18847 normalizeRankSum).
    * Verified equal to the actual GraphX jar in PageRankSpec.
    */
  def pageRank(
      vertices: Seq[Long],
      edges: Seq[(Long, Long)],
      tol: Double = 1e-6,
      resetProb: Double = 0.15,
      maxIter: Int = Int.MaxValue): Map[Long, Double] = {
    val vs = vertices.distinct
    val outDeg = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (s, _) => outDeg(s) += 1 }
    val rank = mutable.Map.empty[Long, Double]
    val delta = mutable.Map.empty[Long, Double]
    // first Pregel superstep: every vertex receives the initial message
    val initMsg = resetProb / (1.0 - resetProb)
    vs.foreach { v =>
      val newPR = 0.0 + (1.0 - resetProb) * initMsg
      rank(v) = newPR
      delta(v) = newPR
    }
    var active: Set[Long] = vs.toSet
    var iter = 0
    while (active.nonEmpty && iter < maxIter) {
      val msgs = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      edges.foreach { case (s, d) =>
        if (active.contains(s) && delta(s) > tol)
          msgs(d) += delta(s) / outDeg(s)
      }
      msgs.foreach { case (v, m) =>
        val inc = (1.0 - resetProb) * m
        rank(v) = rank(v) + inc
        delta(v) = inc
      }
      active = msgs.keySet.toSet
      iter += 1
    }
    val sum = vs.iterator.map(rank).sum
    val factor = vs.size.toDouble / sum
    vs.iterator.map(v => v -> rank(v) * factor).toMap
  }

  /** Weakly-connected components: component id = min vertex id reachable in
    * the undirected sense (`connected_components_shell.scala:21-29,75`).
    */
  def connectedComponents(
      vertices: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val comp = mutable.Map.empty[Long, Long]
    vertices.distinct.foreach(v => comp(v) = v)
    val und = edges.flatMap { case (s, d) => Seq((s, d), (d, s)) }
    var changed = true
    while (changed) {
      changed = false
      und.foreach { case (s, d) =>
        if (comp(s) < comp(d)) { comp(d) = comp(s); changed = true }
      }
    }
    comp.toMap
  }

  /** FNV-64 fingerprint of the component column ordered by vertex id —
    * exact transcription of `connected_components_shell.scala:34-37,77-83`.
    */
  def fnvComponentHash(components: Map[Long, Long]): Long = {
    var acc = 0xcbf29ce484222325L
    components.toSeq.sortBy(_._1).foreach { case (_, c) =>
      acc = (acc ^ c) * 0x100000001b3L
    }
    acc
  }

  /** BFS min-hop levels from `source` (`bfs_graphx_shell.scala`):
    * unreachable = None, level cap `maxLevels`.
    */
  def bfs(
      vertices: Seq[Long],
      edges: Seq[(Long, Long)],
      source: Long,
      maxLevels: Int = 500): Map[Long, Option[Long]] = {
    val dist = mutable.Map.empty[Long, Long]
    if (vertices.contains(source)) dist(source) = 0L
    var frontier = Set(source)
    var level = 0L
    while (frontier.nonEmpty && level < maxLevels) {
      val next = mutable.Set.empty[Long]
      edges.foreach { case (s, d) =>
        if (frontier.contains(s) && !dist.contains(d)) {
          dist(d) = level + 1; next += d
        }
      }
      frontier = next.toSet
      level += 1
    }
    vertices.distinct.map(v => v -> dist.get(v)).toMap
  }

  /** SSSP (Bellman-Ford fixpoint) from `source`; missing weight = 1.0
    * (`sssp_graphx_shell.scala:87-98`). Unreachable = None.
    */
  def sssp(
      vertices: Seq[Long],
      edges: Seq[(Long, Long, Double)],
      source: Long): Map[Long, Option[Double]] = {
    val dist = mutable.Map.empty[Long, Double]
    dist(source) = 0.0
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (s, d, w) =>
        dist.get(s).foreach { ds =>
          val cand = ds + w
          if (cand < dist.getOrElse(d, Double.PositiveInfinity)) {
            dist(d) = cand; changed = true
          }
        }
      }
    }
    vertices.distinct.map(v => v -> dist.get(v)).toMap
  }

  /** Per-vertex triangle counts, GraphX TriangleCount semantics: drop self
    * loops, canonicalize to undirected distinct edges, count closed wedges.
    */
  def triangleCounts(
      vertices: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val canon = edges.iterator
      .filter { case (s, d) => s != d }
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }
      .toSet
    val nbrs = mutable.Map.empty[Long, mutable.Set[Long]]
    canon.foreach { case (a, b) =>
      nbrs.getOrElseUpdate(a, mutable.Set.empty) += b
      nbrs.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    // each triangle is discovered once from each of its 3 edges, and each
    // discovery credits all 3 vertices — so raw counts are 3× per vertex
    val count = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    canon.foreach { case (a, b) =>
      nbrs(a).intersect(nbrs(b)).foreach { c =>
        count(a) += 1; count(b) += 1; count(c) += 1
      }
    }
    vertices.distinct.map(v => v -> count(v) / 3).toMap
  }
}
