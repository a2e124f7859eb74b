package graft

import graft.model._
import graft.algo.LabelPropagation
import graft.oracle.SerialOracles
import graft.gen.SyntheticGraph

/** Distributed Dataset LP vs the serial oracle: golden fixtures plus
  * differential tests on deterministic random graphs (sizes, densities and
  * seed rates swept; the reference ships no property tests — this is our
  * §5/4-level-equivalent differential layer).
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def runBoth(
      n: Int,
      edges: Seq[(Long, Long)],
      seeds: Map[Long, Long],
      maxIter: Int = DefaultMaxIter): (Map[Long, Long], Map[Long, Long]) = {
    val ds = spark.createDataset(edges.map { case (s, d) => Edge(s, d) })
    val sd = spark.createDataset(seeds.toSeq.map { case (k, v) => Seed(k, v) })
    val res = LabelPropagation.run(ds, sd, RunConfig(maxIter = maxIter))
    val dist = res.labels.collect().map(v => v.id -> v.label).toMap
    val oracle = SerialOracles
      .labelPropagation(n, edges, seeds, maxIter)
      .zipWithIndex
      .collect { case (Some(l), i) => i.toLong -> l }
      .toMap
    // oracle emits rows for isolated ids in [0,n) too; the Dataset engine
    // only sees vertices present in the edge table — restrict to those
    val present = edges.flatMap { case (s, d) => Seq(s, d) }.toSet ++ seeds.keySet
    (dist, oracle.filter { case (k, _) => present(k) })
  }

  private val triangle = Seq[(Long, Long)]((0, 1), (0, 2), (2, 0), (2, 1), (1, 0), (1, 2))

  test("F1 distributed: triangle seed 0→100") {
    val (d, o) = runBoth(3, triangle, Map(0L -> 100L))
    d shouldBe o
    d shouldBe Map(0L -> 100L, 1L -> 100L, 2L -> 100L)
  }

  test("F2 distributed unsupervised: all 0") {
    val (d, o) = runBoth(3, triangle, Map.empty)
    d shouldBe o
    d.values.toSet shouldBe Set(0L)
  }

  test("F3 distributed: conflicting duplicate seeds min-deduped in-engine") {
    val ds = spark.createDataset(triangle.map { case (s, dd) => Edge(s, dd) })
    val sd = spark.createDataset(Seq(Seed(0L, 50L), Seed(0L, 30L)))
    val res = LabelPropagation.run(ds, sd)
    res.labels.collect().map(v => v.id -> v.label).toMap shouldBe
      Map(0L -> 30L, 1L -> 30L, 2L -> 30L)
  }

  test("F4 distributed direction probe") {
    val (d, o) = runBoth(2, Seq((0L, 1L)), Map(1L -> 7L))
    d shouldBe o
    d shouldBe Map(0L -> 7L, 1L -> 7L)
  }

  test("F5 distributed tie-break to smallest") {
    val (d, o) = runBoth(3, Seq((0L, 2L), (1L, 2L), (2L, 0L), (2L, 1L)),
      Map(0L -> 50L, 1L -> 30L))
    d shouldBe o
    d(2L) shouldBe 30L
  }

  test("F6 distributed two components") {
    val k3a = Seq[(Long, Long)]((0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0))
    val k3b = Seq[(Long, Long)]((3, 4), (4, 3), (4, 5), (5, 4), (3, 5), (5, 3))
    val (d, o) = runBoth(6, k3a ++ k3b, Map(0L -> 10L, 3L -> 20L))
    d shouldBe o
  }

  test("F9 distributed: converged flag and immediate stop") {
    val ds = spark.createDataset(Seq(Edge(0L, 1L), Edge(1L, 0L)))
    val sd = spark.createDataset(Seq(Seed(0L, 100L), Seed(1L, 200L)))
    val res = LabelPropagation.run(ds, sd)
    res.converged shouldBe true
    res.iterations shouldBe 1
    res.labels.collect().map(v => v.id -> v.label).toMap shouldBe
      Map(0L -> 100L, 1L -> 200L)
  }

  test("duplicate edges weight the vote") {
    // node 2 sees label(0) twice via duplicate edge, label(1) once
    val edges = Seq[(Long, Long)]((2, 0), (2, 0), (2, 1))
    val (d, o) = runBoth(3, edges, Map(0L -> 200L, 1L -> 100L))
    d shouldBe o
    d(2L) shouldBe 200L
  }

  test("differential: random graphs across sizes, densities, seed rates") {
    val cases = for {
      n <- Seq(7, 23, 60)
      density <- Seq(1, 3, 6)
      seedMod <- Seq(0, 10, 3) // 0 = unsupervised
    } yield (n, density, seedMod)
    cases.foreach { case (n, density, seedMod) =>
      val edges = SyntheticGraph.randomEdgesLocal(n, density, seed = 42L + n + density)
      val seeds =
        if (seedMod == 0) Map.empty[Long, Long]
        else (0L until n by seedMod).map(i => i -> (i % 4) * 100).toMap
      val (d, o) = runBoth(n, edges, seeds)
      withClue(s"n=$n density=$density seedMod=$seedMod: ") { d shouldBe o }
    }
  }

  test("differential: maxIter-capped run matches oracle mid-convergence") {
    val edges = SyntheticGraph.randomEdgesLocal(40, 2, seed = 7L)
    val seeds = Map(0L -> 100L, 20L -> 300L)
    Seq(1, 2, 3).foreach { cap =>
      val (d, o) = runBoth(40, edges, seeds, maxIter = cap)
      withClue(s"maxIter=$cap: ") { d shouldBe o }
    }
  }

  test("differential: community-structured graph (the LP-native topology)") {
    // exact per-vertex equality with the serial oracle, seeded and
    // unsupervised, with inter-community links present
    val n = 120
    val edges = SyntheticGraph.communityEdgesLocal(n, 4, 0.3, 0.02)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) } // undirected voting
    val seeds = Map(0L -> 100L, 35L -> 200L, 65L -> 300L, 95L -> 400L)
    val (d, o) = runBoth(n, edges, seeds)
    d shouldBe o
    val (du, ou) = runBoth(n, edges, Map.empty)
    du shouldBe ou
  }

  test("isolated communities: each dominated by its own seed's label") {
    // interProb low enough that the expected inter-degree rounds to zero →
    // four disconnected dense communities; each seed must own its community
    val n = 120
    val edges = SyntheticGraph.communityEdgesLocal(n, 4, 0.4, 0.0)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    edges.exists { case (a, b) => a / 30 != b / 30 } shouldBe false
    val seeds = Map(0L -> 100L, 35L -> 200L, 65L -> 300L, 95L -> 400L)
    val (d, o) = runBoth(n, edges, seeds)
    d shouldBe o
    val dominant = (0 until 4).map { c =>
      val members = (c * 30 until (c + 1) * 30).map(_.toLong)
      val labels = members.flatMap(d.get)
      labels.groupBy(identity).maxBy(_._2.size)._1
    }
    dominant shouldBe Seq(100L, 200L, 300L, 400L)
  }

  test("unsupervised with declared numNodes covers isolated vertices") {
    // edges touch only 0..2; numNodes=6 declares 3,4,5 as isolated —
    // they keep label=id (lpst init_labels over [0, num_nodes))
    val ds = spark.createDataset(triangle.map { case (s, d) => Edge(s, d) })
    val res = LabelPropagation.run(ds, spark.emptyDataset[Seed],
      RunConfig(), numNodes = Some(6L))
    val got = res.labels.collect().map(v => v.id -> v.label).toMap
    val oracle = SerialOracles.labelPropagation(6, triangle, Map.empty)
      .zipWithIndex.collect { case (Some(l), i) => i.toLong -> l }.toMap
    got shouldBe oracle // NO masking of isolated ids here
    got(3L) shouldBe 3L
    got(4L) shouldBe 4L
    got(5L) shouldBe 5L
  }

  test("convergence-ratio stop rule (lpst class API variant)") {
    val edges = SyntheticGraph.randomEdgesLocal(50, 3, seed = 13L)
    val ds = spark.createDataset(edges.map { case (s, d) => Edge(s, d) })
    val sd = spark.createDataset(Seq(Seed(0L, 100L), Seed(25L, 300L)))
    // ratio 1.0: any change fraction satisfies the rule → stops after 1 step
    val loose = LabelPropagation.run(ds, sd, RunConfig(convergenceRatio = Some(1.0)))
    loose.iterations shouldBe 1
    loose.converged shouldBe true
    // ratio None: identical to the absolute-count default
    val strict = LabelPropagation.run(ds, sd)
    val strictRatio = LabelPropagation.run(ds, sd,
      RunConfig(convergenceRatio = Some(0.0)))
    strictRatio.iterations shouldBe strict.iterations
    strictRatio.labels.collect().map(v => v.id -> v.label).toMap shouldBe
      strict.labels.collect().map(v => v.id -> v.label).toMap
  }

  test("declared numNodes: reference tolerance for out-of-range inputs") {
    // reference contract (lpst): edges with src >= n are silently dropped
    // (build_csr_from_edges, lib.rs:49-71), seeds with node >= n are
    // silently ignored (init_labels, lib.rs:158-172); ONLY dst >= n is a
    // hard error — the reference gather indexes labels[dst] and panics.
    val ds = spark.createDataset(Seq(Edge(0L, 1L), Edge(1L, 9L)))
    val sd = spark.createDataset(Seq(Seed(0L, 100L)))
    // dst 9 >= 5 → fail fast (the reference would panic at gather)
    val ex = intercept[IllegalArgumentException] {
      LabelPropagation.run(ds, sd, numNodes = Some(5L))
    }
    ex.getMessage should include("out-of-range")
    // seed node 99 >= 10 → silently ignored; the run stays SEEDED (the raw
    // seed map is non-empty) with zero effective seeds → no label ever set
    LabelPropagation.run(ds, spark.createDataset(Seq(Seed(99L, 100L))),
      numNodes = Some(10L)).labels.count() shouldBe 0L
    // src 9 >= 8 with dst 5 < 8 → the edge is silently dropped, the run
    // succeeds, and the dropped edge contributes no vote: seed 5's label
    // never reaches 9 (nor anything else over that edge)
    val dsSrcHigh = spark.createDataset(Seq(Edge(0L, 5L), Edge(9L, 5L)))
    val got = LabelPropagation.run(dsSrcHigh,
        spark.createDataset(Seq(Seed(5L, 70L))), numNodes = Some(8L))
      .labels.collect().map(v => v.id -> v.label).toMap
    got shouldBe Map(0L -> 70L, 5L -> 70L)
    // exact cover is fine; labels flow dst→src here, so only the seed at 0
    // (whose out-neighbour chain never carries a label back) stays labeled
    LabelPropagation.run(ds, sd, numNodes = Some(10L))
      .labels.count() shouldBe 1L
  }

  test("LP never batches supersteps (two-reference step shape re-executes)") {
    // LabelPropagation forces batchK = 1: its step's two state references
    // (gather projection, apply join) do not unify under ReuseExchange, so
    // a composed job re-executes prior steps. PageRankSpec carries the
    // positive batching-equivalence test for the step shape that composes.
    val edges = spark.createDataset(
      SyntheticGraph.randomEdgesLocal(150, 3, seed = 21L)
        .map { case (s, d) => Edge(s, d) })
    val sd = spark.createDataset(Seq(Seed(0L, 100L), Seed(75L, 200L)))
    val res = LabelPropagation.run(edges, sd,
      RunConfig(batchK = 4)) // LP overrides even an explicit batch request
    res.converged shouldBe true
    all(res.stats.map(_.steps)) shouldBe 1
  }

  test("MajorityVoteAgg (UDAF surface) == the codegen max-struct vote plan") {
    import org.apache.spark.sql.functions._
    val rows = for { s <- 0L until 60L; j <- 0 until 7 } yield
      (s, math.abs(SyntheticGraph.splitmix64(s * 31 + j)) % 5, 1L + (j % 3))
    val df = rows.toDF("src", "label", "w")
    val agg = df.groupBy($"src")
      .agg(graft.functions.MajorityVoteAgg.majorityVote($"label", $"w").as("vote"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val codegen = df.groupBy($"src", $"label").agg(sum($"w").as("cnt"))
      .groupBy($"src")
      .agg(max(struct($"cnt", (-$"label").as("neg"))).as("m"))
      .select($"src", (-$"m.neg").as("vote"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    agg shouldBe codegen
  }

  test("near-unit expansion: narrow vote == weighted vote, dups still weighted") {
    // ring edges are distinct by construction → the narrow (w-less) vote
    // path engages; appending one duplicated edge (multiplicity 2, 0.07%
    // of rows — inside the 1% near-unit gate) must still weight that vote
    // twice via the setup-time row expansion
    val ring = (0L until 500L).flatMap(i =>
      Seq(1L, 2L, 3L).map(o => (i, (i + o) % 500)))
    val withDup = ring ++ Seq((7L, 9L))
    val seeds = Map(0L -> 100L, 250L -> 300L)
    def runWith(keepw: Boolean) = {
      if (keepw) sys.props("graft.lp.keepw") = "1"
      try {
        val res = LabelPropagation.run(
          spark.createDataset(withDup.map { case (s, d) => Edge(s, d) }),
          spark.createDataset(seeds.toSeq.map { case (k, v) => Seed(k, v) }))
        val m = res.labels.collect().map(v => v.id -> v.label).toMap
        res.release()
        (m, res.iterations, res.converged)
      } finally sys.props.remove("graft.lp.keepw")
    }
    val narrow = runWith(keepw = false)
    val weighted = runWith(keepw = true)
    narrow shouldBe weighted
    val oracle = SerialOracles
      .labelPropagation(500, withDup, seeds, DefaultMaxIter)
      .zipWithIndex.collect { case (Some(l), i) => i.toLong -> l }.toMap
    narrow._1 shouldBe oracle
  }

  test("checkpoint fingerprints interchange between vote representations") {
    val dir = java.nio.file.Files.createTempDirectory("lp-vw-chk").toString
    val edges = spark.createDataset(
      (0L until 120L).flatMap(i => Seq((i, (i + 1) % 120), (i, (i + 7) % 120)))
        .map { case (s, d) => Edge(s, d) })
    val seeds = spark.createDataset(Seq(Seed(0L, 100L), Seed(60L, 200L)))
    val cfg = model.RunConfig(
      checkpointDir = Some(dir), checkpointEvery = 1, maxIter = 2)
    // write checkpoints under the narrow representation, stop unconverged
    val first = LabelPropagation.run(edges, seeds, cfg)
    first.converged shouldBe false
    first.release()
    // resume under the WEIGHTED representation: the manifest fingerprint is
    // computed over the re-grouped logical (src,dst,w) multigraph, so the
    // two physical representations must accept each other's checkpoints
    sys.props("graft.lp.keepw") = "1"
    try {
      val resumed = LabelPropagation.run(edges, seeds, cfg.copy(maxIter = 50))
      resumed.converged shouldBe true
      resumed.release()
    } finally sys.props.remove("graft.lp.keepw")
  }

  test("label histogram reports 20 smallest labels with counts") {
    val ds = spark.createDataset(triangle.map { case (s, d) => Edge(s, d) })
    val res = LabelPropagation.run(ds, spark.emptyDataset[Seed])
    val hist = LabelPropagation.labelHistogram(res.labels).collect()
    hist.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((0L, 3L))
  }

  // Tie-heavy topology: a bipartite-ish graph where most vertices see an
  // exact vote tie every superstep, so the argmax's min-label tie-break is
  // on the critical path of every assignment. Exercised under both vote
  // representations and both loop-join plan families.
  private def tieHeavy: (Seq[(Long, Long)], Map[Long, Long]) = {
    // each right-side vertex r in [100,160) gets edges from exactly two
    // left-side seeds chosen so their labels differ → every vote is 1-vs-1
    val edges = (0L until 60L).flatMap { i =>
      val r = 100L + i
      Seq((2 * (i % 7), r), (2 * ((i + 3) % 7) + 1, r),
          (r, 2 * (i % 7)), (r, 2 * ((i + 3) % 7) + 1))
    }
    val seeds = (0L until 14L).map(i => i -> (500L + i * 3)).toMap
    (edges, seeds)
  }

  test("packed-long argmax == struct argmax on a tie-heavy graph") {
    // the default vote packs (cnt<<32)|(2^32-1-label) into one long so the
    // aggregation hash-aggregates; graft.lp.structvote=1 restores the
    // max(struct(cnt,-label)) SortAggregate shape. Same ties, same labels.
    val (edges, seeds) = tieHeavy
    def runWith(struct: Boolean) = {
      if (struct) sys.props("graft.lp.structvote") = "1"
      try {
        val res = LabelPropagation.run(
          spark.createDataset(edges.map { case (s, d) => Edge(s, d) }),
          spark.createDataset(seeds.toSeq.map { case (k, v) => Seed(k, v) }))
        val m = res.labels.collect().map(v => v.id -> v.label).toMap
        val out = (m, res.iterations, res.converged)
        res.release()
        out
      } finally sys.props.remove("graft.lp.structvote")
    }
    val packed = runWith(struct = false)
    val structv = runWith(struct = true)
    packed shouldBe structv
  }

  test("packed vote exchange == pair exchange, incl. src ids above 2^31") {
    // the default unitW+u32 shape ships one long pk=(src<<32)|label on the
    // per-superstep exchange; graft.lp.packexchange=0 restores the
    // (src,label) pair row. Same ties, same labels — and ids in
    // [2^31, 2^32) make the packed long NEGATIVE, pinning the
    // shiftrightunsigned unpack (a signed shiftright sign-extends there).
    val (tieEdges, tieSeeds) = tieHeavy
    val hi = 0x80000000L // 2^31
    val hiEdges = tieEdges.map { case (s, d) => (s + hi, d + hi) }
    val hiSeeds = tieSeeds.map { case (k, v) => (k + hi) -> v }
    def runWith(edges: Seq[(Long, Long)], seeds: Map[Long, Long],
        pack: Boolean) = {
      if (!pack) sys.props("graft.lp.packexchange") = "0"
      try {
        val res = LabelPropagation.run(
          spark.createDataset(edges.map { case (s, d) => Edge(s, d) }),
          spark.createDataset(seeds.toSeq.map { case (k, v) => Seed(k, v) }))
        val m = res.labels.collect().map(v => v.id -> v.label).toMap
        val out = (m, res.iterations, res.converged)
        res.release()
        out
      } finally sys.props.remove("graft.lp.packexchange")
    }
    for ((e, s) <- Seq((tieEdges, tieSeeds), (hiEdges, hiSeeds))) {
      val on = runWith(e, s, pack = true)
      val off = runWith(e, s, pack = false)
      on shouldBe off
    }
    // ids at 2^32 or above must NOT take the packed path (and still agree)
    val bigEdges = tieEdges.map { case (s, d) => (s + (1L << 32), d + (1L << 32)) }
    val bigSeeds = tieSeeds.map { case (k, v) => (k + (1L << 32)) -> v }
    runWith(bigEdges, bigSeeds, pack = true) shouldBe
      runWith(bigEdges, bigSeeds, pack = false)
  }

  test("packed exchange under forced salting (weighted vote row)") {
    // hub-skew graphs keep the weighted vote (salted adjacency carries w);
    // the packed exchange must ship (pk, w) there and agree with the
    // (src, label, w) pair row bit-for-bit
    val (tieEdges, tieSeeds) = tieHeavy
    val saltCfg = RunConfig(hubSaltK = 4, hubDegreeThreshold = 1L)
    def runWith(pack: Boolean) = {
      if (!pack) sys.props("graft.lp.packexchange") = "0"
      try {
        val res = LabelPropagation.run(
          spark.createDataset(tieEdges.map { case (s, d) => Edge(s, d) }),
          spark.createDataset(tieSeeds.toSeq.map { case (k, v) => Seed(k, v) }),
          saltCfg)
        val m = res.labels.collect().map(v => v.id -> v.label).toMap
        val out = (m, res.iterations, res.converged)
        res.release()
        out
      } finally sys.props.remove("graft.lp.packexchange")
    }
    val on = runWith(pack = true)
    val off = runWith(pack = false)
    on shouldBe off
    // and both agree with the unsalted default run
    val plain = LabelPropagation.run(
      spark.createDataset(tieEdges.map { case (s, d) => Edge(s, d) }),
      spark.createDataset(tieSeeds.toSeq.map { case (k, v) => Seed(k, v) }))
    val plainMap = plain.labels.collect().map(v => v.id -> v.label).toMap
    plain.release()
    on._1 shouldBe plainMap
  }

  test("legacy (unhinted) loop-join plans produce identical labels") {
    // graft.loop.legacyplan=1 drops the shuffle_hash hints, letting Spark
    // fall back to SortMergeJoin in every superstep — plan-only toggle,
    // results must be bit-identical
    val (edges, seeds) = tieHeavy
    def runWith(legacy: Boolean) = {
      if (legacy) sys.props("graft.loop.legacyplan") = "1"
      try {
        val res = LabelPropagation.run(
          spark.createDataset(edges.map { case (s, d) => Edge(s, d) }),
          spark.createDataset(seeds.toSeq.map { case (k, v) => Seed(k, v) }))
        val m = res.labels.collect().map(v => v.id -> v.label).toMap
        val out = (m, res.iterations, res.converged)
        res.release()
        out
      } finally sys.props.remove("graft.loop.legacyplan")
    }
    runWith(legacy = false) shouldBe runWith(legacy = true)
  }

  test("all three state-leaf modes produce identical labels") {
    // graft.state.leaf selects how the loop materializes + re-roots its
    // per-superstep state: "ckpt" (default, r5 — copy + localCheckpoint
    // fused into the one materializing job, flat LogicalRDD leaf), "imr"
    // (r4 — columnar InMemoryRelation leaf + periodic Dataset
    // .localCheckpoint job), "rdd" (flat view with per-scan defensive
    // copy). A materialization detail only: labels, iteration count and
    // convergence must be identical. The tie-heavy fixture keeps the
    // argmax tie-break on the critical path in every mode.
    val (edges, seeds) = tieHeavy
    def runWith(mode: String) = {
      sys.props("graft.state.leaf") = mode
      try {
        val res = LabelPropagation.run(
          spark.createDataset(edges.map { case (s, d) => Edge(s, d) }),
          spark.createDataset(seeds.toSeq.map { case (k, v) => Seed(k, v) }))
        val m = res.labels.collect().map(v => v.id -> v.label).toMap
        val out = (m, res.iterations, res.converged)
        res.release()
        out
      } finally sys.props.remove("graft.state.leaf")
    }
    val ckpt = runWith("ckpt")
    runWith("imr") shouldBe ckpt
    runWith("rdd") shouldBe ckpt
  }
}
