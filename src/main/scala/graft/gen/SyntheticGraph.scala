package graft.gen

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Deterministic synthetic graph generation, replicating the reference
  * topology (`setup_large_lp_data.py:18-71`) with a pure per-row hash instead
  * of a stateful RNG, so the same graph is produced at any parallelism —
  * the fixed input for the two-parallelism scaling benchmark.
  *
  * Random model: node i gets `density` out-edges; the j-th target is
  * `mix(seed, i, j)` mapped to [0, n-2] then bumped past i (no self-loops,
  * same `raw >= src → raw+1` rule as `setup_large_lp_data.py:34-37`).
  * Seeds: every 10th node labelled `(i % 4) * 100` ∈ {0,100,200,300}
  * (`setup_large_lp_data.py:40-42`). Ring model: i → (i+1..i+density) mod n.
  *
  * numpy-bitstream parity is not required (the reference ships no output
  * artifacts); determinism and topology class are.
  */
object SyntheticGraph {

  /** splitmix64 finalizer — the pure 64-bit mix used for edge targets. */
  def splitmix64(x0: Long): Long = graft.functions.SplitMix64Expr.mix(x0)

  /** Column form (native Catalyst expression with codegen — wrapping 64-bit
    * multiply is not expressible with `Column *` under ANSI mode). Identical
    * bit-for-bit to [[splitmix64]]; asserted in SyntheticGraphSpec.
    */
  def splitmix64Col(x0: Column): Column =
    graft.functions.SplitMix64Expr.splitmix64(x0)

  /** The j-th out-edge target of node i (pure function; n ≥ 2). */
  def target(seed: Long, density: Int, n: Long, i: Long, j: Long): Long = {
    val h = splitmix64(seed * 0x100000000L + i * density + j)
    val raw = java.lang.Math.floorMod(h, n - 1)
    if (raw >= i) raw + 1 else raw
  }

  /** Seed label for node i, or None (`setup_large_lp_data.py:40-42`). */
  def seedLabel(i: Long): Option[Long] =
    if (i % 10 == 0) Some((i % 4) * 100) else None

  /** Distributed random edge table: n·density rows of (src, dst), generated
    * from `spark.range` + pure hash columns — no RNG object, no shuffle,
    * reproducible per-row at any partitioning.
    */
  def randomEdges(spark: SparkSession, n: Long, density: Int = 10,
                  seed: Long = 42L): Dataset[Edge] = {
    import spark.implicits._
    require(n >= 2, "need at least 2 nodes")
    val src = ($"id" / density).cast("long")
    val j = $"id" % density
    val h = splitmix64Col(lit(seed * 0x100000000L) + src * density + j)
    val raw = pmod(h, lit(n - 1))
    val dst = when(raw >= src, raw + 1).otherwise(raw)
    spark.range(n * density)
      .select(src.as("src"), dst.as("dst"))
      .as[Edge]
  }

  /** Distributed seed table matching the reference rule. */
  def seeds(spark: SparkSession, n: Long): Dataset[Seed] = {
    import spark.implicits._
    spark.range(0, n, 10)
      .select($"id".as("node"), (($"id" % 4) * 100).as("label"))
      .as[Seed]
  }

  /** Ring edges: i → (i+offset) mod n for offset in 1..density
    * (`setup_large_lp_data.py:50-71`).
    */
  def ringEdges(spark: SparkSession, n: Long, density: Int = 10): Dataset[Edge] = {
    import spark.implicits._
    require(n >= 2)
    val src = ($"id" / density).cast("long")
    val offset = $"id" % density + 1
    spark.range(n * density)
      .select(src.as("src"), pmod(src + offset, lit(n)).as("dst"))
      .as[Edge]
  }

  /** 2D grid/lattice edges, exact reference semantics
    * (`lpst/src/graph_generator.rs:125-146`): side = ceil(sqrt(n)); node i
    * connects right (i, i+1) when not at the row end, and down (i, i+side)
    * when not in the last row. Fully deterministic, no RNG in the reference
    * either — bit-exact parity.
    */
  def gridEdges(spark: SparkSession, n: Long): Dataset[Edge] = {
    import spark.implicits._
    require(n >= 2)
    val side = math.ceil(math.sqrt(n.toDouble)).toLong
    val ids = spark.range(n)
    val right = ids
      .filter($"id" % side =!= (side - 1) && $"id" + 1 < n)
      .select($"id".as("src"), ($"id" + 1).as("dst"))
    val down = ids
      .filter(($"id" / side) < (n + side - 1) / side - 1 && $"id" + side < n)
      .select($"id".as("src"), ($"id" + side).as("dst"))
    right.union(down).as[Edge]
  }

  /** Watts–Strogatz small-world edges
    * (`lpst/src/graph_generator.rs:161-215`): a ring lattice where node i
    * connects to its k/2 clockwise neighbours, then each lattice edge is
    * rewired with probability `rewireProb` to a random target.
    *
    * Divergence (documented): the reference uses `thread_rng` (its output
    * is not reproducible even run-to-run) and a sequential duplicate-check
    * against the partially built edge set; this variant makes both choices
    * as pure per-edge hash functions (rewire coin and new target from
    * splitmix64 of (seed, u, v)) and dedups canonical pairs at the end —
    * same topology family and parameters, deterministic at any parallelism.
    */
  def smallWorldEdges(spark: SparkSession, n: Long, k: Int = 4,
                      rewireProb: Double = 0.1, seed: Long = 42L): Dataset[Edge] = {
    import spark.implicits._
    require(n >= k + 1 && k >= 2)
    val half = k / 2
    val u = ($"id" / half).cast("long")
    val j = $"id" % half + 1
    val v = pmod(u + j, lit(n))
    val lattice = spark.range(n * half).select(
      least(u, v).as("u"), greatest(u, v).as("v"))
    // chained mix over xors — no raw 64-bit multiply (ANSI-safe)
    val coin = uniform01Col(splitmix64Col(
      splitmix64Col(lit(seed).bitwiseXOR($"u")).bitwiseXOR($"v")))
    val newV = pmod(splitmix64Col(
      splitmix64Col(lit(seed + 1).bitwiseXOR($"u")).bitwiseXOR($"v")), lit(n))
    val rewired = lattice.select(
      $"u",
      when(coin < rewireProb && newV =!= $"u", newV).otherwise($"v").as("v2"))
    rewired.select(least($"u", $"v2").as("src"), greatest($"u", $"v2").as("dst"))
      .filter($"src" =!= $"dst")
      .distinct()
      .as[Edge]
  }

  /** Community-structured edges
    * (`lpst/src/graph_generator.rs:230-267`): dense intra-community,
    * sparse inter-community connectivity — the topology label propagation
    * is actually *for*.
    *
    * The reference enumerates all O(n²) pairs with per-pair Bernoulli
    * draws (fine at its ≤10⁴-node test sizes, impossible at web scale);
    * this variant samples the same expected degrees per node — each node
    * draws `round(intraProb·(communitySize−1)/2)` targets inside its
    * community and `round(interProb·(n−communitySize)/2)` outside, from
    * pure hashes — O(n·degree) rows, shuffle-free, deterministic.
    */
  def communityEdges(spark: SparkSession, n: Long, numCommunities: Int = 4,
                     intraProb: Double = 0.3, interProb: Double = 0.01,
                     seed: Long = 42L): Dataset[Edge] = {
    import spark.implicits._
    require(numCommunities >= 1 && n / numCommunities >= 2,
      "each community needs at least 2 nodes")
    val size = n / numCommunities // reference: nodes_per_community
    val dIntra = math.max(1L, math.round(intraProb * (size - 1).toDouble / 2))
    val dInter = math.round(interProb * (n - size).toDouble / 2)
    val intra = {
      val src = ($"id" / dIntra).cast("long")
      val j = $"id" % dIntra
      val comm = least((src / size).cast("long"), lit((numCommunities - 1).toLong))
      val base = comm * size
      val csize = when(comm === numCommunities - 1, lit(n) - base).otherwise(size)
      val h = splitmix64Col(lit(seed * 0x100000000L) + src * dIntra + j)
      val raw = base + pmod(h, csize - 1)
      val dst = when(raw >= src, raw + 1).otherwise(raw)
      spark.range(n * dIntra).select(src.as("src"), dst.as("dst"))
    }
    val inter = if (dInter <= 0) intra.limit(0) else {
      val src = ($"id" / dInter).cast("long")
      val j = $"id" % dInter
      val comm = least((src / size).cast("long"), lit((numCommunities - 1).toLong))
      val base = comm * size
      val csize = when(comm === numCommunities - 1, lit(n) - base).otherwise(size)
      val h = splitmix64Col(lit((seed + 7) * 0x100000000L) + src * dInter + j)
      val raw = pmod(h, lit(n) - csize)
      val dst = when(raw >= base, raw + csize).otherwise(raw)
      spark.range(n * dInter).select(src.as("src"), dst.as("dst"))
    }
    intra.union(inter)
      .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"))
      .filter($"src" =!= $"dst")
      .distinct()
      .as[Edge]
  }

  /** Uniform double in [0,1) from the top 53 bits of a mixed hash. */
  def uniform01Col(h: Column): Column =
    shiftrightunsigned(h, 11).cast("double") * lit(1.0 / (1L << 53).toDouble)

  /** Scalar mirror of [[uniform01Col]]. */
  def uniform01(h: Long): Double = (h >>> 11).toDouble * (1.0 / (1L << 53).toDouble)

  /** Serial mirror of [[gridEdges]]. */
  def gridEdgesLocal(n: Long): Seq[(Long, Long)] = {
    val side = math.ceil(math.sqrt(n.toDouble)).toLong
    (0L until n).flatMap { i =>
      val row = i / side
      val col = i % side
      val right = if (col < side - 1 && i + 1 < n) Seq((i, i + 1)) else Nil
      val down = if (row < (n + side - 1) / side - 1 && i + side < n) Seq((i, i + side)) else Nil
      right ++ down
    }
  }

  /** Serial mirror of [[smallWorldEdges]]. */
  def smallWorldEdgesLocal(n: Long, k: Int = 4, rewireProb: Double = 0.1,
                           seed: Long = 42L): Seq[(Long, Long)] = {
    val half = k / 2
    val lattice = for {
      i <- 0L until n
      j <- 1L to half.toLong
    } yield {
      val v = java.lang.Math.floorMod(i + j, n)
      (math.min(i, v), math.max(i, v))
    }
    lattice.map { case (u, v) =>
      val coin = uniform01(splitmix64(splitmix64(seed ^ u) ^ v))
      val nv = java.lang.Math.floorMod(
        splitmix64(splitmix64((seed + 1) ^ u) ^ v), n)
      val v2 = if (coin < rewireProb && nv != u) nv else v
      (math.min(u, v2), math.max(u, v2))
    }.filter { case (a, b) => a != b }.distinct
  }

  /** Serial mirror of [[communityEdges]]. */
  def communityEdgesLocal(n: Long, numCommunities: Int = 4,
                          intraProb: Double = 0.3, interProb: Double = 0.01,
                          seed: Long = 42L): Seq[(Long, Long)] = {
    val size = n / numCommunities
    val dIntra = math.max(1L, math.round(intraProb * (size - 1).toDouble / 2))
    val dInter = math.round(interProb * (n - size).toDouble / 2)
    def commOf(i: Long): Long = math.min(i / size, (numCommunities - 1).toLong)
    val intra = for {
      i <- 0L until n
      j <- 0L until dIntra
    } yield {
      val comm = commOf(i)
      val base = comm * size
      val csize = if (comm == numCommunities - 1) n - base else size
      val raw = base + java.lang.Math.floorMod(
        splitmix64(seed * 0x100000000L + i * dIntra + j), csize - 1)
      val dst = if (raw >= i) raw + 1 else raw
      (i, dst)
    }
    val inter = for {
      i <- 0L until n
      j <- 0L until dInter
    } yield {
      val comm = commOf(i)
      val base = comm * size
      val csize = if (comm == numCommunities - 1) n - base else size
      val raw = java.lang.Math.floorMod(
        splitmix64((seed + 7) * 0x100000000L + i * dInter + j), n - csize)
      val dst = if (raw >= base) raw + csize else raw
      (i, dst)
    }
    (intra ++ inter)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
      .distinct
  }

  /** Serial mirror of [[randomEdges]] for oracle-side graphs in tests. */
  def randomEdgesLocal(n: Long, density: Int = 10,
                       seed: Long = 42L): Seq[(Long, Long)] =
    for {
      i <- 0L until n
      j <- 0L until density.toLong
    } yield (i, target(seed, density, n, i, j))

  /** Serial mirror of the seed rule. */
  def seedsLocal(n: Long): Map[Long, Long] =
    (0L until n by 10).map(i => i -> (i % 4) * 100).toMap
}
