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
