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
      stats: List[Superstep.IterStats])

  def run(edges: Dataset[Edge], cfg: RunConfig = RunConfig(maxIter = Int.MaxValue)): CcResult = {
    val spark = edges.sparkSession
    import spark.implicits._

    // undirected doubling, deduped (duplicates are irrelevant for min),
    // partitioned by src once — every superstep's join reuses this exchange
    val und = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val vertices = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct()
    val init = vertices.select($"id", $"id".as("comp"))

    def step(state: DataFrame, iter: Int): DataFrame = {
      val frontier =
        (if (iter == 0) state else state.filter($"_chg")).select($"id", $"comp")
      val msgs = und.join(frontier, und("src") === frontier("id"))
        .groupBy(und("dst").as("id")).agg(min($"comp").as("m"))
      state.select($"id", $"comp").join(msgs, Seq("id"), "left_outer")
        .select(
          $"id",
          least($"comp", $"m").as("comp"),
          coalesce($"m" < $"comp", lit(false)).as("_chg"))
    }

    val res = Superstep.loopResumable(init, step,
      cfg.copy(convergenceThreshold = 0L), algo = "cc")
    val comps = res.state.select($"id", $"comp".as("component"))
      .as[VertexComponent].persist(StorageLevel.MEMORY_AND_DISK)
    val nComp = comps.agg(countDistinct($"component")).head().getLong(0)
    und.unpersist(blocking = false)
    CcResult(comps, res.iterations, nComp, res.stats)
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
