package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gen.SyntheticGraph

/** Approximate-nearest-neighbour search over an embedding column
  * (`embeddings(vec_id, embedding: array<float>, label)`).
  *
  *  - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set,
  *    one codegen'd pass over the corpus, per-query windowed rank. The
  *    correctness baseline.
  *  - [[lshTopK]]: random-hyperplane LSH — deterministic splitmix64-derived
  *    ±1 hyperplanes hash every vector to a sign-bit bucket; candidates =
  *    bucket collisions across `tables` independent hash tables; exact
  *    cosine re-rank of candidates only. The scale path: corpus-side work is
  *    one projection + an equi-join on (table, bucket), so 10^12 vectors
  *    never see a cross join.
  *
  * Dot products use the native codegen'd [[graft.functions.DotProductExpr]]
  * — Spark's `zip_with`/`aggregate` higher-order functions evaluate
  * interpreted (one lambda frame per element), which dominates similarity
  * scans at embedding dimensionality.
  */
object Knn {

  /** Σ a·b as a Column over two array<float/double> columns (native expr). */
  def dotCol(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.dot(a, b)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na > 0 && nb > 0, dotCol(a, b) / (na * nb)).otherwise(0.0)

  /** Exact cosine top-k of `corpus` for each row of `queries` (both with
    * (id, vec) columns). Returns (query_id, neighbor_id, cosine, rank),
    * self-matches excluded. Ties broken by neighbor id for determinism.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
      .withColumn("cn", normCol(col("cv")))
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .withColumn("qn", normCol(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineCol(col("qv"), col("cv"), col("qn"), col("cn")), 9).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sign-bit bucket of `vec` under `bits` deterministic hyperplanes for
    * hash table `table`. Hyperplane component j of plane p in table t is
    * sign(splitmix64(seed, t, p, j)) ∈ {−1, +1}; the bucket is the integer
    * of sign bits of the projections.
    */
  def bucketCol(vec: Column, dim: Int, bits: Int, table: Int,
                seed: Long = 42L): Column = {
    val planeBits = (0 until bits).map { p =>
      val plane = typedLit(Array.tabulate(dim) { j =>
        val h = SyntheticGraph.splitmix64(
          seed + table.toLong * 1000003L + p.toLong * 7919L + j)
        if (h >= 0) 1.0 else -1.0
      })
      val proj = dotCol(vec, plane)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    planeBits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: `tables` independent sign-bucket hash
    * tables of `bits` hyperplanes each; exact cosine re-rank on candidates.
    * More tables → higher recall (tested ≥ threshold in KnnSpec).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int = 10,
              bits: Int = 8, tables: Int = 8): DataFrame = {
    def bucketed(df: DataFrame, idName: String) =
      df.select(col("id").as(idName),
        posexplode(array((0 until tables).map(t =>
          bucketCol(col("vec"), dim, bits, t)): _*)))
        .withColumnRenamed("pos", "table")
        .withColumnRenamed("col", "bucket")
    val c = bucketed(corpus, "neighbor_id")
    val q = bucketed(queries, "query_id")
    // id-only candidate generation (minhash recipe): corpus vectors must
    // not ride the tables× bucket explode, and the candidate distinct runs
    // over id pairs, not float arrays; vectors re-join once afterwards
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val withVecs = cand
      .join(corpus.select(col("id").as("neighbor_id"), col("vec").as("cv")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv"))),
        Seq("query_id"))
    val scored = withVecs.select(col("query_id"), col("neighbor_id"),
      round(cosineCol(col("qv"), col("cv"), normCol(col("qv")), normCol(col("cv"))), 9)
        .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
