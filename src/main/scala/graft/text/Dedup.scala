package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SimHash64Expr

/** Deduplication operators for training-data pipelines over
  * `documents(doc_id, text, ...)`:
  *
  *  - exact: hash-groupBy on md5(text) — one shuffle, keeps min doc_id
  *  - MinHash + LSH: shingle → k-perm minhash signature → banded bucket
  *    join → exact-Jaccard verification of candidates only
  *  - SimHash: 64-bit signature + Hamming-radius candidate pairing
  *  - n-gram Jaccard: exact similarity for a candidate pair set
  *
  * Scale shape: signatures are computed in a single codegen'd projection
  * (no UDFs except the native SimHash expression); candidate generation is
  * an equi-join on (band, bucket) keys, so the only quadratic work is within
  * a bucket — the standard LSH guarantee. All hashes are xxhash64-based and
  * deterministic across parallelism.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct text with its kept id
    * (min doc_id) and multiplicity.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))

  /** Documents surviving exact dedup (min doc_id per identical text). */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.withColumn("_h", md5(col("text").cast("binary")))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_h")).orderBy(col("doc_id"))))
      .filter(col("_rk") === 1).drop("_h", "_rk")

  /** Word-level w-shingles of the lower-cased token stream. */
  def shinglesCol(text: Column, w: Int = 3): Column = {
    val toks = TextAnalysis.tokensCol(text)
    when(size(toks) >= w,
      array_distinct(transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w))))))
      .otherwise(when(size(toks) > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>")))
  }

  /** Candidate near-duplicate pairs via banded LSH over minhash signatures:
    * b bands of r rows (k = b·r); docs sharing any band bucket become a
    * candidate pair, then exact shingle Jaccard ≥ `threshold` confirms.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    */
  /** Per-document minhash profile, computed fully relationally: tokens
    * exploded to rows, w-shingles formed with window leads, each shingle
    * hashed with the native multi-argument xxhash64, and ONE codegen'd
    * aggregation producing the k permutation minima (`min(xxhash64(sh, j))`
    * per permutation j) plus the distinct shingle-hash set for
    * exact-Jaccard verification.
    *
    * Why not `transform`/`array_min` over a shingle array: Spark evaluates
    * higher-order functions interpreted (no codegen), and the k×|shingles|
    * lambda evaluations per document measured ~100× slower than this
    * exploded shape at 5K docs. Column pruning drops the unused aggregate
    * expressions per consumer (the band explode reads only the minima, the
    * verification join reads only `hset`).
    *
    * Output: (doc_id, hset: array<long>, s0..s{k-1}: long). Documents with
    * fewer than w tokens contribute one whole-text shingle; empty documents
    * are absent.
    */
  def minhashProfiles(docs: DataFrame, w: Int = 3, k: Int = 64): DataFrame = {
    require(w >= 2, "shingle width must be >= 2")
    val toks = docs.select(col("doc_id"), TextAnalysis.tokensCol(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val tokRows = toks.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val leads = (1 until w).map(i => lead(col("tok"), i).over(wspec).as(s"_t$i"))
    val shingled = tokRows.select(col("doc_id") +: col("tok") +: leads: _*)
      .filter(col(s"_t${w - 1}").isNotNull)
      .select(col("doc_id"),
        xxhash64(col("tok") +: (1 until w).map(i => col(s"_t$i")): _*).as("sh"))
    // reference shingle rule: 0 < tokens < w → one whole-text shingle
    val shorts = toks.filter(size(col("toks")) < w)
      .select(col("doc_id"), xxhash64(concat_ws(" ", col("toks"))).as("sh"))
    val aggs = collect_set(col("sh")).as("hset") +:
      (0 until k).map(j => min(xxhash64(col("sh"), lit(j))).as(s"s$j"))
    shingled.union(shorts).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band buckets from a minhash profile: one native hash per band
    * over its r signature columns → (doc_id, band, bucket).
    */
  def bandBuckets(profiles: DataFrame, bands: Int, rows: Int): DataFrame = {
    val buckets = (0 until bands).map(b =>
      xxhash64((b * rows until (b + 1) * rows).map(j => col(s"s$j")) :+ lit(b): _*))
    profiles.select(col("doc_id"),
      posexplode(array(buckets: _*)).as(Seq("band", "bucket")))
  }

  def minhashNearDups(
      docs: DataFrame,
      w: Int = 3,
      bands: Int = 16,
      rows: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val k = bands * rows
    val profiles = minhashProfiles(docs, w, k)
    // shingle sets are NEVER shuffled through the banded explode: the band
    // join carries only (band, bucket, doc_id) — 16 longs per doc, not
    // bands× the corpus bytes
    val banded = bandBuckets(profiles, bands, rows)
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    // exact-Jaccard verification on the compact shingle-HASH sets,
    // re-attached once per side for candidate pairs only
    val sets = profiles.select(col("doc_id"), col("hset"))
    val withSets = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("hset").as("hs_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("hset").as("hs_b")), Seq("doc_b"))
    val inter = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
    val union = size(array_union(col("hs_a"), col("hs_b"))).cast("double")
    withSets
      .withColumn("jaccard", round(when(union > 0, inter / union).otherwise(0.0), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact Jaccard over shingle arrays already attached as sh_a / sh_b. */
  private def withJaccard(pairs: DataFrame): DataFrame = {
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    pairs.withColumn("jaccard",
      round(when(union > 0, inter / union).otherwise(0.0), 6))
  }

  /** Exact embedding-cosine near-duplicate pairs: every (id_a < id_b) pair
    * with cosine(vec_a, vec_b) ≥ threshold, cosine reported rounded to 2
    * decimals. All-pairs — the exact/oracle path for corpora where n² is
    * feasible; at corpus scale use [[embeddingNearDupsLsh]]. Input shape:
    * (id, vec: array<float>). Dot products via the native codegen'd
    * [[graft.functions.DotProductExpr]].
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    import graft.sim.Knn
    val a = emb.select(col("id").as("id_a"), col("vec").as("va"))
      .withColumn("na", Knn.normCol(col("va")))
    val b = emb.select(col("id").as("id_b"), col("vec").as("vb"))
      .withColumn("nb", Knn.normCol(col("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("_c", Knn.cosineCol(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("_c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("_c"), 2).as("cos"))
  }

  /** Scalable embedding-cosine near-dup: sign-bucket LSH candidate
    * generation (every vector hashed into `tables` independent
    * hyperplane-sign buckets — an equi-join on (table, bucket), never a
    * cross join) followed by the exact cosine filter. Approximate: a pair
    * colliding in no table is missed; recall grows with `tables`
    * (tested vs the exact variant in PipelineOpsSpec).
    */
  def embeddingNearDupsLsh(emb: DataFrame, dim: Int, threshold: Double = 0.4,
                           bits: Int = 6, tables: Int = 12): DataFrame = {
    import graft.sim.Knn
    // candidate generation carries (table, bucket, id) ONLY — the minhash
    // recipe: vectors must not ride the tables× bucket explode, and the
    // pair-distinct must run over ids, not float arrays (at dim-768 corpus
    // scale the old shape pushed tables× corpus bytes through the shuffle
    // and deduped on array equality)
    val bucketed = emb.select(col("id"),
      posexplode(array((0 until tables).map(t =>
        Knn.bucketCol(col("vec"), dim, bits, t)): _*)).as(Seq("table", "bucket")))
    val a = bucketed.select(col("table"), col("bucket"), col("id").as("id_a"))
    val b = bucketed.select(col("table"), col("bucket"), col("id").as("id_b"))
    val cand = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // vectors re-attached once per side, for surviving candidates only
    val vecs = emb.select(col("id"), col("vec"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
      .withColumn("_c", Knn.cosineCol(col("va"), col("vb"),
        Knn.normCol(col("va")), Knn.normCol(col("vb"))))
      .filter(col("_c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("_c"), 2).as("cos"))
  }

  /** Exact n-gram Jaccard similarity for an explicit pair list
    * `(doc_a, doc_b)` against the documents table.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, w: Int = 3): DataFrame = {
    val sh = docs.select(col("doc_id"), shinglesCol(col("text"), w).as("sh"))
    val withA = pairs.join(sh.withColumnRenamed("doc_id", "doc_a")
      .withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
    val withB = withA.join(sh.withColumnRenamed("doc_id", "doc_b")
      .withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
    withJaccard(withB).select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash signatures per document. Token hashing happens inside
    * the native [[graft.functions.SimHashTokens64Expr]] loop — the r3
    * `transform(tokens, xxhash64)` step evaluated one interpreted lambda
    * frame per token per document. Honest measurement (BENCH.md §6): this
    * path's wall time is dominated by the regexp tokenization, so the
    * reshape is ~1.0× here at 5M docs — it removes the last interpreted
    * lambda from the corpus scan (shape hygiene), unlike the 3× win on the
    * triple-lambda analyze path.
    */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHashTokens64Expr
        .simhash64Tokens(TextAnalysis.tokensCol(col("text")))
        .as("simhash"))

  /** SimHash near-duplicate pairs within `maxHamming` bits, using the
    * standard block-permutation trick: split the 64-bit signature into
    * (maxHamming+1) blocks — two signatures within radius share at least
    * one exact block (pigeonhole), so candidates come from an equi-join on
    * (block index, block value), never a cross join.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    val sigs = simhashSignatures(docs)
    // block index baked in as a Scala literal (shift amounts must be
    // constants), block array exploded into (block, value) join keys
    val blocked = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until blocks).map(b =>
        blockCol(col("simhash"), b, width)): _*)))
      .withColumnRenamed("pos", "block")
      .withColumnRenamed("col", "bval")
    val a = blocked.select(col("block"), col("bval"),
      col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = blocked.select(col("block"), col("bval"),
      col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("block", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        SimHash64Expr.hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Extract block b (width w bits) of a signature without variable shifts
    * (Spark's shift functions take literal amounts only inside transform).
    */
  private def blockCol(sig: Column, b: Int, width: Int): Column =
    shiftrightunsigned(sig, b * width).bitwiseAND(lit((1L << width) - 1))
}
