package graft.tools

import org.apache.spark.sql.functions._
import graft.sim.Knn
import graft.text.Dedup

/** Recall-vs-parameters evidence for the two sign-hyperplane LSH operators
  * (VERDICT r3 task 6): at one (bits, tables) point recall is only an
  * assertion; a 100 TB operator needs the measured CURVE to know which knob
  * buys recall and what it costs. Sweeps a 3×3 (bits × tables) grid at
  * sf0.1 against the exact results:
  *
  *  - near-dup recall = |LSH pairs ∩ exact pairs| / |exact pairs| at
  *    cosine ≥ 0.4 (precision is 1.0 by construction — candidates pass the
  *    same exact-cosine filter, so LSH output ⊆ exact output);
  *  - knn recall@10 = fraction of the exact brute-force top-10 edges
  *    recovered, over 50 query vectors;
  *  - candidates = distinct id pairs surviving the bucket join — the cost
  *    the knob buys recall with (each candidate is one exact-cosine
  *    evaluation + one vectors re-join row).
  *
  * Usage: sbt 'runMain graft.tools.LshRecallProbe' [SPARK_GRAFT_SF_DIR]
  * Prints one markdown table per operator; BENCH.md §7 records the results.
  */
object LshRecallProbe {

  private def pairKey(a: String, b: String) =
    concat_ws(":", col(a).cast("string"), col(b).cast("string"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "lsh-recall-probe")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec")).cache()
    val dim = emb.select(size($"vec")).head().getInt(0)
    val n = emb.count()

    // ground truths (exact)
    val exactPairs = Dedup.embeddingNearDups(emb, threshold = 0.4)
      .select(pairKey("id_a", "id_b").as("p")).cache()
    val nExact = exactPairs.count()
    val queries = emb.filter($"id" < 50).cache()
    val exactKnn = Knn.bruteTopK(emb, queries, k = 10)
      .select(pairKey("query_id", "neighbor_id").as("p")).cache()
    val nKnn = exactKnn.count()
    println(s"[recall] n=$n dim=$dim exact_pairs=$nExact knn_truth_edges=$nKnn")

    val bitsGrid = Seq(4, 6, 8)
    val tablesGrid = Seq(6, 12, 24)

    def candidateCount(aCol: String, bCol: String,
                       bits: Int, tables: Int, broadcastB: Boolean): Long = {
      val bucketed = (idName: String) => emb.select(col("id").as(idName),
        posexplode(array((0 until tables).map(t =>
          Knn.bucketCol(col("vec"), dim, bits, t)): _*)).as(Seq("table", "bucket")))
      val a = bucketed(aCol)
      val b0 = bucketed(bCol)
      val b = if (broadcastB)
        broadcast(b0.join(queries.select(col("id").as(bCol)), Seq(bCol))) else b0
      a.join(b, Seq("table", "bucket"))
        .filter(if (broadcastB) col(aCol) =!= col(bCol) else col(bCol) < col(aCol))
        .select(col(aCol), col(bCol)).distinct().count()
    }

    println("\n[recall] embedding near-dup (cosine >= 0.4), exact pairs = " + nExact)
    println("| bits | tables | recall | candidate pairs | sec |")
    println("|---|---|---|---|---|")
    for (bits <- bitsGrid; tables <- tablesGrid) {
      val t0 = System.nanoTime()
      val got = Dedup.embeddingNearDupsLsh(emb, dim, 0.4, bits, tables)
        .select(pairKey("id_a", "id_b").as("p"))
      val hit = got.join(exactPairs, "p").count()
      val sec = (System.nanoTime() - t0) / 1e9
      val cand = candidateCount("id_a", "id_b", bits, tables, broadcastB = false)
      println(f"| $bits | $tables | ${hit.toDouble / math.max(1, nExact)}%.3f | $cand | $sec%.2f |")
    }

    println("\n[recall] knn top-10 over 50 queries, truth edges = " + nKnn)
    println("| bits | tables | recall@10 | candidate pairs | sec |")
    println("|---|---|---|---|---|")
    for (bits <- bitsGrid; tables <- tablesGrid) {
      val t0 = System.nanoTime()
      val got = Knn.lshTopK(emb, queries, dim, k = 10, bits = bits, tables = tables)
        .select(pairKey("query_id", "neighbor_id").as("p"))
      val hit = got.join(exactKnn, "p").count()
      val sec = (System.nanoTime() - t0) / 1e9
      val cand = candidateCount("neighbor_id", "query_id", bits, tables, broadcastB = true)
      println(f"| $bits | $tables | ${hit.toDouble / math.max(1, nKnn)}%.3f | $cand | $sec%.2f |")
    }
    spark.stop()
  }
}
