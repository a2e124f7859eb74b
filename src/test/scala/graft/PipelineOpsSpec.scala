package graft

import graft.text.{Dedup, TextAnalysis}
import graft.sim.Knn
import graft.mm.Multimodal
import graft.functions.SimHash64Expr
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: dedup (exact / minhash-LSH / simhash /
  * n-gram jaccard), text analysis, ANN search, multimodal plumbing.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "The quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "The quick brown fox jumps over the lazy dog near the wide river bank"), // near dup of 1
    (4L, "El rapido zorro marron salta sobre el perro perezoso en la ribera"),
    (5L, "Completely different content about databases and query engines"),
    (6L, "the and of to in is that it for was the and of to in is")
  ).toDF("doc_id", "text")

  test("exact dedup: min doc_id kept per identical text") {
    val groups = Dedup.exactGroups(docs).collect()
    groups.map(_.getLong(2)).sum shouldBe 6 // all docs accounted for
    val dupGroup = groups.find(_.getLong(2) == 2L).get
    dupGroup.getLong(1) shouldBe 1L // keeper = min(1,2)
    Dedup.exactDedup(docs).collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 3L, 4L, 5L, 6L)
  }

  test("minhash LSH finds the near-duplicate pair and skips unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, w = 3, bands = 16, rows = 4,
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L)) // identical
    pairs should contain((1L, 3L)) // near dup
    pairs should contain((2L, 3L))
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 5L
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 4L
  }

  test("minhash id-only band join: complete and exact vs local recomputation") {
    // locks the reshaped plan (band-join on doc ids, shingles re-attached
    // once) to the LSH contract: every pair sharing ≥1 band bucket with
    // true shingle-Jaccard ≥ t is returned, with the exact jaccard value
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val corpus = (0 until 40).map { i =>
      val base = (0 until 12).map(j => words((i / 4 + j) % words.length))
      // every 4 docs share a template; odd docs mutate one word
      val toks = if (i % 2 == 1) base.updated(5, "mutated" + i) else base
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")

    val (bands, rows) = (16, 4)
    val profiles = Dedup.minhashProfiles(corpus, 3, bands * rows)
    val hashSets: Map[Long, Set[Long]] = profiles.select($"doc_id", $"hset")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    def jac(a: Long, b: Long): Double = {
      val (sa, sb) = (hashSets(a), hashSets(b))
      val u = sa.union(sb).size
      if (u == 0) 0.0
      else BigDecimal(sa.intersect(sb).size.toDouble / u)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // band buckets recomputed with the same public building block
    val banded = Dedup.bandBuckets(profiles, bands, rows)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val collide = banded.toSeq.groupBy(x => (x._2, x._3)).values
      .flatMap { g =>
        val ids = g.map(_._1).distinct.sorted
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
    val expected = collide.filter { case (a, b) => jac(a, b) >= 0.5 }

    val got = Dedup.minhashNearDups(corpus, w = 3, bands = bands, rows = rows,
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.keySet shouldBe expected
    got.foreach { case ((a, b), j) => j shouldBe jac(a, b) }
  }

  test("simhash: identical texts collide, near-dups within small hamming") {
    val sigs = Dedup.simhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sigs(1L) shouldBe sigs(2L)
    java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) should be <= 12
    java.lang.Long.bitCount(sigs(1L) ^ sigs(5L)) should be > 12
    val nd = Dedup.simhashNearDups(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    nd should contain((1L, 2L))
  }

  test("ngram jaccard on explicit pairs") {
    val pairs = Seq((1L, 2L), (1L, 5L)).toDF("doc_a", "doc_b")
    val j = Dedup.ngramJaccard(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    j((1L, 2L)) shouldBe 1.0
    j((1L, 5L)) shouldBe 0.0
  }

  test("language id: stopword heuristic routes en/es, und for no hits") {
    val lid = docs.select($"doc_id", TextAnalysis.langIdCol($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    lid(1L) shouldBe "en"
    lid(4L) shouldBe "es"
    val none = Seq((9L, "zzz qqq xxx")).toDF("doc_id", "text")
      .select(TextAnalysis.langIdCol($"text")).head().getString(0)
    none shouldBe "und"
  }

  test("token counting: ws and bpe-ish counts") {
    val row = Seq((1L, "Hello wonderful world")).toDF("doc_id", "text")
      .select(
        TextAnalysis.wsTokenCountCol($"text").as("ws"),
        TextAnalysis.bpeTokenCountCol($"text").as("bpe")).head()
    row.getInt(0) shouldBe 3
    // ceil(5/4)+ceil(9/4)+ceil(5/4) = 2+3+2
    row.getLong(1) shouldBe 7L
    Seq((1L, "")).toDF("doc_id", "text")
      .select(TextAnalysis.bpeTokenCountCol($"text")).head().getLong(0) shouldBe 0L
  }

  test("quality scoring: clean prose beats stopword soup and empty text") {
    val q = TextAnalysis.analyze(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    q(1L) should be > q(6L) * 0.9
    val empty = TextAnalysis.analyze(Seq((9L, "")).toDF("doc_id", "text"))
      .head().getAs[Double]("quality")
    empty should be < 0.5
  }

  test("fingerprint: order-sensitive, deterministic across partitioning") {
    val f1 = docs.select($"doc_id", TextAnalysis.fingerprintCol($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    f1(1L) shouldBe f1(2L)
    f1(1L) should not be f1(3L)
    val reordered = Seq((1L, "dog lazy the over jumps fox brown quick The"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprintCol($"text")).head().getLong(0)
    reordered should not be f1(1L)
    val f2 = docs.repartition(7)
      .select($"doc_id", TextAnalysis.fingerprintCol($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    f2 shouldBe f1
  }

  private def syntheticVectors(n: Int, dim: Int) =
    (0 until n).map { i =>
      val v = Array.tabulate(dim)(j =>
        ((graft.functions.SplitMix64Expr.mix(i.toLong * dim + j) % 1000) / 1000.0f))
      (i.toLong, v)
    }

  test("brute-force cosine top-k matches a local computation exactly") {
    val dim = 16
    val data = syntheticVectors(60, dim)
    val corpus = data.toDF("id", "vec")
    val queries = data.take(3).toDF("id", "vec")
    val got = Knn.bruteTopK(corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    data.take(3).foreach { case (qid, qv) =>
      val expect = data.filter(_._1 != qid)
        .map { case (id, v) => (id, BigDecimal(cos(qv, v)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      (1 to 5).map(r => got((qid, r))) shouldBe expect
    }
  }

  test("LSH top-k achieves high recall vs brute force") {
    val dim = 16
    val data = syntheticVectors(120, dim)
    val corpus = data.toDF("id", "vec")
    val queries = data.take(5).toDF("id", "vec")
    val brute = Knn.bruteTopK(corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Knn.lshTopK(corpus, queries, dim, k = 5, bits = 6, tables = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    recall should be >= 0.6
  }

  test("embedding-cosine near-dups: exact == local all-pairs; LSH recalls") {
    val dim = 16
    val base = syntheticVectors(100, dim)
    // plant 15 strong near-dup pairs: id 1000+i = id i plus small noise
    val planted = base.take(15).map { case (i, v) =>
      (1000L + i, v.zipWithIndex.map { case (x, j) =>
        x + ((graft.functions.SplitMix64Expr.mix(i * 97 + j) % 100) / 2000.0f)
      })
    }
    val data = base ++ planted
    val emb = data.toDF("id", "vec")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
           math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val t = 0.9
    val expected = (for {
      (ia, va) <- data; (ib, vb) <- data if ia < ib && cos(va, vb) >= t
    } yield (ia, ib)).toSet
    expected.size should be >= 15 // the planted pairs at least
    val exact = text.Dedup.embeddingNearDups(emb, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    exact shouldBe expected
    val lsh = text.Dedup.embeddingNearDupsLsh(emb, dim, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh.subsetOf(exact) shouldBe true // no false positives (exact re-filter)
    (lsh.size.toDouble / expected.size) should be >= 0.8
  }

  test("id-only LSH candidate generation == the vector-riding shape, pair for pair") {
    // r3 reshape fixture: candidate generation now carries ids only (vectors
    // re-attached once); this replays the superseded shape — vectors riding
    // the tables× explode, distinct over (ids, float arrays) — and asserts
    // byte-identical output
    val dim = 16
    val base = syntheticVectors(90, dim)
    val planted = base.take(10).map { case (i, v) =>
      (1000L + i, v.zipWithIndex.map { case (x, j) =>
        x + ((graft.functions.SplitMix64Expr.mix(i * 53 + j) % 100) / 2000.0f)
      })
    }
    val emb = (base ++ planted).toDF("id", "vec")
    val (bits, tables, t) = (6, 12, 0.9)
    val bucketed = emb.select(col("id"), col("vec"),
      posexplode(array((0 until tables).map(tb =>
        Knn.bucketCol(col("vec"), dim, bits, tb)): _*)).as(Seq("table", "bucket")))
    val a = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("vec").as("va"))
    val b = bucketed.select(col("table"), col("bucket"),
      col("id").as("id_b"), col("vec").as("vb"))
    val oldShape = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"))
      .distinct()
      .withColumn("_c", Knn.cosineCol(col("va"), col("vb"),
        Knn.normCol(col("va")), Knn.normCol(col("vb"))))
      .filter(col("_c") >= t)
      .select(col("id_a"), col("id_b"), round(col("_c"), 2).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val newShape = text.Dedup.embeddingNearDupsLsh(emb, dim, t, bits, tables)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    newShape shouldBe oldShape
    newShape.size should be >= 10 // the planted near-dups collide somewhere
  }

  test("LSH recall is monotone in (tables up, bits down) across the parameter grid") {
    // Hyperplane (table, plane) pairs are seeded independently of the
    // `bits`/`tables` counts (Knn.bucketCol), so candidate sets NEST along
    // both axes: more tables append whole hash tables (superset), more bits
    // refine every bucket (subset). With an exact re-filter the output pair
    // set inherits the nesting — recall is provably non-decreasing in
    // `tables` and non-increasing in `bits`, the property a 100 TB operator
    // tunes against (measured curve: BENCH.md §7).
    val dim = 16
    val base = syntheticVectors(100, dim)
    val planted = base.take(15).map { case (i, v) =>
      (1000L + i, v.zipWithIndex.map { case (x, j) =>
        x + ((graft.functions.SplitMix64Expr.mix(i * 31 + j) % 100) / 2000.0f)
      })
    }
    val emb = (base ++ planted).toDF("id", "vec")
    val t = 0.9
    val exact = text.Dedup.embeddingNearDups(emb, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bitsGrid = Seq(4, 6, 8)
    val tablesGrid = Seq(3, 6, 12)
    val pairs: Map[(Int, Int), Set[(Long, Long)]] =
      (for (b <- bitsGrid; tb <- tablesGrid) yield {
        val got = text.Dedup.embeddingNearDupsLsh(emb, dim, t, b, tb).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        got.subsetOf(exact) shouldBe true // precision 1.0 by construction
        (b, tb) -> got
      }).toMap
    for (b <- bitsGrid; (t1, t2) <- tablesGrid.zip(tablesGrid.tail))
      pairs((b, t1)).subsetOf(pairs((b, t2))) shouldBe true // tables ↑ ⇒ recall ↑
    for (tb <- tablesGrid; (b1, b2) <- bitsGrid.zip(bitsGrid.tail))
      pairs((b2, tb)).subsetOf(pairs((b1, tb))) shouldBe true // bits ↑ ⇒ recall ↓
    // the generous corner recovers everything the strict corner does, plus
    // the planted structure at reasonable recall
    val generous = pairs((4, 12))
    (generous.size.toDouble / exact.size) should be >= 0.8
  }

  test("multimodal: feature extraction + frame sampling plumbing") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media).collect()
    feats.length shouldBe 30
    feats.foreach(_.feature.length shouldBe 8)
    // determinism across partitioning
    val feats2 = Multimodal.extractFeatures(media.repartition(7)).collect()
    feats2.map(f => f.media_id -> f.feature.toSeq).toMap shouldBe
      feats.map(f => f.media_id -> f.feature.toSeq).toMap
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    frames.foreach(_.frame_bytes.length shouldBe 8)
    val byId = frames.groupBy(_.media_id)
    byId.keySet shouldBe media.collect().filter(_.kind == "video").map(_.media_id).toSet
    val plan = Multimodal.resizePlan(media.toDF(), 32).collect()
    plan.foreach { r =>
      r.getAs[Int]("out_width") should be <= 32
      r.getAs[Int]("out_height") should be <= 32
    }
  }
}
