package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{SimHash64Expr, SimHashTokens64Expr, TokenStatsExpr}
import graft.text.TextAnalysis

/** Interleaved same-JVM timing: the r3 interpreted higher-order-function
  * corpus-scan shapes vs the r4 native codegen expressions
  * ([[TokenStatsExpr]] / [[SimHashTokens64Expr]]), on a 50K-document corpus
  * (sf0.1's 500 docs replicated 100× with a distinct suffix token). Both
  * variants run inside one warmed JVM, alternating, min-of-reps — the only
  * timing protocol the ±25%/hour host drift allows (BENCH.md §0).
  *
  * Usage: sbt 'runMain graft.tools.TextShapeProbe' [SPARK_GRAFT_PROBE_REPS=3]
  */
object TextShapeProbe {

  private def hofAnalyze(docs: DataFrame): DataFrame = {
    // the r3 shapes verbatim (TextAnalysis.scala@r3:33,78,108)
    val toks = TextAnalysis.tokensCol(col("text"))
    val bpe = coalesce(aggregate(toks, lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long")), lit(0L))
    val sumLen = coalesce(aggregate(toks, lit(0L),
      (a, t) => a + length(t)), lit(0L))
    val fp = coalesce(aggregate(toks, lit(0L),
      (acc, t) => xxhash64(acc, t)), lit(0L))
    docs.select(bpe.as("bpe"), sumLen.as("sum_len"), fp.as("fp"))
  }

  private def nativeAnalyze(docs: DataFrame): DataFrame = {
    val st = TokenStatsExpr.stats(TextAnalysis.tokensCol(col("text")))
    docs.select(
      coalesce(st.getField("bpe"), lit(0L)).as("bpe"),
      coalesce(st.getField("sum_len"), lit(0L)).as("sum_len"),
      coalesce(st.getField("fingerprint"), lit(0L)).as("fp"))
  }

  private def hofSimhash(docs: DataFrame): DataFrame =
    docs.select(SimHash64Expr.simhash64(
      transform(TextAnalysis.tokensCol(col("text")), t => xxhash64(t))).as("s"))

  private def nativeSimhash(docs: DataFrame): DataFrame =
    docs.select(SimHashTokens64Expr.simhash64Tokens(
      TextAnalysis.tokensCol(col("text"))).as("s"))

  private def force(df: DataFrame): Long =
    df.select(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L)).as("h"))
      .agg(sum("h")).head().getLong(0) // mod keeps the ANSI sum overflow-free

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val copies = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "100").toInt
    val spark = graft.Bench.session(32, "text-shape-probe")
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select($"text")
    val docs = base.crossJoin(spark.range(copies.toLong).select($"id".as("rep")))
      .select(concat($"text", lit(" rep"), $"rep").as("text"))
      .repartition(32).persist()
    val n = docs.count()
    println(s"[probe] docs=$n (sf0.1 x $copies)")

    val variants: Seq[(String, () => Long)] = Seq(
      "analyze_hof" -> (() => force(hofAnalyze(docs))),
      "analyze_native" -> (() => force(nativeAnalyze(docs))),
      "simhash_hof" -> (() => force(hofSimhash(docs))),
      "simhash_native" -> (() => force(nativeSimhash(docs))))

    // warm both paths once, then interleave reps
    variants.foreach { case (_, f) => f() }
    val best = scala.collection.mutable.Map.empty[String, Double]
    val sums = scala.collection.mutable.Map.empty[String, Long]
    for (r <- 1 to reps; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val s = f()
      val sec = (System.nanoTime() - t0) / 1e9
      sums.get(name).foreach(prev => require(prev == s, s"$name nondeterministic"))
      sums(name) = s
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
      println(f"[probe] rep$r $name $sec%.2fs")
    }
    require(sums("analyze_hof") == sums("analyze_native"),
      "native analyze shape diverges from the HOF oracle")
    require(sums("simhash_hof") == sums("simhash_native"),
      "native simhash shape diverges from the HOF oracle")
    println(f"[probe] BEST analyze: hof=${best("analyze_hof")}%.2fs " +
      f"native=${best("analyze_native")}%.2fs " +
      f"speedup=${best("analyze_hof") / best("analyze_native")}%.1fx")
    println(f"[probe] BEST simhash: hof=${best("simhash_hof")}%.2fs " +
      f"native=${best("simhash_native")}%.2fs " +
      f"speedup=${best("simhash_hof") / best("simhash_native")}%.1fx")
    spark.stop()
  }
}
