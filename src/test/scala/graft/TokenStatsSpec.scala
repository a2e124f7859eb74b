package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{SimHash64Expr, SimHashTokens64Expr, TokenStatsExpr}
import graft.text.TextAnalysis

/** Bit-compatibility of the native one-pass [[TokenStatsExpr]] /
  * [[SimHashTokens64Expr]] (round 4's codegen replacement for the corpus
  * scan path) against the r3 higher-order-function formulations they
  * replace. The HOF shapes are kept HERE, as the differential oracle: they
  * use only builtin expressions (`aggregate`, `transform`, `xxhash64`,
  * `ceil`), so equality pins the native expressions to Spark's own hash
  * kernel and arithmetic on every row.
  */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  // scalatest Matchers shadows functions.length
  private def sqlLen(c: Column): Column = org.apache.spark.sql.functions.length(c)

  /** r3 TextAnalysis.bpeTokenCountCol (interpreted HOF). */
  private def hofBpe(text: Column): Column =
    coalesce(aggregate(TextAnalysis.tokensCol(text), lit(0L),
      (acc, t) => acc + ceil(sqlLen(t) / lit(4.0)).cast("long")), lit(0L))

  /** r3 meanWordLen numerator (interpreted HOF). */
  private def hofSumLen(text: Column): Column =
    coalesce(aggregate(TextAnalysis.tokensCol(text), lit(0L),
      (a, t) => a + sqlLen(t)), lit(0L))

  /** r3 TextAnalysis.fingerprintCol (interpreted HOF). */
  private def hofFingerprint(text: Column): Column =
    coalesce(aggregate(TextAnalysis.tokensCol(text), lit(0L),
      (acc, t) => xxhash64(acc, t)), lit(0L))

  /** r3 Dedup.simhashSignatures hash step (interpreted lambda). */
  private def hofSimhash(text: Column): Column =
    SimHash64Expr.simhash64(
      transform(TextAnalysis.tokensCol(text), t => xxhash64(t)))

  private def mismatches(df: DataFrame): Long = {
    val st = TokenStatsExpr.stats(TextAnalysis.tokensCol(col("text")))
    df.select(
        coalesce(st.getField("bpe"), lit(0L)).as("bpe_n"),
        hofBpe(col("text")).as("bpe_h"),
        coalesce(st.getField("sum_len"), lit(0L)).as("sl_n"),
        hofSumLen(col("text")).as("sl_h"),
        coalesce(st.getField("fingerprint"), lit(0L)).as("fp_n"),
        hofFingerprint(col("text")).as("fp_h"),
        SimHashTokens64Expr.simhash64Tokens(
          TextAnalysis.tokensCol(col("text"))).as("sh_n"),
        hofSimhash(col("text")).as("sh_h"))
      .filter($"bpe_n" =!= $"bpe_h" || $"sl_n" =!= $"sl_h" ||
        $"fp_n" =!= $"fp_h" ||
        coalesce($"sh_n", lit(0L)) =!= coalesce($"sh_h", lit(0L)))
      .count()
  }

  test("native token stats match the HOF oracle on the documents table") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    mismatches(docs) shouldBe 0L
  }

  test("native token stats match the HOF oracle on adversarial rows") {
    // empty, whitespace-only, unicode (multi-byte chars: numChars ≠ numBytes),
    // single char, a token of every length mod 4, punctuation-only, long runs
    val rows = Seq(
      "",
      "   \t\n  ",
      "héllo wörld ünïcödé ññ 北京 東京 interpunção",
      "a",
      "a bb ccc dddd eeeee ffffff ggggggg hhhhhhhh",
      "!!! ??? ...",
      ("tok " * 500).trim,
      "MixedCASE Tokens123 with4 56numbers seven8nine",
      "é́ combining", // combining accents
      "x" * 4096)
    val df = rows.toDF("text")
    mismatches(df) shouldBe 0L
    // null text: both shapes yield the coalesce default / null simhash
    val nulls = Seq[Option[String]](None).toDF("text")
    mismatches(nulls) shouldBe 0L
  }

  test("struct fields agree with the analyze() output columns") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val out = TextAnalysis.analyze(docs)
    val expected = docs.select(
      col("doc_id"),
      hofBpe(col("text")).as("e_bpe"),
      hofFingerprint(col("text")).as("e_fp"))
    val joined = out.join(expected, "doc_id")
      .filter(col("n_bpe_tokens") =!= col("e_bpe") ||
        col("fingerprint") =!= col("e_fp"))
    joined.count() shouldBe 0L
  }
}
