package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass per-document token statistics as a single native codegen'd
  * expression over the token array:
  *
  *   struct(sum_len, bpe, fingerprint)
  *
  *  - `sum_len`      = Σ length(token)                (chars, for mean word length)
  *  - `bpe`          = Σ ceil(length(token) / 4)      (BPE-ish subword estimate)
  *  - `fingerprint`  = xxhash64 chained over the token sequence
  *                     (acc₀ = 0; accᵢ = xxhash64(accᵢ₋₁, tokᵢ)) — the
  *                     order-sensitive rolling document identity
  *
  * Replaces three `aggregate()` higher-order-function lambdas
  * (TextAnalysis r3): Spark evaluates HOF lambdas interpreted — one boxed
  * lambda frame per token per lambda — which measured ~100× slower than
  * relational/native shapes on the minhash path (Dedup.minhashProfiles) and
  * is the wrong shape for a 100 TB corpus scan. This expression is one
  * generated-code loop per document, stays inside whole-stage codegen, and
  * is bit-compatible with the HOF formulation (asserted in
  * TokenStatsSpec): per-token hashing uses the same `XXH64` kernel (seed 42)
  * as the builtin `xxhash64`, and `ceil(len/4.0)` over non-negative ints is
  * exactly `(len + 3) / 4`.
  *
  * A null element (impossible from `regexp_extract_all` tokenization, but
  * matched for exactness) contributes 0 to the sums and folds only the
  * accumulator re-seed into the chain — precisely what `xxhash64(acc, null)`
  * computes.
  */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenStatsExpr.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_stats requires ARRAY<STRING>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TokenStatsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStatsExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

object TokenStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("sum_len", LongType, nullable = false),
    StructField("bpe", LongType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))

  private val Seed = 42L // builtin xxhash64's seed

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    var sumLen = 0L
    var bpe = 0L
    var fp = 0L
    var i = 0
    while (i < n) {
      fp = XXH64.hashLong(fp, Seed) // xxhash64(acc, tok) re-seeds on acc first
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val len = t.numChars().toLong
        sumLen += len
        bpe += (len + 3L) / 4L
        fp = XXH64.hashUTF8String(t, fp)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sumLen, bpe, fp))
  }

  def stats(tokens: Column): Column =
    GraftSqlShim.column(TokenStatsExpr(GraftSqlShim.expression(tokens)))
}

/** 64-bit SimHash straight from the token STRING array: hashes each token
  * with the builtin-`xxhash64` kernel (seed 42) inside the same generated
  * loop that maintains the 64 bit-counters — replacing the
  * `transform(tokens, t => xxhash64(t))` interpreted-lambda step that r3
  * fed into [[SimHash64Expr]] (one lambda frame per token per document).
  * Bit-identical to `simhash64(transform(tokens, xxhash64))` — asserted in
  * TokenStatsSpec.
  */
case class SimHashTokens64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64_tokens requires ARRAY<STRING>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashTokens64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashTokens64Expr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashTokens64Expr =
    copy(child = newChild)
}

object SimHashTokens64Expr {
  private val Seed = 42L

  /** Hash each token (null token → 42, = `xxhash64(null)`), then the
    * [[SimHash64Expr.compute]] counter rule; empty array → 0.
    */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) =
        if (tokens.isNullAt(i)) Seed
        else XXH64.hashUTF8String(tokens.getUTF8String(i), Seed)
      i += 1
    }
    SimHash64Expr.compute(new GenericArrayData(hashes))
  }

  def simhash64Tokens(tokens: Column): Column =
    GraftSqlShim.column(SimHashTokens64Expr(GraftSqlShim.expression(tokens)))
}
