package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over an array of token hashes.
  *
  * For each bit b, counts tokens with bit b set vs unset; the signature's
  * bit b is 1 when set-count ≥ unset-count. Near-duplicate documents have
  * signatures within small Hamming distance (Charikar, STOC'02 — the
  * standard web-dedup technique).
  *
  * A native expression because the 64-counter inner loop is not expressible
  * as nested higher-order functions without ANSI-hostile arithmetic; codegen
  * calls the same static helper as eval, so the operator stays inside
  * whole-stage codegen.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires ARRAY<BIGINT>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64Expr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Shared by interpreted eval and generated code. Null array elements are
    * ignored; an empty array hashes to 0 (all counters tie at 0 → bit set
    * by the ≥ rule — normalized to 0 instead for the "no content" case).
    */
  def compute(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    if (n == 0) return 0L
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash64(tokenHashes: Column): Column =
    GraftSqlShim.column(SimHash64Expr(GraftSqlShim.expression(tokenHashes)))

  /** Hamming distance between two 64-bit signatures as a Column. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
