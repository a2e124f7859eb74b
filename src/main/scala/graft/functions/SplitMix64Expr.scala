package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** splitmix64 finalizer as a native Catalyst expression.
  *
  * Needed because the generator's hash (SyntheticGraph) requires *wrapping*
  * 64-bit multiplication, which `Column * Column` rejects under Spark 4's
  * default ANSI mode. A custom unary expression with `doGenCode` keeps the
  * hot path inside whole-stage codegen (plain Java long arithmetic wraps
  * exactly like the Rust/Scala reference implementation).
  */
case class SplitMix64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"splitmix64 requires BIGINT, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SplitMix64Expr.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SplitMix64Expr.mix($c);")

  override protected def withNewChildInternal(newChild: Expression): SplitMix64Expr =
    copy(child = newChild)
}

object SplitMix64Expr {
  /** The canonical splitmix64 mix (wrapping arithmetic). */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Column API wrapper. */
  def splitmix64(c: Column): Column =
    GraftSqlShim.column(SplitMix64Expr(GraftSqlShim.expression(c)))
}
