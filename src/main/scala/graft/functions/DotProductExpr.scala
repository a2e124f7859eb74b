package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two numeric array columns (float or double elements),
  * as a native codegen'd expression.
  *
  * A native expression rather than `aggregate(zip_with(...))` because
  * Spark evaluates higher-order functions interpreted (one lambda frame
  * per element) — on embedding-sized vectors that is the dominant cost of
  * every similarity scan. Codegen and interpreted eval share one static
  * helper, so the operator stays inside whole-stage codegen with a tight
  * primitive loop. Null elements contribute nothing; length mismatch
  * truncates to the shorter array.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product requires two ARRAY<FLOAT|DOUBLE> inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemFloat(left.dataType), elemFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.DotProductExpr.compute(" +
      s"$l, $r, ${elemFloat(left.dataType)}, ${elemFloat(right.dataType)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y
      }
      i += 1
    }
    s
  }

  def dot(a: Column, b: Column): Column =
    GraftSqlShim.column(DotProductExpr(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
