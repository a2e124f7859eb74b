package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import java.nio.ByteBuffer
import scala.collection.mutable

/** Weighted majority vote with smallest-label tie-break as a single
  * aggregate: `majority_vote(label, w)` groups each vertex's neighbour
  * labels ONCE instead of the two-level `groupBy(src,label) →
  * groupBy(src)` plan — one exchange per LP superstep instead of two,
  * with partial aggregation (per-partition label→count maps merge
  * associatively, so hub salting still applies).
  *
  * Semantics mirror the reference kernel exactly
  * (`ow-lp/src/lib.rs:456-481`, `lpst/src/lib.rs:133-155`): largest count
  * wins, ties by smallest label; the empty group never arises (the gather
  * join is inner). Null labels are ignored.
  */
case class MajorityVoteAgg(
    labelExpr: Expression,
    weightExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(labelExpr, weightExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val l = labelExpr.eval(input)
    if (l != null) {
      val w = weightExpr.eval(input)
      val wv = if (w == null) 1L else w.asInstanceOf[Long]
      val lv = l.asInstanceOf[Long]
      buf.update(lv, buf.getOrElse(lv, 0L) + wv)
    }
    buf
  }

  override def merge(a: mutable.LongMap[Long], b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreach { case (l, c) => a.update(l, a.getOrElse(l, 0L) + c) }
    a
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    var bestLabel = 0L
    var bestCount = -1L
    buf.foreach { case (l, c) =>
      if (c > bestCount || (c == bestCount && l < bestLabel)) {
        bestLabel = l; bestCount = c
      }
    }
    bestLabel
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (l, c) => bb.putLong(l); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): MajorityVoteAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MajorityVoteAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MajorityVoteAgg =
    copy(labelExpr = newChildren(0), weightExpr = newChildren(1))
}

object MajorityVoteAgg {
  /** Column API: majority label of `label` weighted by `w`. */
  def majorityVote(label: Column, w: Column): Column =
    GraftSqlShim.column(
      MajorityVoteAgg(GraftSqlShim.expression(label), GraftSqlShim.expression(w))
        .toAggregateExpression())
}
