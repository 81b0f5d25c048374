package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** SimHash as a single imperative aggregate (SURVEY.md §2.4).
  *
  * The declarative formulation needs 64 separate sum(when(bit(j)…)) agg
  * columns — 64 buffer slots managed as separate expressions with boxed
  * updates. This TypedImperativeAggregate keeps one int[64] buffer and
  * updates all bit counters in a single pass per row: the (b) tier
  * (custom aggregate) from the design guide, used by Dedup.simhash.
  *
  * Input: a 64-bit token hash (e.g. xxhash64(token)). Output: the 64-bit
  * SimHash signature — bit j is set iff more input hashes had bit j set
  * than unset (ties → 0, matching `sum > 0` in the declarative form).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  def column(tokenHash: Column): Column =
    ExpressionUtils.column(
      SimHashAgg(ExpressionUtils.expression(tokenHash)).toAggregateExpression())
}
