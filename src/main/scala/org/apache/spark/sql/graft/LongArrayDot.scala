package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression for the integer dot product of two
  * array<long> columns — the ANN hot path (SURVEY.md §2.4).
  *
  * Why an Expression instead of SQL functions: the higher-order
  * zip_with+aggregate form allocates an intermediate array per row, and a
  * fully expanded 64-term sum blows the JVM 64 KB method limit once filter
  * pushdown inlines it multiple times. `doGenCode` emits a tight primitive
  * loop (no allocation, no per-element null boxing) that stays inside
  * whole-stage codegen no matter how many times the optimizer inlines it.
  *
  * Lives under org.apache.spark.sql because AbstractDataType and
  * ExpressionUtils are private[sql] (the established pattern for libraries
  * extending Catalyst).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  // null ELEMENTS contribute nothing — the same result as the SQL-oracle
  // formulation (a NULL product vanishes inside sum()). The expression is
  // registered as a public SQL function (GraftExtensions), so arbitrary
  // arrays must not NPE; a raw getLong on a null slot NPEs on generic
  // arrays and silently reads 0 on unsafe ones — neither is acceptable
  // surface behavior. Internal ANN callers never produce null components.
  override def nullSafeEval(a: Any, b: Any): Any =
    LongArrayDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(LongArrayDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** THE dot-product semantics, in one place: null elements contribute
    * nothing (matching the SQL-oracle sum-of-products formulation). Static
    * forwarder — shared by this expression's interpreted eval, by
    * [[CosineGateDot]]'s eval AND generated code, so the two expressions
    * cannot silently diverge. The inlined loop in [[LongArrayDot.doGenCode]]
    * must mirror this body. */
  def dot(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }
}
