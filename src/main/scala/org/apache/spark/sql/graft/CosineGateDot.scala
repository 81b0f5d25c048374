package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Fused cosine-threshold gate for the brute ANN baseline: computes the
  * integer dot product of two quantized vectors ONCE and returns it iff
  * `dot > 0 ∧ 10⁶·dot² ≥ t2·na·nb` (NULL otherwise).
  *
  * Why fused: `FilterExec` codegen has no common-subexpression elimination —
  * a filter of the form `dot > 0 && prescreen(dot) && decimal(dot)` over a
  * projected `dot` column gets each conjunct's `dot` reference inlined
  * SEPARATELY by predicate pushdown, so the 64-term dot loop ran three times
  * per candidate row (measured: ~0.3 s per extra evaluation per million
  * rows at sf0.1). Fused, every REJECTED row — the overwhelming majority of
  * an all-pairs candidate stream — costs exactly one loop; an ADMITTED row
  * still pays a second evaluation in the projection above the pushed-down
  * filter (no cross-operator CSE either), which is fine because admissions
  * are the tiny filtered tail, not the stream.
  *
  * Exactness: admission is decided by a conservative double prescreen
  * (relative margin 10⁻⁶, nine orders of magnitude above the accumulated
  * double error) with a BigInt exact compare on near-boundary rows only —
  * bit-identical to the all-DECIMAL(38,0) formulation the DuckDB oracle
  * replays, at a few ns per row instead of ~1 µs. */
case class CosineGateDot(first: Expression, second: Expression,
    third: Expression, fourth: Expression, t2: Long)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_gate_dot"

  override def nullSafeEval(a: Any, b: Any, na: Any, nb: Any): Any = {
    val acc = LongArrayDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (CosineGateDot.admit(acc, na.asInstanceOf[Long], nb.asInstanceOf[Long], t2)) acc
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, na, nb) => {
      val acc = ctx.freshName("acc")
      val gate = classOf[CosineGateDot].getName
      val dotCls = classOf[LongArrayDot].getName
      // both the dot and the admission are static-forwarder calls (JIT
      // inlines them): ONE definition of the loop shared with LongArrayDot,
      // so the fused gate cannot drift from the plain dot the oracles mirror
      s"""
         |final long $acc = $dotCls.dot($a, $b);
         |if ($gate.admit($acc, $na, $nb, ${t2}L)) {
         |  ${ev.value} = $acc;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): CosineGateDot =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object CosineGateDot {
  /** Exact `dot > 0 ∧ 10⁶·dot² ≥ t2·na·nb`: double fast path, BigInt
    * boundary fallback. Static forwarder — callable from generated code. */
  def admit(dot: Long, na: Long, nb: Long, t2: Long): Boolean = {
    if (dot <= 0L) return false
    val d = dot.toDouble
    val lhs = d * d * 1e6
    val rhs = t2.toDouble * na.toDouble * nb.toDouble
    if (lhs >= rhs * (1.0 + 1e-6)) return true
    if (lhs < rhs * (1.0 - 1e-6)) return false
    (BigInt(dot) * BigInt(dot) * BigInt(1000000L)) >= (BigInt(t2) * BigInt(na) * BigInt(nb))
  }

  def column(a: Column, b: Column, na: Column, nb: Column, t2: Long): Column =
    ExpressionUtils.column(CosineGateDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(na), ExpressionUtils.expression(nb), t2))
}
