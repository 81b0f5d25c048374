package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit average-hash of a text's code-point "pixels" in ONE pass.
  *
  * The declarative form (split('') → posexplode → ascii → two doc-keyed
  * aggregations → bit pack) materializes one ROW PER CHARACTER — the
  * dominant cost of q_dedup_phash at sf0.1 (18 s of task time for ~10⁸
  * generator rows). This expression computes the identical signature per
  * document in one imperative scan; `doGenCode` emits a single static call
  * so the enclosing stage stays in whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the declarative chain (parity-spec'd on
  * multibyte/surrogate/empty adversaries): Spark's `split(t, "")` advances
  * by CODE POINT (surrogate pairs stay whole) and `ascii()` of a
  * single-code-point string returns that code point (measured on Spark
  * 4.1), so pixel v = codePointAt; stripe j = position mod 64; bit j set
  * iff s_j·N > S·n_j (the integer cross-multiplied mean test;
  * multiplyExact raises on overflow exactly like the replaced column
  * multiply under Spark 4's default ANSI mode — reachable only past ~16M
  * code points per document, where the chain errored too); bit 63 adds
  * Long.MinValue (the SimHash packing convention). Stripes with no pixels
  * contribute no bit, exactly like their absent rows in the aggregation
  * form. Callers filter empty/null texts FIRST — the chain's
  * `when(length >= 1, split)` guard made such docs vanish from the
  * output, so the projection form must drop them too, not hash them. */
case class AHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "ahash64"

  override def nullSafeEval(input: Any): Any =
    AHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.AHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

object AHash64 {
  def compute(text: UTF8String): Long = {
    val t = text.toString
    val s = new Array[Long](64)
    val n = new Array[Long](64)
    var i = 0
    var pos = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      i += Character.charCount(cp)
      val j = pos % 64
      s(j) += cp
      n(j) += 1L
      pos += 1
    }
    var st = 0L
    var nt = 0L
    var j = 0
    while (j < 64) { st += s(j); nt += n(j); j += 1 }
    var h = 0L
    j = 0
    while (j < 64) {
      if (n(j) > 0L && Math.multiplyExact(s(j), nt) > Math.multiplyExact(st, n(j)))
        h += (if (j == 63) Long.MinValue else 1L << j)
      j += 1
    }
    h
  }

  def column(text: Column): Column =
    ExpressionUtils.column(AHash64(ExpressionUtils.expression(text)))
}
