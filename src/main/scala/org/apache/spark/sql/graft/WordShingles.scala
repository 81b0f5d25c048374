package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-k-gram shingles of a text column in one pass.
  *
  * The declarative form (split → filter → transform(sequence) → concat_ws →
  * array_distinct) is built from higher-order functions, which Spark
  * evaluates INTERPRETED (they are CodegenFallback) with per-element boxing —
  * profiled at ~8 s for 5000 docs. This expression does the same work in one
  * imperative pass; `doGenCode` emits a single static call so the enclosing
  * stage stays in whole-stage codegen.
  *
  * Semantics match the SQL-oracle definition exactly: single-space split,
  * empties dropped, k consecutive tokens joined with ' ', distinct
  * (first-occurrence order — order is irrelevant downstream: Jaccard
  * sorts, MinHash takes minima).
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(' ').filter(_.nonEmpty)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }

  def column(text: Column, k: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), k))
}
