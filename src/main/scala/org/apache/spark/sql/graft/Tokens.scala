package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-space tokenization with empties dropped, in one codegen'd pass.
  *
  * The declarative form `filter(split(text, " "), t -> length(t) > 0)` is a
  * higher-order function, which Spark evaluates INTERPRETED (CodegenFallback)
  * with a per-element lambda round-trip — the WordShingles situation, but on
  * the tokenizer EVERY text operator goes through (~35 call sites: tf-idf,
  * surprisal, Gopher, vocab, LM score, packing, …). This expression emits the
  * identical array in one imperative byte scan and keeps the enclosing stage
  * in whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the declarative chain (parity-spec'd):
  * `split(text, " ")` cuts at every single 0x20 byte — a space byte cannot
  * occur inside a multi-byte UTF-8 sequence (continuation bytes are ≥ 0x80),
  * so the byte scan cuts exactly where the regex did — and the filter drops
  * every empty segment (leading/trailing/consecutive spaces), making the
  * regex's trailing-empty behavior irrelevant. Null text stays null. */
case class Tokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens"

  override def nullSafeEval(input: Any): Any =
    Tokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Tokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {
  def compute(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val out = new java.util.ArrayList[Any]()
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        if (i > start)
          out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, i)))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def column(text: Column): Column =
    ExpressionUtils.column(Tokens(ExpressionUtils.expression(text)))
}
