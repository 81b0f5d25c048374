package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Random-hyperplane LSH signature over a quantized array<long> vector: all
  * `numBits` plane projections in ONE pass, sign bits packed into a long
  * (SURVEY.md §2.4 — the candidate-key derivation of the bucketed ANN path).
  *
  * The declarative form is numBits separate aggregate(zip_with(…))
  * expressions — CodegenFallback, boxed, numBits traversals per row. Plane
  * weights are the SAME deterministic pseudo-random ints as the declarative
  * formulation (MurmurHash3 of (plane, dim-index), mod 1001), embedded as a
  * reference object, so signatures are bit-identical (spec-pinned). */
case class HyperplaneSig(child: Expression, weights: Array[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  // null ELEMENTS contribute nothing (the projection of a missing component
  // is 0) — a raw getLong on a null slot NPEs on generic arrays and reads
  // an arbitrary 0 on unsafe ones; skipping keeps both paths identical.
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < weights.length) {
      val w = weights(p)
      val n = math.min(xs.numElements(), w.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        if (!xs.isNullAt(i)) acc += xs.getLong(i) * w(i)
        i += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("hyperplaneW", weights, "long[][]")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig"); val w = ctx.freshName("w")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $wRef.length; $p++) {
         |  final long[] $w = $wRef[$p];
         |  final int $n = java.lang.Math.min($a.numElements(), $w.length);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $acc += $a.getLong($i) * $w[$i];
         |    }
         |  }
         |  if ($acc > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  // case-class equality over Array fields is REFERENCE equality, under which
  // two signatures built from separately-constructed (identical) weight
  // matrices never compare equal — defeating common-subexpression
  // elimination and exchange reuse for exactly the expensive expression this
  // operator exists to compute once. Compare the matrices structurally.
  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneSig => child == h.child &&
      weights.length == h.weights.length &&
      weights.indices.forall(i => java.util.Arrays.equals(weights(i), h.weights(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + weights.toSeq.map(java.util.Arrays.hashCode).hashCode()
}

object HyperplaneSig {
  def column(q: Column, weights: Array[Array[Long]]): Column =
    ExpressionUtils.column(HyperplaneSig(ExpressionUtils.expression(q), weights))
}
