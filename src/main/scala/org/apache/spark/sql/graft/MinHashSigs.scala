package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** All `numPerm` MinHash minima in ONE pass over the hash array — the
  * signature hot path of MinHash-LSH dedup (SURVEY.md §2.4).
  *
  * The declarative form is numPerm separate `array_min(transform(hs, …))`
  * expressions: higher-order functions are CodegenFallback (interpreted,
  * per-element boxing) and the hash array is traversed numPerm times. This
  * expression holds a `long[numPerm]` of running minima and updates all of
  * them per element — one traversal, primitive arithmetic, inside
  * whole-stage codegen (same playbook as [[LongArrayDot]] / [[WordShingles]]).
  *
  * Permutations are the affine family `(a_p·h + b_p) mod (2³¹-1)` with the
  * same deterministic constants as the declarative formulation, so
  * signatures are bit-identical (spec-pinned). Inputs must already be
  * reduced mod 2³¹-1 (31-bit), keeping `a_p·h + b_p < 2⁶³` overflow-free.
  */
case class MinHashSigs(child: Expression, numPerm: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  private def M = MinHashSigs.MersennePrime

  @transient private lazy val pa: Array[Long] =
    Array.tabulate(numPerm)(p => (0x9E3779B9L * (2 * p + 1)) % M)
  @transient private lazy val pb: Array[Long] =
    Array.tabulate(numPerm)(p => (0xC2B2AE3DL * (p + 1)) % M)

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val mins = Array.fill(numPerm)(M)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var p = 0
      while (p < numPerm) {
        val v = (pa(p) * h + pb(p)) % M
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("minhashA", pa, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", pb, "long[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val mins = ctx.freshName("mins")
      s"""
         |final int $n = $a.numElements();
         |final long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, ${M}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.getLong($i);
         |  for (int $p = 0; $p < $numPerm; $p++) {
         |    final long $v = ($aRef[$p] * $h + $bRef[$p]) % ${M}L;
         |    if ($v < $mins[$p]) $mins[$p] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  val MersennePrime: Long = 2147483647L // 2^31 - 1

  def column(hashes: Column, numPerm: Int): Column =
    ExpressionUtils.column(MinHashSigs(ExpressionUtils.expression(hashes), numPerm))
}
