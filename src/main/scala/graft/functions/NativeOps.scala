package graft.functions

import org.apache.spark.sql.Column

/** Public facade for graft's native Catalyst expressions (which live under
  * org.apache.spark.sql.graft to reach private[sql] internals). */
object NativeOps {
  /** Codegen'd integer dot product of two array<long> columns. */
  def longArrayDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.LongArrayDot.column(a, b)

  /** One-pass distinct word-k-gram shingles (vs the interpreted
    * higher-order-function pipeline). */
  def wordShingles(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.WordShingles.column(text, k)

  /** Codegen'd merge-scan |A ∩ B| over lex-sorted distinct array<string>. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.SortedIntersectCount.column(a, b)

  /** One-pass 64-bit average-hash over a text's code-point pixels (vs the
    * per-character posexplode + two keyed aggregations). */
  def aHash64(text: Column): Column =
    org.apache.spark.sql.graft.AHash64.column(text)

  /** All numPerm MinHash minima in one codegen'd pass over a 31-bit hash
    * array (vs numPerm interpreted array_min(transform(…)) expressions). */
  def minhashSigs(hashes: Column, numPerm: Int): Column =
    org.apache.spark.sql.graft.MinHashSigs.column(hashes, numPerm)

  /** Packed random-hyperplane sign bits in one codegen'd pass over a
    * quantized vector (vs numBits interpreted zip_with/aggregate passes). */
  def hyperplaneSig(q: Column, weights: Array[Array[Long]]): Column =
    org.apache.spark.sql.graft.HyperplaneSig.column(q, weights)

  /** Fused dot-product + exact cosine-threshold gate: the dot if
    * `dot > 0 ∧ 10⁶·dot² ≥ t2·na·nb`, else NULL — one loop evaluation per
    * REJECTED candidate row (a multi-conjunct filter re-evaluates per
    * conjunct; admitted rows, the filtered tail, pay one more in the
    * projection). */
  def cosineGateDot(a: Column, b: Column, na: Column, nb: Column, t2: Long): Column =
    org.apache.spark.sql.graft.CosineGateDot.column(a, b, na, nb, t2)
}
