package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral, Literal}
import org.apache.spark.sql.graft.{CosineGateDot, HyperplaneSig, LongArrayDot, MinHashSigs, SimHashAgg, SortedIntersectCount, WordShingles}
import org.apache.spark.sql.types.LongType

/** Spark session extension wiring graft's native expressions into the SQL
  * function registry, so pure-SQL users get the whole native tier too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT long_array_dot(qa, qb) FROM pairs")
  * spark.sql("SELECT minhash_sigs(word_shingle_hashes, 64) FROM docs")
  * spark.sql("SELECT id, simhash_agg(token_hash) FROM toks GROUP BY id")
  * }}}
  *
  * Structural parameters (shingle width, permutation count, thresholds)
  * must be integer LITERALS — they parameterize generated code, they are
  * not per-row data. A non-literal argument fails at analysis, not at run
  * time, with the argument position named.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Require argument `pos` (1-based, for the error message) of `fn` to be
    * an int/long literal and return it as Long. */
  private def litLong(e: Expression, fn: String, pos: Int): Long = e match {
    case IntegerLiteral(v) => v.toLong
    case Literal(v: Long, LongType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal (structural parameter), got: ${e.sql}")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** The full registry: one row per native expression, shared by the
    * session-extension path and the test-session registration path. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    // dot product of two array<long> (null elements contribute 0)
    entry("long_array_dot", classOf[LongArrayDot]) { args =>
      arity("long_array_dot", args, 2)
      LongArrayDot(args(0), args(1))
    },
    // |intersection| of two SORTED array<long>
    entry("sorted_intersect_count", classOf[SortedIntersectCount]) { args =>
      arity("sorted_intersect_count", args, 2)
      SortedIntersectCount(args(0), args(1))
    },
    // distinct word-k-gram shingles: word_shingles(text, k)
    entry("word_shingles", classOf[WordShingles]) { args =>
      arity("word_shingles", args, 2)
      WordShingles(args(0), litLong(args(1), "word_shingles", 2).toInt)
    },
    // minhash signature vector: minhash_sigs(hashes, numPerm)
    entry("minhash_sigs", classOf[MinHashSigs]) { args =>
      arity("minhash_sigs", args, 2)
      MinHashSigs(args(0), litLong(args(1), "minhash_sigs", 2).toInt)
    },
    // hyperplane LSH signature: hyperplane_sig(vec, numBits, dim) — the
    // deterministic plane weights are a function of (numBits, dim) alone,
    // identical to the DataFrame path (Ann.planeWeights)
    entry("hyperplane_sig", classOf[HyperplaneSig]) { args =>
      arity("hyperplane_sig", args, 3)
      val bits = litLong(args(1), "hyperplane_sig", 2).toInt
      val dim = litLong(args(2), "hyperplane_sig", 3).toInt
      HyperplaneSig(args(0), graft.sim.Ann.planeWeights(dim, bits))
    },
    // fused cosine gate: cosine_gate_dot(qa, qb, na, nb, t2) — dot iff
    // dot > 0 ∧ 10⁶·dot² ≥ t2·na·nb, else NULL
    entry("cosine_gate_dot", classOf[CosineGateDot]) { args =>
      arity("cosine_gate_dot", args, 5)
      CosineGateDot(args(0), args(1), args(2), args(3),
        litLong(args(4), "cosine_gate_dot", 5))
    },
    // SimHash aggregate over per-token 64-bit hashes (GROUP BY doc)
    entry("simhash_agg", classOf[SimHashAgg]) { args =>
      arity("simhash_agg", args, 1)
      SimHashAgg(args(0))
    })

  private def entry(name: String, cls: Class[_])(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
}
