package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines (SURVEY.md §2.4).
  *
  * Everything here is built from codegen'd Catalyst expressions
  * (split/filter/transform/aggregate lambdas, regexp, md5) — no UDFs, so
  * whole-stage codegen spans the full pipeline and the same semantics are
  * mirrorable 1:1 in the DuckDB oracle SQL. Ratios are emitted in integer
  * basis points (floor division) for exact cross-engine hash parity.
  */
object TextOps {

  /** Whitespace tokens (single-space split, empties dropped — identical
    * semantics in DuckDB's string_split + list_filter). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Regex word-ish tokens (BPE-ish: letter runs / digit runs). */
  def wordTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+"))

  /** Distinct word k-gram shingles over a token array (1-based element_at). */
  def shingles(toks: Column, k: Int): Column = {
    val grams = transform(sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*))
    array_distinct(when(size(toks) >= k, grams).otherwise(array().cast("array<string>")))
  }

  /** Language-ID by marker-token counts (n-gram-class heuristic): score each
    * language by occurrences of its marker tokens; argmax with a fixed
    * priority tie-break. Deterministic and SQL-mirrorable. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "de" -> Seq("table", "join"),
    "es" -> Seq("row", "column"),
    "fr" -> Seq("filter", "merge"),
    "zh" -> Seq("window", "batch"))

  def langId(ts: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> size(filter(ts, t => t.isin(ms.map(lit(_)): _*)))
    }
    val m = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === m && m > 0, lit(lang)).otherwise(acc)
    } // foldRight => earlier entries win ties (en > de > es > fr > zh)
  }

  /** Aggressively normalized fingerprint: md5 of lowercased alnum-only text
    * (fermor-style document identity; a SQL-portable digest stands in for a
    * rolling hash). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))
}
