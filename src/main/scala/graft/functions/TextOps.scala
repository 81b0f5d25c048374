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
    // one codegen'd pass (org.apache.spark.sql.graft.Tokens) — the
    // declarative filter(split(…)) is an interpreted higher-order function
    // on the hottest path every text operator shares; bit-identical
    // (parity-spec'd on space-run/unicode/empty adversaries)
    org.apache.spark.sql.graft.Tokens.column(text)

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

  /** Within-document repetition ratio in basis points — the standard
    * training-data quality filter for degenerate/templated text: of all word
    * k-gram instances, the fraction that are repeats of an earlier gram
    * (10000 · (total - distinct) / total, floor). 0 = no repetition.
    *
    * PASS A MATERIALIZED COLUMN, not an inline `tokens(...)` tree: `toks`
    * is referenced once per gram (element_at inside the transform lambda),
    * and Catalyst inlines a non-column expression at every reference —
    * re-tokenizing the text O(n) times per row (measured 9× slower on
    * q_token_budget). Project the token array under an alias first. */
  def repetitionBp(toks: Column, k: Int): Column = {
    val total = greatest(size(toks) - (k - 1), lit(0))
    val grams = transform(sequence(lit(1), total),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*))
    when(total > 0,
      ((total - size(array_distinct(grams))).cast("long") * 10000)
        .divide(total.cast("long")).cast("long"))
      .otherwise(lit(0L))
  }

  /** Aggressively normalized fingerprint: md5 of lowercased alnum-only text
    * (fermor-style document identity; a SQL-portable digest stands in for a
    * rolling hash). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** PII scrubbing (training-data redaction): replace email addresses and
    * phone-number-shaped digit runs with typed placeholders. Both patterns
    * are deliberately backtracking-free and dialect-portable (identical
    * semantics under Java regex and RE2, so the DuckDB oracle mirrors them
    * verbatim with the 'g' flag). Two codegen'd regexp_replace passes —
    * email first, so digit runs inside addresses never half-match. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(emailRe), lit("<EMAIL>")),
      lit(phoneRe), lit("<PHONE>"))

  /** C4-style boilerplate inventory: word k-grams occurring in at least
    * `minDf` DISTINCT documents. Grams are built with ONE doc-keyed window
    * pass (posexplode + k-1 `lead`s sharing a frame) rather than per-row
    * higher-order lambdas — transform/sequence shingling is CodegenFallback
    * and ran 3× slower on the same corpus. The 100 TB shape is one explode,
    * one doc-keyed window sort, one gram-keyed count-distinct shuffle; the
    * output is tiny (the repeated-furniture tail), which is what makes
    * [[stripBoilerplate]]'s broadcast sound. Per-doc gram multiplicity is
    * irrelevant to count(DISTINCT doc), so no per-doc dedup is needed. */
  def boilerplateGrams(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int, minDf: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "__t0")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val withLeads = (1 until k).foldLeft(toks)((d, j) =>
      d.withColumn(s"__t$j", lead(col("__t0"), j).over(w)))
    withLeads
      .where(col(s"__t${k - 1}").isNotNull) // no short grams at the doc tail
      .select(col("doc_id"), concat_ws(" ", (0 until k).map(j => col(s"__t$j")): _*).as("gram"))
      .groupBy("gram").agg(count_distinct(col("doc_id")).as("df"))
      .where(col("df") >= minDf)
  }

  /** Remove every occurrence of a (small) boilerplate gram set from each
    * document. The gram inventory is collapsed to ONE sorted array row and
    * broadcast — the corpus side never shuffles; application order is the
    * sorted gram order, so overlapping grams resolve deterministically. */
  def stripBoilerplate(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      grams: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val gs = broadcast(grams.agg(sort_array(collect_list(col("gram"))).as("__gs")))
    docs.crossJoin(gs)
      .withColumn("text_clean",
        aggregate(col("__gs"), col(textCol), (acc, g) => replace(acc, g, lit(""))))
      .drop("__gs")
  }

  /** Top-k TF-IDF terms per document, integer-exact: score =
    * (tf · 10⁶ · N) div (df · doclen) — all 64-bit integer arithmetic (no
    * float idf, so Spark and any SQL oracle agree bit-for-bit), ties broken
    * by term. Three shuffles (tf, doclen, df) over the token explode, then
    * a window top-k; the explode is checkpointed so the three aggregations
    * share one materialization. */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE aggregation of the exploded tokens; everything downstream derives
    // from tf (r11): doc length = Σ tf per doc, document frequency = row
    // count per term (tf is (doc, term)-distinct by construction — the old
    // count_distinct over the RAW token rows was a second two-phase
    // aggregation of ~300 tokens/doc). The checkpoint moves from the
    // exploded token frame (|tokens| rows of strings) to tf (|doc×term|
    // rows), so three readers scan the far smaller frame.
    val toks = docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("n"))
    val dfq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val nDocs = dl.count() // documents with >= 1 token
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("t").asc)
    tf.join(dl, "doc_id").join(dfq, "t")
      .withColumn("score", expr(s"(tf * 1000000 * $nDocs) div (df * n)"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("doc_id"), col("t"), col("score"), col("rn"))
  }

  /** Gopher-style quality rules (Rae et al. 2021, §A1.1) as integer-exact
    * per-document metrics plus the composite keep flag. Every metric is
    * column algebra over ONE scan (no shuffle at all), mirrorable verbatim
    * in SQL:
    *   - `n_words`     whitespace token count
    *   - `mwl_x100`    mean word length ×100 = 100·(non-space chars) div words
    *   - `sym_bp`      symbol-to-word ratio (`#` / `...` occurrences) in bp
    *   - `alpha_bp`    fraction of words containing a letter, in bp
    *   - `stop_hits`   number of tokens drawn from the Gopher stop list
    *   - `keep`        1 iff all thresholds pass (word count in
    *                   [minWords,maxWords], mean word length in [3,10] chars,
    *                   sym_bp < 1000, alpha_bp ≥ 8000, stop_hits ≥ 2)
    * Total token chars is `length(replace(text,' ',''))` — exactly the sum
    * of token lengths under single-space tokenization, without a per-token
    * higher-order pass (those are CodegenFallback; §11). */
  val gopherStops: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")
  def gopherQuality(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      carryText: Boolean = false): org.apache.spark.sql.DataFrame = {
    // carryText appends the input text column AFTER the stats so a caller
    // gating a derived corpus (q_pipeline_curate) keeps its single
    // declarative chain — without it the gate's consumer must join the
    // (recomputed or checkpointed) input back by id to recover the text
    val carried = if (carryText) Seq(col(textCol)) else Nil
    // token array materialized under its own alias first (the repetitionBp
    // rule): three references below would otherwise re-tokenize per row
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__txt"),
        tokens(col(textCol)).as("__ts"))
      .select(Seq(col("doc_id"),
        size(col("__ts")).cast("long").as("n_words"),
        length(regexp_replace(col("__txt"), " ", "")).cast("long").as("__chars"),
        (regexp_count(col("__txt"), lit("#|\\.\\.\\.")) * 10000L).as("__sym10k"),
        size(filter(col("__ts"), t => t.rlike("[a-zA-Z]"))).cast("long").as("__alpha"),
        size(filter(col("__ts"), t => t.isin(gopherStops.map(lit(_)): _*))).cast("long").as("stop_hits"))
        ++ (if (carryText) Seq(col("__txt").as(textCol)) else Nil): _*)
      .where(col("n_words") > 0)
      .select(Seq(col("doc_id"), col("n_words"),
        expr("(__chars * 100) div n_words").as("mwl_x100"),
        expr("__sym10k div n_words").as("sym_bp"),
        expr("(__alpha * 10000) div n_words").as("alpha_bp"),
        col("stop_hits")) ++ carried: _*)
      .withColumn("keep",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mwl_x100") >= 300L && col("mwl_x100") <= 1000L &&
          col("sym_bp") < 1000L && col("alpha_bp") >= 8000L &&
          col("stop_hits") >= 2L).cast("long"))
  }

  /** Unigram surprisal score — the integer-exact stand-in for a CCNet-style
    * LM-perplexity quality bucket. Per-token surprisal is
    * floor(log2(T div n_t)) bits (T = corpus token instances, n_t = this
    * token's count), computed WITHOUT floats as `length(bin(T div n_t)) - 1`
    * — both engines produce the identical minimal binary string, so the
    * score is a fact of the data, not of either engine's log(). Per doc:
    * mean surprisal in centi-bits = 100·Σsurprisal div n_toks. Common-token
    * boilerplate scores low; rare-token gibberish scores high.
    *
    * Scale: one explode, one token-keyed count shuffle, one keyed join back
    * (the unigram table of a 100 TB corpus is large — this is a shuffle
    * join on the token, NOT a broadcast), one per-doc aggregation. */
  def surprisalScore(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
      .localCheckpoint(false)
    val counts = toks.groupBy("t").agg(count(lit(1)).as("n_t"))
    // coalesce: sum over an EMPTY corpus is SQL null. The same (mandatory)
    // corpus-total action also counts the VOCABULARY for free, so a
    // measured-small counts side broadcasts into the surprisal join-back
    // and the token frame is never exchanged by term (guide §3.1; past the
    // guard the shuffle join stands)
    val row = counts.agg(coalesce(sum(col("n_t")), lit(0L)), count(lit(1))).head()
    val total = row.getLong(0)
    val countsB = if (row.getLong(1) <= 2000000L) broadcast(counts) else counts
    toks.join(countsB, "t")
      .withColumn("surp", (length(bin(expr(s"${total}L div n_t"))) - 1).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("surp")).as("bits"))
      .select(col("doc_id"), col("n_toks"), expr("(bits * 100) div n_toks").as("surp_cb"))
  }

  /** Linear text classifier with hashed features — the fasttext-style
    * quality-filter SCORING path: per-token weight by feature-hash lookup,
    * per-doc sum, sign threshold. The weight function is a deterministic
    * hash-derived stand-in (first md5 byte mod 11 − 5 ∈ [−5, 5]) in the
    * FakeCodec tradition: a TRAINED model swaps in a real weight table via
    * the same per-token lookup (broadcast join at vocab scale) without
    * touching the plumbing — and the plumbing is the real thing: tokenize →
    * explode → weight → doc-keyed sum → threshold, ONE shuffle on doc_id.
    * Zero-token docs produce no row (nothing to score). */
  def hashedLinearScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("w", conv(substring(md5(col("t")), 1, 2), 16, 10).cast("long") % 11L - 5L)
      .groupBy("doc_id").agg(sum("w").as("score"))
      .withColumn("keep", col("score") > 0L)

  /** BM25-family retrieval ranking (Robertson–Walker–Jones), INTEGER-EXACT:
    * the RAG/eval "rank the corpus for this query" step with no float
    * anywhere, so both engines replay it bit-identically. Fixed-point
    * formula per (doc d, query term t), everything basis points:
    *
    *   idf_t    = floor_log2(N div df_t)           (= length(bin(x))−1,
    *              the surprisal trick — saturates to 0 for everywhere-terms)
    *   dlnorm_d = (10000 − bBp) + (bBp·dl_d) div avgdl
    *   contrib  = idf_t · (tf·(10000+k1Bp)·10000) div (tf·10000 + (k1Bp·dlnorm_d) div 10000)
    *
    * score = Σ_t contrib, ranked (score desc, doc_id asc), top `k` — the
    * classical shape (tf saturation at k1, length normalization at b) with
    * floor-log2 idf substituting ln.
    *
    * Scale: one token explode feeding dl + tf + df aggs; df/idf is |query|
    * rows (collected, broadcast back); N/avgdl are two scalars; the final
    * rank is TakeOrderedAndProject top-k, never a global sort. */
  def bm25Rank(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int, k1Bp: Long = 12000L, bBp: Long = 7500L)
      : org.apache.spark.sql.DataFrame = {
    require(query.nonEmpty && k > 0 && k1Bp >= 0 && bBp >= 0 && bBp <= 10000)
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
      .localCheckpoint(eager = false) // feeds dl, df, and tf
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val Array(nDocs, avgdl) = dl.agg(count(lit(1)), coalesce(sum("dl"), lit(0L)))
      .as[(Long, Long)].collect().headOption
      .map(r => Array(r._1, r._2 / math.max(r._1, 1L))).getOrElse(Array(0L, 1L))
    if (nDocs == 0L) return dl.select(col("doc_id"), col("dl").as("score"))
    val qt = toks.where(col("t").isin(query: _*))
    val idf = qt.groupBy("t").agg(countDistinct("doc_id").as("dft"))
      .as[(String, Long)].collect()
      .map { case (t, dft) => (t, (63 - java.lang.Long.numberOfLeadingZeros(nDocs / dft)).toLong) }
      .toSeq.toDF("t", "idf")
    // the mandatory corpus-stats action already counted |docs|, so a
    // measured-small dl broadcasts for free (guide §3.1); past the guard
    // the shuffle join stands
    val dlB = if (nDocs <= 2000000L) broadcast(dl) else dl
    qt.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .join(dlB, "doc_id").join(broadcast(idf), "t")
      .withColumn("contrib", expr(
        s"idf * (tf * ${10000L + k1Bp} * 10000) div " +
          s"(tf * 10000 + ($k1Bp * ((${10000L - bBp}) + ($bBp * dl) div $avgdl)) div 10000)"))
      .groupBy("doc_id").agg(sum("contrib").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }

  /** Collocation mining by pointwise mutual information — the phrase-mining
    * / tokenizer-merge-shortlist step, INTEGER-EXACT: for each adjacent
    * token pair (bigram) with count >= `minCount` and a positive PMI
    * (c_xy·T >= c_x·c_y, checked division-free), emit
    * `pmi_fl2 = floor_log2((c_xy·T) div (c_x·c_y))` — the bin-length trick
    * again, so both engines agree bit-for-bit.
    *
    * Scale: bigrams are a per-row zero-shuffle transform (index-pair
    * structs over the token array); then exactly three keyed counts
    * (bigram, unigram, total) and two keyed join-backs — the unigram side
    * of a 100 TB corpus is NOT broadcastable and the keyed join is the
    * honest shape (the surprisalScore rule). */
  def pmiCollocations(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minCount: Long): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1)
    val toks = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__ts"))
      .localCheckpoint(eager = false) // feeds bigram AND unigram counts
    val uni = toks.select(explode(col("__ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val total = uni.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    if (total == 0L) return uni.select(col("t").as("x"), col("t").as("y"),
      col("c").as("n_xy"), col("c").as("pmi_fl2")).where(lit(false))
    val bi = toks.where(size(col("__ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__ts) - 1), i -> struct(__ts[i - 1] AS x, __ts[i] AS y))"))
        .as("bg"))
      .select(col("bg.x").as("x"), col("bg.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
      .where(col("n_xy") >= minCount)
    // both products on DECIMAL(38,0): counts are <= T <= Long.Max, so each
    // product stays under 1e38 and is EXACT at any corpus size — raw
    // long*long overflows (ANSI: job-killing error) once T passes ~3e9.
    // The quotient is <= T (n_xy <= cx), so it lands back in a long for bin().
    bi.join(uni.select(col("t").as("x"), col("c").as("cx")), "x")
      .join(uni.select(col("t").as("y"), col("c").as("cy")), "y")
      .where(expr(s"cast(n_xy as decimal(38,0)) * ${total}L >= cast(cx as decimal(38,0)) * cy"))
      .select(col("x"), col("y"), col("n_xy"),
        (length(bin(expr(
          s"(cast(n_xy as decimal(38,0)) * ${total}L) div (cast(cx as decimal(38,0)) * cy)"))) - 1)
          .cast("long").as("pmi_fl2"))
  }

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003 — the MOSS
    * span-dedup/plagiarism index): hash every word k-gram, slide a
    * w-window over consecutive gram hashes, keep each window's MINIMUM
    * (leftmost on the — here impossible — hash tie), dedup per doc.
    * Guarantee: any two docs sharing a run of ≥ w+k−1 tokens share a
    * fingerprint; expected density 2/(w+1). The selector packs the 1-based
    * gram position behind the first 12 md5 hex chars as 9 zero-padded
    * digits, so string min ≡ (hash, pos) lexicographic min in BOTH engines
    * and ties cannot occur (positions are distinct; >10⁹ grams per doc
    * would truncate the pad — an absurd per-doc bound, documented).
    * Docs shorter than w+k−1 tokens emit nothing (no full window — the
    * standard contract). Returns (doc_id, fp, pos).
    *
    * Scale: gram hashing and window minima are pure per-row array algebra
    * over a MATERIALIZED token alias (the repetitionBp rule) — ZERO
    * shuffle at any corpus size; only the final explode'd rows move. */
  def winnowFingerprints(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 3, w: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && w >= 1)
    val withToks = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
    // sequence(1, n) DESCENDS for n < 1 — guard like shingles does
    val nGrams = size(col("__toks")) - (k - 1)
    val grams = when(nGrams >= 1, transform(sequence(lit(1), nGrams),
      i => concat(substring(md5(concat_ws(" ",
        (0 until k).map(j => element_at(col("__toks"), i + j)): _*)), 1, 12),
        lpad(i.cast("string"), 9, "0"))))
      .otherwise(array().cast("array<string>"))
    val withH = withToks.select(col("doc_id"), grams.as("__hs"))
    val nWin = size(col("__hs")) - (w - 1)
    val sels = when(nWin >= 1, transform(sequence(lit(1), nWin),
      j => array_min(slice(col("__hs"), j, lit(w)))))
      .otherwise(array().cast("array<string>"))
    withH.select(col("doc_id"), explode(array_distinct(sels)).as("sel"))
      .select(col("doc_id"), substring(col("sel"), 1, 12).as("fp"),
        substring(col("sel"), 13, 9).cast("long").as("pos"))
  }

  /** Bigram-LM quality scoring (the CCNet/KenLM perplexity-filter shape):
    * per-doc mean conditional surprisal under the corpus's OWN bigram
    * model, INTEGER-EXACT. Per bigram instance (x,y):
    * fl2(c(x) div c(x,y)) bits, where c(x) counts x as a bigram HEAD (the
    * proper conditional denominator) — floor-log2 via the bin-length
    * trick; c(x,y) ≥ 1 because the instance counts itself, so no
    * smoothing term is needed. Doc score = centibits per bigram
    * (bits·100 div n). LOW = predictable/templated text, HIGH = unusual —
    * the perplexity-bucket signal both tails of which pipelines cut.
    * Docs with < 2 tokens emit no row (nothing to score).
    *
    * Scale: bigram extraction is per-row zero-shuffle algebra; then two
    * keyed counts + two keyed join-backs — the unigram/bigram tables of a
    * 100 TB corpus are NOT broadcastable, keyed joins are the honest
    * shape (the surprisalScore rule). */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val pairs = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__ts"))
      .where(size(col("__ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(__ts) - 1), i -> struct(__ts[i - 1] AS x, __ts[i] AS y))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.x").as("x"), col("bg.y").as("y"))
      .localCheckpoint(eager = false) // feeds head counts, bigram counts, AND the score join
    val uni = pairs.groupBy("x").agg(count(lit(1)).as("c_x"))
    val bi = pairs.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    pairs.join(bi, Seq("x", "y")).join(uni, Seq("x"))
      .withColumn("bits", (length(bin(expr("c_x div c_xy"))) - 1).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("bits"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(bits * 100) div n_bigrams").as("lm_cb"))
  }

  /** Deterministic hashed text embedding (the FakeCodec tradition): dim d
    * of a doc = Σ over its tokens of (md5 byte d − 128) ∈ [−128, 127] —
    * the hash-projection stand-in for a learned sentence encoder, with the
    * REAL pipeline shape (tokenize → per-token vector → per-doc sum) and
    * integer-exact cross-engine parity. Emitted LONG format
    * (doc_id, dim, val): the DuckDB oracle replays it bit-identically, and
    * `groupBy(doc_id).pivot`/collect_list reshapes to the Array[Float]
    * column the [[graft.sim.Ann]] operators consume. A trained encoder
    * swaps in via `Multimodal.embed`'s mapPartitions without touching the
    * downstream ANN plumbing. Zero-token docs emit no rows.
    *
    * Scale: one token explode × dims (bounded fan-out), one doc-keyed sum
    * — scan-linear, no distribution table at all. */
  def hashedTextEmbedding(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dims: Int = 16): org.apache.spark.sql.DataFrame = {
    require(dims >= 1 && dims <= 16, "md5 yields 16 bytes")
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("h", md5(col("t")))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(dims - 1))).as("dim"))
      .withColumn("v",
        conv(expr("substring(h, dim * 2 + 1, 2)"), 16, 10).cast("long") - 128L)
      .groupBy("doc_id", "dim").agg(sum("v").as("val"))
  }

  /** Tokenizer-vocabulary construction: the corpus's top-K tokens by
    * frequency (count desc, token asc at ties — deterministic at the
    * boundary), assigned contiguous ids 1..K in that order. The "train the
    * tokenizer on the corpus" step of a pretraining pipeline, whitespace
    * edition.
    *
    * Scale: one token-keyed count shuffle, then a TakeOrderedAndProject
    * top-K (never a global sort of the unigram table); the final
    * rank-assignment window runs over exactly K rows. */
  /** The ONE top-K vocabulary cut (count desc, token asc at ties) shared by
    * [[buildVocab]] and [[oovRateBp]] — a single source of truth for the
    * tie-break and the TakeOrderedAndProject shape. `toks`: one `t` token
    * per row. */
  private def vocabTop(toks: org.apache.spark.sql.DataFrame,
      vocabSize: Int): org.apache.spark.sql.DataFrame =
    toks.groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(vocabSize)

  def buildVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
      vocabSize: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0)
    import org.apache.spark.sql.expressions.Window
    vocabTop(docs.select(explode(tokens(col(textCol))).as("t")), vocabSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("t").asc)).cast("long"))
  }

  /** Out-of-vocabulary rate in basis points against a CORPUS-DERIVED top-K
    * vocabulary (frequency desc, token asc tie-break — deterministic at the
    * boundary). The corpus-relative cousin of the fixed-list quality
    * signals: high OOV against the corpus's own head vocabulary flags
    * gibberish, boilerplate-stripped residue, and wrong-language text.
    *
    * Scale: the vocabulary is a TakeOrderedAndProject top-K (never a global
    * sort) broadcast back to the token stream — one keyed count shuffle,
    * one per-doc aggregation; docs with zero tokens have no rate and are
    * absent, matching the oracle's unnest semantics. */
  def oovRateBp(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      vocabSize: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize > 0)
    val toks = docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
      .localCheckpoint(false)
    val vocab = vocabTop(toks.select("t"), vocabSize)
      .select(col("t"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), expr("(n_oov * 10000) div n_toks").as("oov_bp"))
  }

  /** BPE merge learning (Sennrich et al. 2016) — the "train the subword
    * tokenizer" step, DETERMINISTIC edition: start from character symbols;
    * each round counts adjacent symbol pairs over the word-frequency table
    * (weighted by word count, one count per occurrence), merges the argmax
    * pair (count DESC, then (a, b) ASC — a strict total order, so the merge
    * sequence is a pure fact of the corpus), and rewrites the words.
    * Returns the learned merge table `(merge_rank, a, b, cnt)`.
    *
    * Words are carried as boundary-MARKED strings (`<s><y><m>…`), so the
    * merge rewrite is one literal `replace('<a><b>' → '<ab>')` — markers
    * make symbol boundaries unambiguous (no false match inside a longer
    * symbol), and both engines' replace() scans left-to-right
    * non-overlapping, which IS BPE's greedy convention for runs like
    * `aaa`. Marked strings of distinct words stay distinct (the underlying
    * character sequence is unchanged), so no re-aggregation is needed.
    * Edge case: a literal `>` INSIDE a token makes the symbol-extraction
    * regex `<([^>]*)>` mis-split that word's symbols. Both the trainer and
    * [[bpeEncode]] apply the identical marking, and the oracle mirrors it
    * verbatim, so train/encode/oracle stay self-consistent — but merge
    * counts for `>`-bearing words are off-contract; pre-scrub `>` (e.g.
    * [[scrubPii]]-style replace) if such tokens matter.
    *
    * Scale: the working set is the WORD-frequency table — vocabulary-sized,
    * not corpus-sized (the classic BPE formulation); per round one pair
    * explode + one (a,b)-keyed count + a 1-row global argmax (the only
    * driver-side datum) + one map-only rewrite. Eager per-round
    * checkpoints. The corpus is scanned ONCE, at round 0. */
  def bpeMerges(docs: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int): org.apache.spark.sql.DataFrame = {
    require(nMerges >= 1 && nMerges <= 64)
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs.select(explode(tokens(col(textCol))).as("wd"))
      .groupBy("wd").agg(count(lit(1)).as("f"))
      .select(regexp_replace(col("wd"), "(.)", "<$1>").as("m"), col("f"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      r += 1
      val best = words
        .select(col("f"), expr("regexp_extract_all(m, '<([^>]*)>', 1)").as("s"))
        .select(col("f"), explode(when(size(col("s")) >= 2,
            expr("transform(sequence(1, size(s) - 1), " +
              "i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))"))
          .otherwise(expr("CAST(array() AS array<struct<a: string, b: string>>)"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((r, a, b, cnt))
        words = words.select(
            replace(col("m"), lit(s"<$a><$b>"), lit(s"<$a$b>")).as("m"), col("f"))
          .localCheckpoint(true)
      }
    }
    out.toSeq.toDF("merge_rank", "a", "b", "cnt")
  }

  /** LANGUAGE-CONSISTENCY scoring — the mixed-language document detector
    * (code-switching, wrongly-merged crawls, boilerplate in a second
    * language): chunk the document into non-overlapping token windows,
    * language-ID each chunk, and report the majority language plus the
    * agreement ratio in basis points. A monolingual document scores 10000;
    * a half-and-half merge scores ~5000 and gets routed to splitting, not
    * dropping. Majority ties break (count desc, lang asc) —
    * deterministic, oracle-replayable.
    *
    * One chunk explode + two keyed aggs + one window over per-doc language
    * counts (≤ |langs| rows per doc) — corpus-linear, no pair work. */
  def langConsistency(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = graft.pipeline.Corpus.chunkDocs(docs, idCol, textCol,
      size = chunkTokens, stride = chunkTokens)
    val cl = ch.select(col("doc_id"), langId(tokens(col("chunk_text"))).as("lang"))
      .groupBy("doc_id", "lang").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val tot = cl.groupBy("doc_id").agg(sum("n").as("n_chunks"))
    val w = Window.partitionBy("doc_id").orderBy(col("n").desc, col("lang").asc)
    cl.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .join(tot, "doc_id")
      .select(col("doc_id"), col("n_chunks"), col("lang").as("major_lang"),
        expr("(n * 10000) div n_chunks").as("agree_bp"))
  }

  /** BPE ENCODING — apply a learned merge table ([[bpeMerges]]'s output
    * shape `(merge_rank, a, b, …)`) to a corpus and count each document's
    * subword tokens. Applying merges in rank order with left-to-right
    * non-overlapping replacement IS the greedy BPE encode convention (and
    * exactly the rewrite [[bpeMerges]] itself performed while learning), so
    * a corpus encoded with its own merges reproduces the training-time
    * word shapes bit-for-bit.
    *
    * Scale: merges are applied to the DISTINCT-word table (vocabulary-
    * sized, never corpus-sized) as ONE projection of ≤64 nested literal
    * replaces (codegen-friendly, zero extra jobs); the corpus is scanned
    * once and joins the encoded vocabulary on the word key — AQE broadcasts
    * it when small. Documents with zero tokens have no subword count and
    * are absent, matching [[oovRateBp]]'s convention. */
  def bpeEncode(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ms = merges.orderBy("merge_rank").select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    require(ms.length <= 64, s"merge table has ${ms.length} rows; bpeMerges caps at 64")
    val toks = docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("wd"))
    val encodedM = ms.foldLeft(regexp_replace(col("wd"), "(.)", "<$1>")) {
      case (m, (a, b)) => replace(m, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }
    val vocabEnc = toks.select("wd").distinct()
      .withColumn("__m", encodedM)
      .select(col("wd"), size(expr("regexp_extract_all(__m, '<([^>]*)>', 1)")).as("n_sub"))
    toks.join(vocabEnc, "wd")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_bpe"))
  }

  /** Distinct character trigram inventory of a text column (spaces count —
    * a literal pattern's spaces are part of the match). Texts shorter than
    * 3 chars have no trigrams. */
  def charTrigrams(text: Column): Column =
    array_distinct(when(length(text) >= 3,
        transform(sequence(lit(1), length(text) - 2), i => substring(text, i, lit(3))))
      .otherwise(array().cast("array<string>")))

  /** Trigram inverted index: one (gram, doc_id) posting row per DISTINCT
    * trigram per document — the artifact a grep-at-scale service builds
    * ONCE and persists partitioned/bucketed by `gram`, so each literal
    * query touches only its own grams' postings instead of the corpus
    * text. */
  def trigramIndex(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(charTrigrams(col(textCol))).as("gram"))
      .select(col("gram"), col("doc_id"))

  /** Shard count of the persisted-gram-index layout — fixed so the write
    * ([[saveGramIndex]]) and every later read ([[grepIndexed]]) can never
    * disagree on a gram's shard. 64 directories is small-file-safe at any
    * corpus size while pruning a one-pattern read to ≤ |pattern grams|
    * shards. */
  private[graft] val gramIndexShards = 64

  /** Driver-side replica of the shard column's `pmod(xxhash64(gram), n)` —
    * the SAME XxHash64 the Column expression evaluates, so a literal
    * pattern's shard set can be computed without a job and pushed as a
    * partition filter (spec'd equal to the column side on every gram). */
  private[graft] def gramShard(gram: String): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(gram,
        org.apache.spark.sql.types.StringType)),
      42L /* the xxhash64 Column function's fixed seed */)
      .eval(null).asInstanceOf[Long]
    (((h % gramIndexShards) + gramIndexShards) % gramIndexShards).toInt
  }

  /** Persist a [[trigramIndex]] partitioned by a bounded hash SHARD of the
    * gram — the repeated-query artifact a grep service builds once: a later
    * [[grepIndexed]] pushes the pattern's shard set as a PartitionFilter,
    * so each query lists and reads ≤ |pattern grams| of the 64 shard
    * directories instead of the whole posting store (ScaleSpec pins the
    * pruned read against a plain-parquet control).
    *
    * Sharding by hash, not by raw gram: per-gram directories would mean
    * charset³ partitions (a small-file explosion at 100 TB), and a
    * BUCKETED table prunes only while the planner keeps the bucketed scan
    * alive — which it disables for exactly this read shape (no join/agg on
    * the bucket key ⇒ `Bucketed: false`). A directory partition prunes
    * unconditionally. */
  def saveGramIndex(index: org.apache.spark.sql.DataFrame, path: String): Unit =
    index.withColumn("__shard",
        pmod(xxhash64(col("gram")), lit(gramIndexShards.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("__shard").parquet(path)

  /** Literal-substring search over a posting index: candidates = documents
    * holding ALL of the pattern's distinct trigrams (count over the
    * gram-filtered postings — recall-complete because a document containing
    * the pattern contains every one of its trigrams), then the exact
    * `contains` verify runs on the candidates ONLY (semi-join back to the
    * corpus text). Patterns shorter than 3 chars have no trigram to key
    * on — callers use [[grepScan]].
    *
    * Scale: the pattern's gram set is a tiny literal IN-filter over the
    * index; against a [[saveGramIndex]] store (detected by its `__shard`
    * column) the matching shard set rides along as a partition filter, so
    * the scan reads only the pattern's shard directories — pruned, pinned
    * in ScaleSpec. The candidate count-agg shuffles only the matching
    * postings; the exact verify reads only candidate documents. The
    * repeated-query complement of the one-shot [[grepScan]] — spec'd
    * identical on every pattern. */
  def grepIndexed(index: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      pattern: String): org.apache.spark.sql.DataFrame = {
    require(pattern.length >= 3, "grepIndexed needs a pattern of >= 3 chars (use grepScan)")
    val pats = pattern.sliding(3).toSeq.distinct
    val sharded =
      if (index.columns.contains("__shard"))
        index.where(col("__shard").isin(pats.map(gramShard).distinct: _*))
      else index
    val cands = sharded.where(col("gram").isin(pats: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("__n"))
      .where(col("__n") === pats.length)
      .select("doc_id")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .join(cands, Seq("doc_id"), "left_semi")
      .where(col("__t").contains(pattern))
      .select("doc_id")
  }

  /** One-shot literal search: a pure contains scan — the honest plan when
    * a query runs ONCE (an index build would itself scan the corpus). */
  def grepScan(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, pattern: String): org.apache.spark.sql.DataFrame =
    docs.where(col(textCol).contains(pattern)).select(col(idCol).as("doc_id"))

  /** Batch literal search: a whole PATTERNS TABLE against the posting
    * index in ONE pass — the shape a grep service actually runs (per-call
    * [[grepIndexed]] would rescan per pattern). Patterns explode to their
    * distinct trigrams, equi-join the postings on `gram`, and a (pattern,
    * doc) candidate needs ALL the pattern's grams present (the grepIndexed
    * recall law per pattern); the exact `contains` verify joins candidates
    * back to the corpus text once. Emits (pattern, doc_id). Patterns
    * shorter than 3 chars have no trigram to key on and DROP (they belong
    * to [[grepScan]]; a filter, not a require — the patterns side is a
    * table, not a literal).
    *
    * Scale: the posting join is gram-keyed and touches only grams some
    * pattern uses; candidates shuffle on (pattern, doc); the verify join
    * reads candidate documents once for ALL patterns. Work tracks matching
    * postings × patterns-per-gram, never corpus × patterns. */
  def grepMany(index: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      patterns: org.apache.spark.sql.DataFrame,
      patCol: String = "pattern"): org.apache.spark.sql.DataFrame = {
    val pats = patterns.select(col(patCol).as("pattern")).dropDuplicates("pattern")
    val pg = pats
      .where(length(col("pattern")) >= 3)
      .select(col("pattern"), explode(charTrigrams(col("pattern"))).as("gram"))
    val need = pg.groupBy("pattern").agg(count(lit(1)).as("__need"))
    val cands = pg.join(index, "gram")
      .groupBy("pattern", "doc_id").agg(count(lit(1)).as("__have"))
      .join(need, "pattern")
      .where(col("__have") === col("__need"))
      .select("pattern", "doc_id")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .join(cands, "doc_id")
      .where(col("__t").contains(col("pattern")))
      .select("pattern", "doc_id")
  }
}
