package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for a pretraining data pipeline: deterministic
  * sampling and sequence packing. Both are pure column algebra — no UDFs, no
  * state — so they fuse into whatever scan/filter plan surrounds them.
  */
object Corpus {

  /** Deterministic content-hash sampling: keep rows whose `md5(key)` starts
    * with one of the first `keep16` of the 16 hex digits — a reproducible
    * ~keep16/16 systematic sample. Reproducible across engines, runs, and
    * cluster sizes (no RNG, no partition sensitivity — the properties
    * `df.sample()` cannot give a 100 TB corpus job that must be re-runnable
    * bit-identically). Stratified rates = one call per stratum. */
  def hashSample(df: DataFrame, key: Column, keep16: Int): DataFrame = {
    require(keep16 >= 0 && keep16 <= 16, s"keep16 must be in [0,16], got $keep16")
    val buckets = "0123456789abcdef".take(keep16).map(_.toString)
    if (buckets.isEmpty) df.where(lit(false))
    else df.where(substring(md5(key.cast("string")), 1, 1).isin(buckets: _*))
  }

  /** Sequence packing ("concat-and-chunk"): assign each document to the
    * context-window bin where its text begins when documents are
    * concatenated in deterministic (shard, id) order — bin = floor of the
    * PRECEDING token cumsum / targetTokens.
    *
    * The cumsum window is PARTITIONED BY a hash shard of the id, never
    * global: packing a 100 TB corpus is `shards` independent sorted windows
    * (each a single shuffle partition's sort), not one global total order.
    * Output adds `shard`, `bin`; (shard, bin) is the packed-sequence key. */
  def packBins(df: DataFrame, idCol: String, tokCol: String, targetTokens: Long,
      shards: Int): DataFrame = {
    require(targetTokens > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("__start", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      // `div` is exact integer floor division — `/` on two longs is DOUBLE
      // division in Spark, whose rounding can flip the bin at per-shard
      // cumsums approaching 2⁵³
      .withColumn("bin", expr(s"__start div ${targetTokens}L"))
      .drop("__start")
  }

  /** Deterministic MIXTURE sampling: per-stratum keep rates, one scan, zero
    * shuffle — the "data mixing" step of corpus assembly (e.g. up-weight
    * code, down-weight web crawl). A row is kept iff its 16-bit content-hash
    * bucket clears the stratum's rate: h16·10000 < bp·65536, where h16 is
    * the first 4 md5 hex digits of the key — pure integer comparison, so the
    * decision is a fact of (key, rate) reproducible across engines, runs,
    * and cluster sizes, and REFINABLE: raising a stratum's bp only ADDS rows
    * (the kept set at rate r is a subset of rate r' > r), which is what an
    * iterating mixture search needs. Strata not listed get `defaultBp`.
    *
    * Scale: a pure scan predicate (no RNG, no per-stratum pass, no shuffle);
    * at 100 TB this is exactly as expensive as reading the data. */
  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
      ratesBp: Seq[(String, Int)], defaultBp: Int = 0): DataFrame = {
    require((defaultBp +: ratesBp.map(_._2)).forall(bp => bp >= 0 && bp <= 10000),
      s"rates are basis points in [0, 10000]")
    val h16 = conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")
    val bp = ratesBp.foldRight(lit(defaultBp).cast("long")) { case ((s, r), acc) =>
      when(stratum === s, lit(r.toLong)).otherwise(acc)
    }
    df.where(h16 * 10000L < bp * 65536L)
  }

  /** Weight-PROPORTIONAL deterministic sampling — the per-row sibling of
    * [[mixtureSample]]'s per-stratum rates: each row survives with
    * probability min(weight, wMax)/wMax, decided by its id hash alone
    * (md5 16-bit prefix vs the weight-scaled threshold; no RNG, no
    * monotonic_id). The pre-training uses: quality-score-proportional
    * selection, length-weighted sampling (weight = token count approximates
    * token-level sampling at document granularity), and any "prefer X
    * softly" pass that must stay reproducible across engines, reruns, and
    * cluster sizes.
    *
    * Contract: membership is a fact of (id, weight, wMax) alone — a corpus
    * that grows never flips an existing row's verdict, and RAISING a row's
    * weight only ever ADDs it (monotone-refinable, the mixtureSample law;
    * spec'd). weight ≥ wMax keeps always; weight ≤ 0 or NULL drops always
    * (a null weight nulls the predicate). wMax is capped at 2⁴⁶ so the
    * 16-bit cross-multiplication h16·wMax stays inside Long.
    *
    * Scale: a pure scan predicate — zero shuffle, zero joins at any corpus
    * size (the mixtureSample PlanSpec covers the shape). */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      wMax: Long): DataFrame = {
    require(wMax > 0 && wMax < (1L << 46),
      s"need 0 < wMax < 2^46 (cross-multiplication bound), got $wMax")
    val h16 = conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")
    val w = least(greatest(weight.cast("long"), lit(0L)), lit(wMax))
    df.where(h16 * wMax < w * 65536L)
  }

  /** Sliding-window chunking (the RAG/embedding-indexing shape): split each
    * document's token sequence into windows of `size` tokens starting every
    * `stride` tokens (stride < size ⇒ overlap); the last window may be
    * shorter, zero-token docs produce no chunks. Chunk count is the exact
    * integer 1 + max(0, ⌈(n − size)/stride⌉), so every window starts within
    * the document. Pure per-row column algebra (tokenize → bounded sequence
    * explode → slice) — zero shuffle at any corpus size; both engines
    * replay the same arithmetic (the ceil-div numerator is kept non-negative
    * on both sides because Spark's `div` truncates where DuckDB's `//`
    * floors). */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    // tokenize once under an alias, THEN take the size (the repetitionBp
    // rule: two references in one projection = two tokenizations per row)
    docs.select(col(idCol).as("doc_id"),
        graft.functions.TextOps.tokens(col(textCol)).as("__ts"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__ts")).cast("long"))
      .where(col("__n") > 0)
      .withColumn("__nc",
        lit(1L) + greatest(lit(0L), expr(s"(__n - $size + $stride - 1) div $stride")))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"), col("__ts"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("__ts"),
          (col("chunk_id") * stride + 1).cast("int"), lit(size))).as("chunk_text"))
  }

  /** Epoch upsampling — the "N epochs over source X" arm of mixture
    * weighting (down-weighting is [[mixtureSample]]): replicate every row of
    * stratum s `factor(s)` times with a deterministic `epoch` column
    * (0..factor−1), so downstream shuffles can keep the copies apart.
    * Factor 0 excludes the stratum; strata not listed get `defaultFactor`.
    *
    * Scale: a scan-side sequence explode — output grows by exactly the
    * mixture's token multiplier and nothing shuffles; the epoch column is
    * what makes the replication re-runnable (no RNG, no monotonically_
    * increasing_id). */
  def upsampleEpochs(df: DataFrame, stratum: Column,
      factors: Seq[(String, Int)], defaultFactor: Int = 1): DataFrame = {
    require((defaultFactor +: factors.map(_._2)).forall(_ >= 0), "factors are >= 0")
    val f = factors.foldRight(lit(defaultFactor)) { case ((s, k), acc) =>
      when(stratum === s, lit(k)).otherwise(acc)
    }
    // filter BEFORE the sequence: Spark infers a negative step for
    // sequence(0, -1) rather than returning empty
    df.withColumn("__f", f).where(col("__f") > 0)
      .withColumn("__e", explode(sequence(lit(0), col("__f") - 1)))
      .withColumn("epoch", col("__e").cast("long"))
      .drop("__f", "__e")
  }

  /** Deterministic train/val/test split: each row gets a split label from
    * its content-hash bucket in [0, 10000) basis points — `splits` lists
    * (label, bp) spans summing to exactly 10000, assigned in order. The
    * canonical held-out-set maker: re-runnable bit-identically on any
    * engine/cluster (no RNG), and a document NEVER migrates between splits
    * when the corpus grows (membership is a fact of the id alone —
    * df.randomSplit can't promise either). Zero shuffle: one scan-side
    * hash predicate, same bucket arithmetic as [[mixtureSample]]. */
  def splitAssign(df: DataFrame, key: Column, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) && splits.map(_._2).sum == 10000,
      s"split bps must be positive and sum to 10000, got $splits")
    // same arithmetic as mixtureSample, division-free: the row's bucket is
    // below boundary `hi` iff h16·10000 < hi·65536 (h16 = first 4 md5 hex
    // chars), so the label is a chain of integer comparisons both engines
    // replay exactly
    val h = conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")
    val bounds = splits.map(_._2).scanLeft(0)(_ + _)
    val lbl = splits.zip(bounds.tail).init.foldRight(lit(splits.last._1)) {
      case (((label, _), hi), acc) =>
        when(h * 10000L < hi.toLong * 65536L, lit(label)).otherwise(acc)
    }
    df.withColumn("split", lbl)
  }

  /** Deterministic training-order shuffle: every row's EXACT 0-based global
    * position in md5(seed:id) order — the reproducible corpus shuffle of a
    * pretraining run (new seed ⇒ new epoch order; same seed ⇒ the same
    * permutation on any engine, partitioning, or cluster size).
    *
    * Exact WITHOUT a global sort: two-level rank assembly. A histogram on
    * the hash's first `prefixLen` hex chars (16^prefixLen buckets — one
    * tiny agg, cumulated driver-side, broadcast back) gives each bucket
    * its global starting offset; a bucket-PARTITIONED window ranks within
    * buckets; position = offset + within-bucket rank. At 100 TB raise
    * `prefixLen` so each bucket fits one task's sort (prefixLen 4 = 65536
    * buckets ≈ 1.5 GB/bucket); the histogram stays trivially collectable.
    * Hash ties (35-digit md5 prefix collisions) break by id, so the order
    * is total and both engines agree. */
  def trainOrder(df: DataFrame, idCol: String, seed: String,
      prefixLen: Int = 2): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8)
    val base = df
      .withColumn("__h", md5(concat(lit(s"$seed:"), col(idCol).cast("string"))))
      .withColumn("__b", conv(substring(col("__h"), 1, prefixLen), 16, 10).cast("long"))
    val spark = df.sparkSession
    import spark.implicits._
    val hist = base.groupBy("__b").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val offsets = hist.map(_._1).zip(hist.scanLeft(0L)(_ + _._2))
    val offDf = broadcast(offsets.toSeq.toDF("__b", "__off"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h").asc, col(idCol).asc)
    base.join(offDf, "__b")
      .withColumn("pos", col("__off") + row_number().over(w).cast("long") - 1L)
      .drop("__h", "__b", "__off")
  }

  /** Deterministic contrastive NEGATIVE sampling: for every row, k "random
    * other" rows — the negatives side of a contrastive-pair builder
    * (anchor, negative) for embedding/reranker training. Negative j of x
    * is the row at position (pos(x) + j) mod N in the [[trainOrder]]
    * permutation, j = 1..min(k, N−1): the hash order is already the
    * corpus's deterministic shuffle, so successor strides are as
    * well-mixed as fresh draws while staying engine-replayable,
    * duplicate-free across j, and never self-pairing (j < N). Reruns,
    * engines, and cluster sizes agree row-for-row (spec'd vs an
    * independent driver-side replay).
    *
    * Scale: trainOrder's bucket-histogram rank assembly (never a global
    * sort) + one bounded sequence explode (k rows per anchor) + ONE
    * position-keyed equi-join — linear in k·N. N is one count() action.
    * Emits (idCol, j, neg_id). */
  def negativeSamples(df: DataFrame, idCol: String, k: Int, seed: String,
      prefixLen: Int = 2): DataFrame = {
    require(k >= 1)
    val pos = trainOrder(df.select(col(idCol)), idCol, seed, prefixLen)
      .localCheckpoint(false)
    val n = pos.count()
    if (n <= 1L) // no other rows exist: empty result with the right schema
      return pos.where(lit(false))
        .select(col(idCol), lit(1L).as("j"), col(idCol).as("neg_id"))
    val kk = math.min(k.toLong, n - 1L)
    pos.select(col(idCol), col("pos"),
        explode(sequence(lit(1L), lit(kk))).as("j"))
      .withColumn("npos", (col("pos") + col("j")) % n)
      .join(pos.select(col(idCol).as("neg_id"), col("pos").as("npos")), "npos")
      .select(col(idCol), col("j"), col("neg_id"))
  }

  /** Snapshot DIFF (incremental recrawl update): classify every document id
    * across two corpus snapshots as `unchanged` / `modified` (same id, new
    * content hash) / `added` / `removed`. The content comparison is by
    * md5, so a 100 TB diff never compares bodies — ONE keyed full outer
    * join on the id over two scans, the minimal shape for "what changed
    * since the last crawl" (feeds incremental dedup/indexing downstream). */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // explicit presence markers: a NULL body hashes to NULL, which must not
    // read as row absence (the mergeWith presence-marker rule)
    val a = prev.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__ha"),
      lit(1).as("__ia"))
    val b = next.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__hb"),
      lit(1).as("__ib"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__ia").isNull, lit("added"))
          .when(col("__ib").isNull, lit("removed"))
          .when(col("__ha") <=> col("__hb"), lit("unchanged"))
          .otherwise(lit("modified")).as("status"))
  }

  /** Quality-budget selection ("curate to a token budget"): keep the
    * highest-scoring documents whose cumulative token count stays under
    * `budget`, in the deterministic total order (score DESC, md5-prefix ASC,
    * id ASC) — a row is kept iff the token sum of all STRICTLY-preceding
    * rows is < budget (so the row that crosses the budget line is kept).
    * The md5 prefix shuffles equal-scored docs so the boundary cut is an
    * unbiased, re-runnable sample rather than an id-order artifact.
    *
    * Scale: selecting "the best B tokens" of a 100 TB corpus must NOT be a
    * global sort. This runs a three-level exact threshold instead:
    * (1) a per-score histogram (integer scores — a bounded key domain) is
    * cumulated on the driver to find the crossing score; (2) the crossing
    * score's docs alone are histogrammed again over their 65536 md5-prefix
    * buckets to find the crossing bucket; (3) only the residual bucket —
    * expected |boundary| / 65536 docs — pays a window sort. Every kept row
    * is exactly the row the one-big-window definition keeps (the DuckDB
    * oracle runs that definition verbatim); no sort ever sees more than
    * one hash bucket of one score group. */
  def tokenBudget(df: DataFrame, idCol: String, scoreCol: String, tokCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0)
    val base = df.select(col(idCol).as("doc_id"),
        col(scoreCol).cast("long").as("score"), col(tokCol).cast("long").as("n_tok"),
        substring(md5(col(idCol).cast("string")), 1, 4).as("__h16"))
      .localCheckpoint(eager = false) // shared by both histogram jobs + the result
    val out = base.drop("__h16")
    // level 1: per-score token totals, cumulated driver-side in score-desc order
    val hist = base.groupBy("score").agg(sum("n_tok").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val cum = hist.scanLeft(0L)(_ + _._2)
    if (cum.last <= budget) return out // everything fits
    hist.indices.find(i => cum(i) < budget && cum(i) + hist(i)._2 > budget) match {
      case None =>
        // the budget line falls exactly on a score-group boundary
        val j = hist.indices.find(i => cum(i) >= budget).get
        out.where(col("score") > hist(j)._1)
      case Some(ci) =>
        val c = hist(ci)._1
        val rem1 = budget - cum(ci) // 0 < rem1 < group total
        val above = out.where(col("score") > c)
        val bnd = base.where(col("score") === c)
        // level 2: 65536 md5-prefix buckets of the crossing score group only
        val h2 = bnd.groupBy("__h16").agg(sum("n_tok").as("t")).collect()
          .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
        val cum2 = h2.scanLeft(0L)(_ + _._2)
        h2.indices.find(i => cum2(i) < rem1 && cum2(i) + h2(i)._2 > rem1) match {
          case None =>
            val j = h2.indices.find(i => cum2(i) >= rem1).get
            above.unionByName(bnd.where(col("__h16") < h2(j)._1).drop("__h16"))
          case Some(bi) =>
            val b = h2(bi)._1
            val rem2 = rem1 - cum2(bi)
            // level 3: the residual bucket alone pays a window sort
            val w = Window.partitionBy("__h16").orderBy(col("doc_id").asc)
              .rowsBetween(Window.unboundedPreceding, -1)
            val resid = bnd.where(col("__h16") === b)
              .withColumn("__prev", coalesce(sum(col("n_tok")).over(w), lit(0L)))
              .where(col("__prev") < rem2)
              .drop("__h16", "__prev")
            above.unionByName(bnd.where(col("__h16") < b).drop("__h16"))
              .unionByName(resid)
        }
    }
  }

  /** Curriculum bucketing: assign every document an exact empirical-CDF
    * bucket of its integer score — bucket = (buckets · |{score' < score}|)
    * div N — WITHOUT a global sort and WITHOUT a tie-break: equal scores
    * always share a bucket (value-based quantiles, the property ntile()
    * lacks), so the assignment is a pure fact of the score multiset.
    * The length/difficulty-ordered shard assignment of curriculum training.
    *
    * Scale: one per-score count aggregation; the running sum runs over the
    * score HISTOGRAM (bounded integer domain — thousands of rows at any
    * corpus size, hence the deliberate single-partition window), broadcast
    * back as a (score → bucket) map join. The document table is touched by
    * exactly one shuffle-free scan + one keyed agg. */
  def curriculumBuckets(df: DataFrame, idCol: String, scoreCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val base = df.select(col(idCol).as("doc_id"), col(scoreCol).cast("long").as("score"))
    val n = base.count()
    if (n == 0L) return base.withColumn("bucket", lit(0L)).where(lit(false))
    val w = Window.orderBy(col("score").asc).rowsBetween(Window.unboundedPreceding, -1)
    val hist = base.groupBy("score").agg(count(lit(1)).as("c"))
      .withColumn("lt", coalesce(sum(col("c")).over(w), lit(0L)))
      .select(col("score"), expr(s"(lt * $buckets) div ${n}L").as("bucket"))
    base.join(broadcast(hist), "score").select("doc_id", "score", "bucket")
  }

  /** Per-domain QUOTA cap (RefinedWeb/C4-style source balancing): keep at
    * most `cap` documents per domain, chosen by deterministic content-hash
    * order (md5 of the id, then the id — an unbiased, re-runnable "random"
    * sample with no RNG). Output keeps the input columns plus the kept
    * row's per-domain rank `rk` (1..cap).
    *
    * Scale: ONE declarative window — Catalyst compiles the rank filter to a
    * map-side `WindowGroupLimit Partial` (PlanSpec pins it), so every input
    * task pre-trims to `cap` rows per domain BEFORE the shuffle and a hot
    * domain (a crawl's top site can be 1%+ of all rows) reaches its reducer
    * as at most tasks·cap rows, never the domain's total. A hand-salted
    * two-phase split would add a second shuffle to bound exactly the same
    * quantity (measured identical results; the optimizer already owns this
    * one). */
  def domainCap(df: DataFrame, domain: Column, id: Column, cap: Int): DataFrame = {
    require(cap > 0)
    require(!df.columns.contains("rk"),
      "domainCap emits a `rk` rank column; rename the input's `rk` first")
    val ordH = substring(md5(id.cast("string")), 1, 8)
    val w = Window.partitionBy(domain).orderBy(ordH.asc, id.asc)
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= cap)
  }

  /** DSIR-style importance score (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): rank raw documents by how much more likely
    * their tokens are under a TARGET distribution than under the raw-corpus
    * distribution. Features are HASHED token buckets (the DSIR trick that
    * makes the distribution table FIXED-SIZE — `buckets` counters, however
    * large the vocabulary), hashed portably
    * ([[graft.dedup.Dedup.portableHash64]], sign cleared, mod buckets).
    * The log-likelihood ratio is INTEGER-EXACT: per token,
    * floorlog2(1 + tgt_b) − floorlog2(1 + raw_b) via the bin()-length
    * trick (no float log anywhere), summed per document. Positive score =
    * looks more like the target than like the background.
    *
    * Scale: the bucket table is `buckets` rows (broadcastable at any
    * corpus size — unlike a raw vocabulary join); one explode, one
    * bucket-keyed count (map-side combinable), one broadcast join back,
    * one per-doc sum. Docs with zero tokens have no ratio and are absent
    * (the oracle's unnest semantics). */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      target: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2)
    val toks = docs.select(col(idCol).as("doc_id"), target.as("__tgt"),
        explode(graft.functions.TextOps.tokens(col(textCol))).as("t"))
      .select(col("doc_id"), col("__tgt"),
        pmod(graft.dedup.Dedup.portableHash64(col("t"))
          .bitwiseAND(lit(Long.MaxValue)), lit(buckets.toLong)).as("bk"))
      .localCheckpoint(eager = false) // scanned twice: bucket counts + rescore
    val cnt = toks.groupBy("bk").agg(
      count(lit(1)).as("raw"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("tgt"))
    toks.join(broadcast(cnt), Seq("bk"))
      .groupBy("doc_id")
      .agg(sum((length(bin(col("tgt") + 1L)) - length(bin(col("raw") + 1L)))
        .cast("long")).as("dsir_score"))
  }

  /** Preference-pair assembly (the RLHF/reranker chosen-vs-rejected shape):
    * within each group, pair the TOP `sideCap` rows by score against the
    * BOTTOM `sideCap`, keeping pairs whose score gap is ≥ minGap — emits
    * (grp, id_chosen, id_rejected, score_chosen, score_rejected). Ties
    * rank by id asc on both sides (deterministic); a row landing in both
    * trims (tiny groups) never pairs with itself.
    *
    * Scale: the within-group pair space is quadratic, so BOTH sides are
    * trimmed FIRST — two per-group windows whose map-side WindowGroupLimit
    * pre-trims each task to sideCap rows (the domainCap shape) — and only
    * the ≤ sideCap² bounded cross follows, group-keyed. The corpus is
    * never self-joined untrimmed at any size. */
  def preferencePairs(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, minGap: Long, sideCap: Int): DataFrame = {
    require(sideCap > 0 && minGap >= 0, "need sideCap > 0 and minGap >= 0")
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(scoreCol).cast("long").as("score"))
    val wTop = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val wBot = Window.partitionBy("grp").orderBy(col("score").asc, col("id").asc)
    val top = base.withColumn("__r", row_number().over(wTop))
      .where(col("__r") <= sideCap)
      .select(col("grp"), col("id").as("id_chosen"), col("score").as("score_chosen"))
    val bot = base.withColumn("__r", row_number().over(wBot))
      .where(col("__r") <= sideCap)
      .select(col("grp"), col("id").as("id_rejected"), col("score").as("score_rejected"))
    top.join(bot, "grp")
      .where(col("score_chosen") >= col("score_rejected") + minGap &&
        col("id_chosen") =!= col("id_rejected"))
  }
}
