package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-friendly sketches (SURVEY.md §2.4): fixed-size summaries with
  * DETERMINISTIC md5-derived hash rows, so estimates are a pure fact of the
  * data — reruns, partitionings, micro-batches, and engines agree, and the
  * DuckDB oracle replays the cell arithmetic verbatim.
  */
object Sketch {

  private def cell(r: Column, k: Column, width: Int): Column =
    conv(substring(md5(concat(r.cast("string"), lit(":"), k)), 1, 8), 16, 10)
      .cast("long") % width

  /** Count-min sketch build (Cormode–Muthukrishnan 2005): a `depth`×`width`
    * table of counters where row r counts items at cell md5(r:key) mod
    * width. Returns `(r, cell, cnt)` — at most depth·width rows NO MATTER
    * the input size: the fixed-memory frequency summary for key spaces too
    * large to count exactly.
    *
    * Scale: one key-keyed pre-agg (map-side combinable) collapses the input
    * to distinct keys BEFORE the depth-way explode, then one (r,cell) agg
    * produces the sketch. Sketches MERGE by cell-wise sum (spec'd) — the
    * property that makes one per partition/micro-batch/day compose into
    * the global summary without touching raw data again. */
  def cmsBuild(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 1)
    df.select(key.cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
      .select(explode(array((0 until depth).map(lit(_)): _*)).as("r"), col("k"), col("c"))
      .select(col("r"), cell(col("r"), col("k"), width).as("cell"), col("c"))
      .groupBy("r", "cell").agg(sum("c").as("cnt"))
  }

  /** Portable HyperLogLog registers (Flajolet et al. 2007): the fixed-size
    * (2^b rows) cardinality summary. Each key hashes once
    * ([[graft.dedup.Dedup.portableHash64]] with the sign bit cleared — a
    * pure fact of the key bytes, so engines/reruns/partitionings agree);
    * bucket = low b bits, and the register is the max over the bucket's
    * keys of rho = leading-zero-count+1 of the remaining 63−b bits,
    * computed WITHOUT floats as `(64−b) − bitlength(rest)` via the bin()
    * floor-log2 trick (rest = 0 ⇒ rho = 64−b). Empty buckets emit 0.
    *
    * Registers MERGE by bucket-wise max (spec'd) — one sketch per
    * partition/micro-batch/day composes into the global summary without
    * rescanning. Scale: one keyed max-agg over the input, THE shape for
    * counting distincts in a 100 TB key space: the shuffle carries 2^b
    * rows, not the keys. */
  def hllRegisters(df: DataFrame, key: Column, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16)
    val m = 1L << b
    val spark = df.sparkSession
    val maxRho = 64 - b
    val regs = df
      .select(graft.dedup.Dedup.portableHash64(key.cast("string"))
        .bitwiseAND(lit(Long.MaxValue)).as("h"))
      .select(pmod(col("h"), lit(m)).as("bucket"), expr(s"h div ${m}L").as("rest"))
      .select(col("bucket"),
        when(col("rest") === 0L, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin(col("rest")))).cast("int").as("rho"))
      .groupBy("bucket").agg(max("rho").as("reg"))
    spark.range(m).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("reg"), lit(0)).cast("int").as("reg"))
  }

  /** HyperLogLog raw-estimate readout, INTEGER-EXACT: with R = 64−b,
    *
    *   n_est = (alpha_num · m² · 2^R) div (alpha_den · Σ_j 2^(R − reg_j))
    *
    * — the classic alpha·m²/Σ2^(−reg) with the float 2^(−reg) harmonic sum
    * scaled by 2^R into exact integers (each term ≤ 2^R; the sum runs in
    * DECIMAL(38,0) because m·2^R can reach 2^64) and alpha ≈ 0.709 (m=64)
    * as the rational alpha_num/alpha_den, so the floor division replays
    * bit-identically in SQL. No small/large-range corrections — this is
    * the raw estimator, accurate in the n ≫ 2.5·m regime (spec pins the
    * tolerance against the exact count). */
  def hllEstimate(regs: DataFrame, b: Int = 6,
      alphaNum: Long = 709, alphaDen: Long = 1000): DataFrame = {
    require(b >= 4 && b <= 16)
    val m = 1L << b
    val maxRho = 64 - b
    regs
      .select(expr(s"CAST(shiftleft(1L, $maxRho - reg) AS DECIMAL(38,0))").as("t"))
      .agg(sum("t").as("s"))
      .select(expr(
        s"CAST(CAST($alphaNum AS DECIMAL(38,0)) * ${m * m}L * CAST(shiftleft(1L, $maxRho) AS DECIMAL(38,0)) " +
        s"div (CAST($alphaDen AS DECIMAL(38,0)) * s) AS BIGINT)").as("n_est"))
  }

  /** Point-estimate lookup: each probe key's count estimate is the MIN of
    * its `depth` cells (missing cell = 0). The classic CMS guarantee holds
    * exactly: est >= true count always, and exceeds it only by other keys
    * colliding into all depth cells (spec pins both). Probes join the
    * sketch keyed on (r, cell) — depth rows per probe, never a scan of the
    * summarized data. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 1)
    probes.select(key.cast("string").as("k"))
      .select(col("k"), explode(array((0 until depth).map(lit(_)): _*)).as("r"))
      .select(col("k"), col("r"), cell(col("r"), col("k"), width).as("cell"))
      .join(sketch, Seq("r", "cell"), "left")
      .groupBy("k").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** DETERMINISTIC BLOOM FILTER build: the set-membership pre-filter that
    * turns a 100 TB join into a scan-side drop. `k` md5-derived bit
    * positions per key over an `m`-bit space; the sketch is the DISTINCT
    * set-bit table `(bit)` — ≤ min(k·|keys|, m) rows, merge = union
    * distinct. Same portability argument as CMS/HLL: the bits are a pure
    * fact of the key bytes, so engines and reruns agree bit-for-bit. */
  def bloomBuild(df: DataFrame, key: Column, m: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= 16 && m >= 2)
    df.select(key.cast("string").as("kk"))
      .select(col("kk"), explode(array((0 until k).map(lit(_)): _*)).as("r"))
      .select(cell(col("r"), col("kk"), m).as("bit"))
      .distinct()
  }

  /** Bloom PRE-FILTER: keep probe rows whose key has ALL `k` bits set —
    * possible members (no false negatives by construction; false positives
    * bounded by the classic (1−e^(−kn/m))^k). The bit table packs into
    * ⌈m/64⌉ words shipped as a LITERAL map inside the predicate, so the
    * probe side is a pure scan filter: ZERO shuffles, zero joins, no
    * distinct — the whole point at 100 TB is dropping rows at the scan
    * before anything exchanges (Spark's own runtime bloom pushdown, made
    * explicit, deterministic, and mergeable across sources). `m` is capped
    * so the literal stays codegen-friendly; the collect is sketch-sized by
    * contract (≤ m/64 longs), the same class as broadcasting CMS cells. */
  def bloomFilter(probe: DataFrame, key: Column, bits: DataFrame, m: Int, k: Int): DataFrame = {
    val marked = bloomMark(probe, key, bits, m, k, "__bfm")
    marked.where(col("__bfm")).drop("__bfm")
  }

  /** [[bloomFilter]]'s predicate as a kept BOOLEAN column instead of a
    * filter — the membership mark and the untouched row together, so one
    * scan can compute pre- and post-filter aggregates (count(*) vs
    * count_if(mark)) that the filter form needs two scans for. Identical
    * packed-word literal predicate; null keys mark false. */
  def bloomMark(probe: DataFrame, key: Column, bits: DataFrame, m: Int, k: Int,
      markCol: String): DataFrame = {
    require(k >= 1 && k <= 16 && m >= 2 && m <= 65536,
      s"m=$m: the packed literal map wants m <= 65536 (1024 words)")
    // A NULL key hashes to a NULL bit (the md5 chain propagates it): it
    // contributes no set bits here, and on the probe side its null cells
    // fail the ALL-bits predicate — so null keys are uniformly "not a
    // member" on both sides, and the packed-word collect can't NPE on a
    // null slot.
    val words: Map[Long, Long] = bits.select(col("bit").cast("long"))
      .where(col("bit").isNotNull).collect()
      .map(_.getLong(0)).groupBy(_ / 64)
      .map { case (w, bs) => w -> bs.foldLeft(0L)((a, b) => a | (1L << (b % 64).toInt)) }
    if (words.isEmpty) probe.withColumn(markCol, lit(false))
    else {
      val wordMap = map(words.toSeq.sortBy(_._1)
        .flatMap { case (w, v) => Seq(lit(w), lit(v)) }: _*)
      val bitCols = (0 until k).map(j => s"__bit$j")
      val withBits = (0 until k).foldLeft(probe.withColumn("__bk", key.cast("string"))) {
        (df, j) => df.withColumn(s"__bit$j", cell(lit(j), col("__bk"), m))
      }
      val cond = (0 until k).map { j =>
        coalesce(element_at(wordMap, expr(s"__bit$j div 64L")), lit(0L))
          .bitwiseAND(expr(s"shiftleft(1L, cast(__bit$j % 64 AS int))")) =!= 0
      }.reduce(_ && _)
      // coalesce(false): a null key nulls the cells — the MARK form must
      // yield a definite false (the filter form's where() drops nulls)
      withBits.withColumn(markCol, coalesce(cond, lit(false)))
        .drop("__bk" +: bitCols: _*)
    }
  }

  /** Per-GROUP HyperLogLog registers — "distinct users per domain" at
    * sketch cost: same integer-exact register pipeline as [[hllRegisters]],
    * keyed by a group column. Registers are SPARSE (absent bucket ≡ reg 0;
    * a dense fill per group would be |groups|·m rows for no information);
    * [[hllEstimateByKey]] accounts for the missing buckets exactly. Merge
    * across partitions/batches = per-(g, bucket) max, as always. One
    * (g, bucket)-keyed agg — the same shuffle a per-group exact
    * count-distinct pays per DISTINCT VALUE, paid here per register. */
  def hllRegistersByKey(df: DataFrame, group: Column, key: Column, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16)
    val m = 1L << b
    val maxRho = 64 - b
    df.select(group.as("g"),
        graft.dedup.Dedup.portableHash64(key.cast("string"))
          .bitwiseAND(lit(Long.MaxValue)).as("h"))
      .select(col("g"), pmod(col("h"), lit(m)).as("bucket"), expr(s"h div ${m}L").as("rest"))
      .select(col("g"), col("bucket"),
        when(col("rest") === 0L, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin(col("rest")))).cast("int").as("rho"))
      .groupBy("g", "bucket").agg(max("rho").as("reg"))
  }

  /** Per-group readout of [[hllRegistersByKey]]: the [[hllEstimate]]
    * integer-exact formula with the sparse groups' missing buckets folded
    * in as (m − n_present)·2^R — bit-identical to a dense fill. */
  def hllEstimateByKey(regs: DataFrame, b: Int = 6,
      alphaNum: Long = 709, alphaDen: Long = 1000): DataFrame = {
    require(b >= 4 && b <= 16)
    val m = 1L << b
    val maxRho = 64 - b
    regs
      .select(col("g"), expr(s"CAST(shiftleft(1L, $maxRho - reg) AS DECIMAL(38,0))").as("t"))
      .groupBy("g").agg(sum("t").as("sp"), count(lit(1)).as("np"))
      .select(col("g"), expr(
        s"CAST(CAST($alphaNum AS DECIMAL(38,0)) * ${m * m}L * CAST(shiftleft(1L, $maxRho) AS DECIMAL(38,0)) " +
        s"div (CAST($alphaDen AS DECIMAL(38,0)) * (sp + CAST(${m}L - np AS DECIMAL(38,0)) " +
        s"* CAST(shiftleft(1L, $maxRho) AS DECIMAL(38,0)))) AS BIGINT)").as("n_est"))
  }

  /** LOG₂-HISTOGRAM quantile sketch build: bucket = ⌊log₂ v⌋ for v ≥ 1
    * (non-positive values pool in bucket −1), computed INTEGER-EXACTLY as
    * `length(bin(v)) − 1` — never float log, whose rounding at power-of-two
    * boundaries engines disagree on. Returns `(bucket, cnt)`: at most 65
    * rows no matter the input size — the fixed-memory quantile summary
    * whose guarantee is a bounded RELATIVE error (estimate within 2× of
    * the true quantile value, the bucket-width bound).
    *
    * Scale: one map-side-combinable agg over a scan — no global sort (an
    * exact percentile sorts or multi-passes). Sketches MERGE by bucket-wise
    * sum, so per-partition/per-day/per-micro-batch sketches compose into
    * the corpus summary without touching raw data again (spec'd, like CMS). */
  def histBuild(df: DataFrame, value: Column): DataFrame =
    df.select(value.cast("long").as("__v"))
      .select(when(col("__v") <= 0, lit(-1))
        .otherwise(length(bin(col("__v"))) - 1).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-GROUP [[histBuild]]: `(g, bucket, cnt)` — at most 65 rows per
    * group whatever the group's size; same integer-exact bucketing, same
    * bucket-wise-sum merge law per group. The per-language length-
    * distribution shape ("p90 tokens per lang") without a per-group sort. */
  def histBuildByKey(df: DataFrame, group: Column, value: Column): DataFrame =
    df.select(group.as("g"), value.cast("long").as("__v"))
      .select(col("g"), when(col("__v") <= 0, lit(-1))
        .otherwise(length(bin(col("__v"))) - 1).cast("int").as("bucket"))
      .groupBy("g", "bucket").agg(count(lit(1)).as("cnt"))

  /** Per-group readout of [[histBuildByKey]] at permille ranks `qsPm` —
    * the [[histQuantiles]] convention applied within each group (window
    * cumsum keyed by group, rank scan against the broadcast q ladder). */
  def histQuantilesByKey(sketch: DataFrame, qsPm: Seq[Int]): DataFrame = {
    require(qsPm.nonEmpty && qsPm.forall(q => q >= 1 && q <= 1000))
    val spark = sketch.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("bucket").rowsBetween(Long.MinValue, 0)
    val tot = sketch.groupBy("g").agg(sum("cnt").as("total"))
    val cum = sketch.withColumn("cum", sum("cnt").over(w)).join(tot, "g")
    cum.crossJoin(broadcast(qsPm.distinct.sorted.toDF("q_pm")))
      .where(col("cum") * 1000 >= col("q_pm") * col("total"))
      .groupBy("g", "q_pm").agg(min("bucket").as("bucket"))
      .select(col("g"), col("q_pm").cast("long").as("q_pm"),
        col("bucket").cast("long").as("bucket"),
        when(col("bucket") < 0, lit(0L))
          .otherwise(expr("shiftleft(1L, cast(bucket + 1 AS int)) - 1L")).as("est"))
  }

  /** Quantile estimates from a [[histBuild]] sketch at permille ranks
    * `qsPm`: the answer bucket is the smallest whose cumulative count
    * reaches ⌈q·total/1000⌉, and the estimate is its inclusive upper bound
    * 2^(b+1)−1 (bucket −1 → 0) — a deterministic convention both engines
    * replay bit-for-bit. The sketch is ≤65 rows, so the rank scan is a
    * broadcast-sized crossJoin + one small agg, never a job over the data. */
  def histQuantiles(sketch: DataFrame, qsPm: Seq[Int]): DataFrame = {
    require(qsPm.nonEmpty && qsPm.forall(q => q >= 1 && q <= 1000))
    val spark = sketch.sparkSession
    import spark.implicits._
    val total = sketch.agg(sum("cnt").as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket").rowsBetween(Long.MinValue, 0)
    val cum = sketch.withColumn("cum", sum("cnt").over(w)).crossJoin(total)
    cum.crossJoin(broadcast(qsPm.distinct.sorted.toDF("q_pm")))
      .where(col("cum") * 1000 >= col("q_pm") * col("total"))
      .groupBy("q_pm").agg(min("bucket").as("bucket"))
      .select(col("q_pm").cast("long").as("q_pm"), col("bucket").cast("long").as("bucket"),
        when(col("bucket") < 0, lit(0L))
          .otherwise(expr("shiftleft(1L, cast(bucket + 1 AS int)) - 1L")).as("est"))
  }
}
