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
}
