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
}
