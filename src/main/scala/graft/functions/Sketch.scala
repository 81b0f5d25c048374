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
