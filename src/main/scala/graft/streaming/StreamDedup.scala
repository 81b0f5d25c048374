package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate filtering (SURVEY.md §2.5): the online form of
  * [[graft.dedup.Dedup.minhashLsh]] — documents arrive on a stream and must
  * be admitted or dropped NOW, against everything already admitted, without
  * re-scanning history. The index that batch LSH builds as a table becomes a
  * keyed STATE STORE: one state entry per minhash band bucket, holding the
  * first document that claimed it.
  *
  * Scale shape: state is partitioned by band key (the same equi-join key the
  * batch path shuffles on), so the store shards horizontally and each
  * micro-batch touches only the buckets its documents hash into.
  */
object StreamDedup {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** Per-(document, band) verdict: `first_id` is the document that owns the
    * bucket; a document with `first_id != doc_id` on ANY band collided with
    * an earlier (or same-batch, lower-id) near-duplicate. */
  case class BandVerdict(doc_id: Long, band_key: Long, first_id: Long)

  /** Stage 1 — the stateful core: explode each document into its minhash
    * band keys, then a flatMapGroupsWithState per band bucket records the
    * first claimant and emits one verdict row per (doc, band). Within a
    * micro-batch the lowest doc_id claims the bucket (deterministic).
    *
    * Note: a document dropped for colliding on one band still claims its
    * OTHER, fresh buckets — the standard conservative streaming-LSH behavior
    * (later docs near-duplicate to a dropped doc are also dropped, mirroring
    * the batch path's transitive clusters). */
  def bandVerdicts(docs: Dataset[Doc], k: Int = 3, numPerm: Int = 16, bands: Int = 4)(
      implicit spark: SparkSession): Dataset[BandVerdict] = {
    import spark.implicits._
    val banded = docs.select(col("doc_id"),
      graft.dedup.Dedup.bandKeyArray(col("text"), k, numPerm, bands).as("bks"))
    // Sub-k-token docs have no shingles → no band keys (matching the batch
    // path's size(sh) > 0 filter). They bypass the state store entirely and
    // pass through with a self-owned verdict (keep=true downstream) — the
    // union keeps the query single-stateful-operator.
    val shorts = banded.where(size(col("bks")) === 0)
      .select(col("doc_id"), lit(0L).as("band_key"), col("doc_id").as("first_id"))
      .as[BandVerdict]
    val keyed = banded.where(size(col("bks")) > 0)
      .select(col("doc_id"), explode(col("bks")).as("band_key"))
      .as[(Long, Long)]
    keyed.groupByKey(_._2)
      .flatMapGroupsWithState[Long, BandVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (bkey, rows, state: GroupState[Long]) =>
          val ids = rows.map(_._1).toArray.sorted
          val first = state.getOption.getOrElse(ids.head)
          if (!state.exists) state.update(first)
          ids.iterator.map(id => BandVerdict(id, bkey, first))
      }
      .union(shorts)
  }

  /** Stage 2 — collapse band verdicts to per-document keep/drop (run inside
    * foreachBatch: the cross-band reduction is a plain batch aggregation per
    * micro-batch, which keeps the streaming query single-stateful-operator).
    * keep = no band bucket owned by another document. */
  def collapseVerdicts(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("doc_id")
      .agg(min((col("first_id") === col("doc_id")).cast("int")).cast("boolean").as("keep"))

  /** Streaming EXACT dedup: the online form of [[graft.dedup.Dedup.exact]] —
    * md5 content identity, first arrival claims the key, re-deliveries
    * within the watermark delay are dropped. State is one entry per
    * distinct content hash, bounded by the watermark (the batch path's
    * groupBy(h) key space becomes the state-store key space — same
    * partitioning, shards horizontally). The content-identity column `h`
    * stays in the output ON PURPOSE: the batch operator exposes it too
    * (its oracle groups by `md5(text) AS h`), and the bridge spec matches
    * keeper key spaces through it. */
  def exactDedup(docs: Dataset[Doc], delay: String = "10 minutes"): DataFrame =
    docs.toDF()
      .withWatermark("ts", delay)
      // '' sentinel for null text — the batch operator's convention
      .withColumn("h", coalesce(md5(col("text")), lit("")))
      .dropDuplicatesWithinWatermark("h")

  /** One-operator alternative: treat the FULL minhash signature as a dedup
    * key and let Spark's own watermarked dedup state handle it — near-dups
    * (which agree on all `numPerm` minima at high similarity) collapse to
    * one signature; state is bounded by the watermark delay. The trade:
    * coarser matching (all-band agreement), but zero custom state code. */
  def signatureDedup(docs: DataFrame, k: Int = 3, numPerm: Int = 16,
      delay: String = "10 minutes"): DataFrame = {
    // Sub-k-token docs have no signature (bandKeyArray → empty array, whose
    // concat_ws is "" for every such doc); fall back to exact-text identity
    // for them so only literal duplicates collapse, never all short docs.
    val bks = graft.dedup.Dedup.bandKeyArray(col("text"), k, numPerm, bands = 1)
    docs.withWatermark("ts", delay)
      .withColumn("sig_key",
        when(size(bks) > 0, xxhash64(concat_ws(",", bks)))
          .otherwise(xxhash64(lit("__graft_short__"), col("text"))))
      .dropDuplicatesWithinWatermark("sig_key")
      .drop("sig_key")
  }
}
