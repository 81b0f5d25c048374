package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.4): media as opaque `binary`
  * payloads + typed metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * [[FakeCodec.decode]] derives metadata deterministically from the payload
  * bytes. Everything around it is the real 100 TB shape: binary column +
  * typed struct schema, partition-parallel batched iteration via typed
  * `mapPartitions` (the JVM analogue of `mapInPandas` batches), and
  * column-pruned carry-through of ids.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** Deterministic stand-in for a media decoder. A real deployment swaps
    * this one function for an actual codec; the pipeline shape is unchanged. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (n % 640, (n * 7) % 480, n % 16)
    }
  }

  /** Attach a binary payload column (here: utf-8 of a text column — the
    * testdata has no true media; schema/partitioning are what matters). */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), encode(col(textCol), "utf-8").as("payload"))

  /** Decode/feature-extract pass: typed, partition-batched, no driver
    * involvement. */
  def extractMeta(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = FakeCodec.decode(r.payload)
        MediaMeta(r.doc_id, r.payload.length.toLong, w, h, f)
      }
    }
  }
}
