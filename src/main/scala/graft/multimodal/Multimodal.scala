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

  /** A codec SESSION — the expensive-to-open handle real codecs have
    * (decoder contexts, GPU buffers, JNI state). The batched decode path
    * opens one per batch instead of one per row; the stub records openings
    * so specs can assert the amortization actually happens. */
  final class CodecSession {
    def decode(payload: Array[Byte]): (Int, Int, Int) = FakeCodec.decode(payload)
  }

  /** Batched columnar decode — the Arrow/`mapInPandas` shape on the JVM:
    * each partition's rows drain through fixed-size batches, one
    * [[CodecSession]] per batch, so per-call codec setup amortizes across
    * `batchSize` rows exactly like pandas-batch UDFs amortize interpreter
    * round-trips. Values are identical to [[extractMeta]] (the equality
    * spec pins it); batching is purely an execution-shape choice. */
  def extractMetaBatched(media: DataFrame, batchSize: Int = 256,
      batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)(
      implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(math.max(batchSize, 1)).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        val session = new CodecSession
        batch.iterator.map { r =>
          val (w, h, f) = session.decode(r.payload)
          MediaMeta(r.doc_id, r.payload.length.toLong, w, h, f)
        }
      }
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

  case class ResizedRow(doc_id: Long, width: Int, height: Int, payload: Array[Byte])
  case class FrameRow(doc_id: Long, frame_idx: Int, payload: Array[Byte])
  case class EmbeddingRow(doc_id: Long, embedding: Array[Float])

  /** Resize pass (STUB transform: a real deployment swaps the per-row body
    * for an image library call). Downscales metadata to fit (maxW, maxH)
    * preserving aspect ratio; payload passes through untouched — the Spark
    * contract (schema, batching, pruned columns) is the real part. */
  def resize(media: DataFrame, maxW: Int, maxH: Int)(
      implicit spark: SparkSession): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w0, h0, _) = FakeCodec.decode(r.payload)
        val w = math.max(w0, 1); val h = math.max(h0, 1)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        ResizedRow(r.doc_id, (w * scale).toInt, (h * scale).toInt, r.payload)
      }
    }
  }

  /** Frame sampling: one output row per sampled frame (every `stride`-th of
    * the decoded frame count) — the row-explosion shape of video pipelines.
    * Frame payload is a deterministic byte slice stand-in for a real
    * frame-extraction call. */
  def sampleFrames(media: DataFrame, stride: Int)(
      implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, _, nFrames) = FakeCodec.decode(r.payload)
        (0 until nFrames by math.max(stride, 1)).iterator.map { i =>
          val n = r.payload.length
          val from = if (n == 0) 0 else (i * 31) % n
          FrameRow(r.doc_id, i, java.util.Arrays.copyOfRange(
            r.payload, from, math.min(from + 16, n)))
        }
      }
    }
  }

  /** 64-bit perceptual hash (aHash family) over the decoded payload — the
    * image-dedup signature every multimodal training pipeline computes:
    * decode the payload to a "pixel" sequence (STUB: utf-8 code points —
    * a real deployment decodes luminance; the hash pipeline downstream is
    * unchanged), fold the pixels into 64 positional stripes (position mod
    * 64), and set bit j iff stripe j's mean exceeds the global mean — the
    * average-hash rule, integer-exact via the cross-multiplied comparison
    * s_j·N > S·n_j. Bits pack into one signed long (bit 63 via
    * Long.MinValue, the SimHash packing convention), so the signature —
    * and therefore the pair set — replays bit-identically in SQL.
    *
    * Emits (id, phash). Payloads shorter than 64 pixels leave their
    * missing stripes at bit 0; empty/null payloads emit NO row (the
    * aggregation form had no pixel rows to group). Long bound: s_j·N
    * stays inside 2⁶³ through ~16 M pixels per payload.
    *
    * Scale: ONE zero-shuffle projection — the whole aHash chain runs as a
    * single codegen'd pass per document ([[graft.functions.NativeOps
    * .aHash64]]). The previous declarative form (split('') → posexplode →
    * ascii → doc-keyed stripe agg → doc-keyed total → pack) materialized
    * one row per CHARACTER — 18 s of task time at sf0.1 for the same
    * signatures; the expression is parity-spec'd bit-identical against
    * that chain on multibyte/surrogate/empty adversaries. */
  def pHash(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val text = decode(col(payloadCol), "UTF-8")
    // length >= 1 keeps the aggregation form's row set: an empty or null
    // payload had no pixel rows, so it must emit no signature row here
    media.where(length(text) >= 1)
      .select(col(idCol).as("id"),
        graft.functions.NativeOps.aHash64(text).as("phash"))
  }

  /** Perceptual-hash near-duplicate pairs: [[pHash]] signatures paired at
    * hamming ≤ maxHam through the shared
    * [[graft.dedup.Dedup.hammingBandPairs]] pigeonhole banding — the
    * multimodal counterpart of text SimHash dedup. Emits (id_a, id_b, ham). */
  def pHashPairs(media: DataFrame, maxHam: Int = 3, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame =
    graft.dedup.Dedup.hammingBandPairs(
      pHash(media, idCol, payloadCol), maxHam, sigCol = "phash")

  /** Feature-extraction pass: payload → fixed-dim embedding (deterministic
    * hash-projection stub standing in for a vision/audio encoder). Output
    * feeds graft.sim.Ann directly — the media → embedding → ANN pipeline. */
  def embed(media: DataFrame, dim: Int = 64)(
      implicit spark: SparkSession): Dataset[EmbeddingRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i) & 0xFF
          v((b + i) % dim) += ((b % 7) - 3).toFloat
          i += 1
        }
        EmbeddingRow(r.doc_id, v)
      }
    }
  }
}
