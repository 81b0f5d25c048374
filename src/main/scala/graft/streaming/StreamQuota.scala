package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain ingest quota (SURVEY.md §2.5): the online form of
  * [[graft.pipeline.Corpus.domainCap]] — admit at most `cap` documents per
  * domain over the stream's lifetime, deciding NOW, without re-scanning
  * history. The batch op picks the hash-order top-cap of a CLOSED corpus; an
  * open stream cannot reorder what already passed, so the streaming contract
  * is ARRIVAL-order admission (deterministic within a micro-batch: lowest id
  * first) — the standard ingest-quota semantics, stated as a deviation from
  * the batch op rather than papered over.
  *
  * Scale shape: state is ONE long per domain (the admitted count), keyed by
  * the same column the batch window shuffles on, so the store shards
  * horizontally and a domain at quota costs one state lookup per arrival. */
object StreamQuota {

  case class DocS(doc_id: Long, source: String)

  /** `rk` is the admission rank (1..cap), contiguous across micro-batches. */
  case class Admitted(doc_id: Long, source: String, rk: Int)

  def domainCap(docs: Dataset[DocS], cap: Int)(
      implicit spark: SparkSession): Dataset[Admitted] = {
    require(cap > 0)
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(cap - admitted, 0L).toInt
          val take = rows.toArray.sortBy(_.doc_id).take(room)
          if (take.nonEmpty) state.update(admitted + take.length)
          take.iterator.zipWithIndex.map { case (d, i) =>
            Admitted(d.doc_id, src, (admitted + i + 1).toInt)
          }
      }
  }
}
