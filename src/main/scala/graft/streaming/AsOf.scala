package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** As-of join (latest right row with ts <= left ts, per key) — the
  * event-attribution operator Spark SQL lacks natively.
  *
  * Compose-first form (SURVEY §2.5): union both sides tagged, sort by
  * (ts, side) inside a key window, and carry the last non-null right value
  * forward — one shuffle, fully codegen'd window. The right side must be
  * unique per (key, ts) (pre-aggregate ties deterministically).
  *
  * For the custom-operator tier of the same semantics see
  * [[org.apache.spark.sql.graft.AsOfJoinExec]] (merge scan over
  * co-partitioned sorted children), spec-verified equivalent.
  */
object AsOf {

  /** `l` keeps all its columns plus `asof_<rValueCol>` from the matching
    * right row (null when none). `ts` must be a long column in both.
    *
    * The right value rides inside a STRUCT marker: right rows carry a
    * non-null struct (whatever the value inside), left rows carry a null
    * struct — so `last(ignoreNulls)` skips exactly the left placeholders
    * and a genuinely NULL-valued right row still wins as "the latest right
    * row" (bare `last(value, ignoreNulls)` would skip it and mis-attribute
    * an older value; AsOfJoinExec holds the row itself, so the tiers must
    * agree on this). The right-side projection is built in ONE select —
    * a withColumn per payload column is a quadratic analysis anti-pattern. */
  def viaWindow(l: DataFrame, r: DataFrame, key: String, ts: String, rValueCol: String): DataFrame = {
    val payload = l.columns.filterNot(c => c == key || c == ts)
    val markerType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", r.schema(rValueCol).dataType)))
    val lt = l
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(markerType))
    val rt = r.select(
      Seq(col(key), col(ts), lit(0).as("__side"),
        struct(col(rValueCol).as("v")).as("__r")) ++
        payload.map(c => lit(null).cast(l.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.unionByName(rt.select(lt.columns.map(col): _*))
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn(s"asof_$rValueCol", col("__asof.v"))
      .drop("__side", "__r", "__asof")
  }

  // ---- stream-stream as-of -----------------------------------------------

  /** One tagged input event: side 0 = right (the attribution source, e.g. a
    * click carrying `value`), side 1 = left (the event to attribute, e.g. a
    * purchase identified by `id`). */
  case class AsOfEvent(key: Long, eventTime: Timestamp, side: Int, id: Long, value: Double)

  /** `left_ts` is epoch MILLIS — full event-time precision. (An earlier
    * form truncated to seconds, which let a right event from later in the
    * same second attribute to an earlier left.) */
  case class AsOfMatch(key: Long, left_ts: Long, left_id: Long, asof_value: Option[Double])

  // parallel primitive arrays (plain unsafe-array serialization), and PUBLIC:
  // the state encoder's generated code constructs the class reflectively and
  // cannot see a private nested case class
  case class AsOfBuf(leftTs: Array[Long], leftId: Array[Long],
      rightTs: Array[Long], rightV: Array[Double])

  /** STREAM-STREAM as-of join, exact under out-of-order arrival: both sides
    * buffer in per-key state and a left event is emitted only once the
    * WATERMARK passes its timestamp — after which no right row at or below
    * it can still arrive (rows older than the watermark are dropped by
    * definition), so the match is final. This is the semantics the batch
    * [[viaWindow]] computes offline, held online; a "latest right seen so
    * far" shortcut would mis-attribute any left whose true match arrives
    * late. State is bounded: pending lefts (unemitted only) + rights newer
    * than the watermark + the single latest right at-or-below it.
    * Emission is Append-mode with EventTimeTimeout so flushes also happen
    * on watermark advance alone. */
  def streamingAsOf(events: Dataset[AsOfEvent], delay: String = "30 minutes")(
      implicit spark: SparkSession): Dataset[AsOfMatch] = {
    import spark.implicits._
    events.withWatermark("eventTime", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuf, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (k, evs, state: GroupState[AsOfBuf]) =>
          val st0 = state.getOption.getOrElse(
            AsOfBuf(Array.empty, Array.empty, Array.empty, Array.empty))
          var lefts = st0.leftTs.zip(st0.leftId).toBuffer
          var rights = st0.rightTs.zip(st0.rightV).toBuffer
          evs.foreach { e =>
            // full MILLIS precision: truncating to seconds would let a right
            // from later in the same second attribute to an earlier left
            val t = e.eventTime.getTime
            if (e.side == 1) lefts += ((t, e.id)) else rights += ((t, e.value))
          }
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = lefts.partition(_._1 < wm)
          val out = ready.sortBy(l => (l._1, l._2)).map { case (lt, lid) =>
            val m = rights.filter(_._1 <= lt)
            AsOfMatch(k, lt, lid,
              if (m.isEmpty) None else Some(m.maxBy(r => (r._1, r._2))._2))
          }
          // prune rights: anything below the watermark can only ever match as
          // "the latest right at-or-below" — keep exactly one such
          val (fresh, old) = rights.partition(_._1 >= wm)
          val keptRights = fresh ++ old.sortBy(r => (r._1, r._2)).lastOption.toList
          if (pending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsOfBuf(pending.map(_._1).toArray, pending.map(_._2).toArray,
              keptRights.map(_._1).toArray, keptRights.map(_._2).toArray))
            // wake when the watermark passes the earliest pending left; a
            // key holding only buffered rights needs NO timeout — its kept
            // right can never expire, and re-arming would wake every such
            // group on every watermark advance forever just to do nothing
            pending.map(_._1).minOption.foreach { mn =>
              state.setTimeoutTimestamp(math.max(mn + 1, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
      }
  }
}
