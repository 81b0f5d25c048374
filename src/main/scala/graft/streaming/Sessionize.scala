package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators (SURVEY.md §2.5). The reference has no streaming
  * surface; this is the Spark-native extension: the same sessionization
  * semantics exist twice — a batch shadow (window functions, used by the
  * DuckDB-oracled query) and a Structured Streaming stateful operator
  * (flatMapGroupsWithState), spec-tested with MemoryStream.
  */
object Sessionize {

  /** Batch sessionization: a session breaks after `gapSec` of inactivity.
    * Returns one row per user: (user_id, n_sessions, n_events). */
  def batch(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Hourly windowed aggregate (batch shadow of the streaming watermarked
    * window agg): epoch-seconds bucket, count, exact value cents. */
  def hourlyWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("w.start")).as("hour_ts"), col("n_events"), col("value_cents"))

  /** Stream-static enrichment: events (batch OR streaming — the plan is the
    * same declarative broadcast join + rollup either way) joined to the
    * customer dimension, rolled up by market segment with exact cents.
    * Events whose user has no dimension row keep a NULL segment (left
    * join) — an enrichment must never drop facts. The dim side broadcasts:
    * at 100 TB the fact stream never shuffles for the join. */
  def enrichBySegment(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
        broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        events("user_id") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))

  // ---- streaming side ---------------------------------------------------

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)
  case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Streaming sessionization over a (possibly unbounded) event stream.
    * State per user survives micro-batches; ProcessingTimeTimeout keeps the
    * example simple (an event-time variant would pair a watermark with
    * EventTimeTimeout). */
  def streaming(events: Dataset[Event], gapSec: Long = 1800)(
      implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            val newSession = st.lastTs == Long.MinValue || t - st.lastTs > gapSec
            st = SessionState(t, st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          Iterator(SessionUpdate(uid, st.nSessions, st.nEvents))
      }
  }

  case class OpenSession(startTs: Long, lastTs: Long, nEvents: Long)
  case class ClosedSession(user_id: Long, start_ts: Long, end_ts: Long, n_events: Long)

  /** Event-time streaming sessionization: sessions close when EVENT TIME
    * (not wall clock) passes last-event + gap, driven by the watermark via
    * `EventTimeTimeout` — the production shape for out-of-order streams
    * (the ProcessingTimeTimeout variant above is the didactic one). Emits
    * one row per CLOSED session. */
  def streamingEventTime(events: Dataset[Event], gapSec: Long = 1800)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(ClosedSession(uid, st.startTs, st.lastTs, st.nEvents))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              // membership = distance to the session INTERVAL
              // [startTs - gap, lastTs + gap]: a late-but-above-watermark
              // event before the open session extends its start BACKWARD
              // (min), not just its end — the emitted session can never
              // report a start later than its earliest event
              if (st == null) st = OpenSession(t, t, 1L)
              else if (t > st.lastTs + gapSec || t < st.startTs - gapSec) {
                closed += ClosedSession(uid, st.startTs, st.lastTs, st.nEvents)
                st = OpenSession(t, t, 1L)
              } else st = OpenSession(math.min(st.startTs, t), math.max(st.lastTs, t), st.nEvents + 1)
            }
            state.update(st)
            // close when the watermark passes last-event + gap (never set a
            // timeout at/below the current watermark — Spark rejects it)
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(st.lastTs * 1000 + gapSec * 1000, wm + 1))
            closed.iterator
          }
      }
  }

  /** Streaming hourly window with watermark (late data dropped after 2h). */
  def streamingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
}
