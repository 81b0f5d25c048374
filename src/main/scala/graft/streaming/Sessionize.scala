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

  /** Streaming sessionization over an event stream — the DIDACTIC variant:
    * cumulative per-user (n_sessions, n_events) in Update mode. Per-user
    * state is never expired BY DESIGN: the cumulative counts cannot be
    * dropped without resetting a returning user, so this variant is only
    * appropriate for bounded key spaces. (A ProcessingTimeTimeout TTL is
    * NOT used deliberately — with the default as-fast-as-possible trigger
    * it busy-loops empty micro-batches until the TTL. The production shape
    * for unbounded streams is [[streamingEventTime]] below, whose state is
    * watermark-bounded and removed at session close.) */
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
  // parallel arrays (encoder-friendly): the per-user set of OPEN session
  // fragments, kept sorted by startTs
  case class OpenSessions(startTs: Array[Long], lastTs: Array[Long], nEvents: Array[Long])

  /** Event-time streaming sessionization: sessions close when EVENT TIME
    * (not wall clock) passes last-event + gap, driven by the watermark via
    * `EventTimeTimeout` — the production shape for out-of-order streams
    * (the ProcessingTimeTimeout variant above is the didactic one). Emits
    * one row per CLOSED session.
    *
    * State is a SET of open fragments, not a single open session: an
    * out-of-order (but above-watermark) event far before the open session
    * must start its own fragment — not force the open one closed — because
    * later events may yet BRIDGE the two (batch semantics would merge
    * them). Each arriving event joins the fragment whose interval
    * [start-gap, last+gap] contains it, then adjacent fragments within gap
    * merge; ONLY the watermark closes a fragment (once wm > last+gap, no
    * admissible future event can join or bridge it — any such event has
    * ts >= wm > last+gap on the right, and bridging from the left would
    * need ts <= last+gap too). */
  def streamingEventTime(events: Dataset[Event], gapSec: Long = 1800)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state: GroupState[OpenSessions]) =>
          var frags = state.getOption
            .map(s => s.startTs.indices.map(i => (s.startTs(i), s.lastTs(i), s.nEvents(i))).toBuffer)
            .getOrElse(scala.collection.mutable.Buffer.empty[(Long, Long, Long)])
          evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime / 1000
            val i = frags.indexWhere(f => t >= f._1 - gapSec && t <= f._2 + gapSec)
            if (i < 0) {
              val at = frags.indexWhere(_._1 > t)
              frags.insert(if (at < 0) frags.length else at, (t, t, 1L))
            } else
              frags(i) = (math.min(frags(i)._1, t), math.max(frags(i)._2, t), frags(i)._3 + 1)
            // merge any now-adjacent fragments (one event can bridge two)
            var j = 0
            while (j + 1 < frags.length) {
              if (frags(j + 1)._1 - frags(j)._2 <= gapSec) {
                frags(j) = (frags(j)._1, math.max(frags(j)._2, frags(j + 1)._2),
                  frags(j)._3 + frags(j + 1)._3)
                frags.remove(j + 1)
              } else j += 1
            }
          }
          val wm = state.getCurrentWatermarkMs()
          val (done, open) = frags.partition(f => f._2 * 1000 + gapSec * 1000 < wm)
          val closed = done.sortBy(_._1).map(f => ClosedSession(uid, f._1, f._2, f._3))
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open.map(_._1).toArray, open.map(_._2).toArray,
              open.map(_._3).toArray))
            // wake when the watermark passes the EARLIEST fragment's close
            // point (never set a timeout at/below the watermark)
            state.setTimeoutTimestamp(
              math.max(open.map(_._2).min * 1000 + gapSec * 1000, wm + 1))
          }
          closed.iterator
      }
  }

  /** Streaming hourly window with watermark (late data dropped after 2h).
    * Emits exactly [[hourlyWindow]]'s schema — exact value CENTS, never a
    * float sum (order/retrigger-independent, so the bridge spec asserts
    * full-row equality between the stream's final state and the oracled
    * batch shadow on the same events, not just event counts). */
  def streamingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("w.start")).as("hour_ts"), col("n_events"), col("value_cents"))

  /** Volume anomaly detection over time buckets, integer-exact: bucket the
    * stream into `bucketSec` windows, count events per bucket, and flag
    * buckets whose count deviates from the corpus mean by ≥ z standard
    * deviations — WITHOUT floats: |x − μ| > z·σ over N buckets
    * cross-multiplies to (x·N − S)² > z²·(N·Q − S²) where S = Σx,
    * Q = Σx², all 64-bit integer (hash-identical across engines; Long
    * bounds hold through ~10⁹ events per window at millions of buckets).
    * STRICT inequality: a zero-variance stream flags nothing (with ≥,
    * every bucket of a perfectly uniform stream would be "anomalous").
    * Only buckets holding ≥ 1 event exist — an empty bucket is absent from
    * the data, not a zero (stated trade; a calendar spine is a caller-side
    * join). Emits (bucket_ts, n, flag).
    *
    * Scale: ONE keyed count + a 3-scalar global agg broadcast back as
    * literals into a scan predicate over the bucket table (bounded by
    * distinct buckets, not events). */
  def volumeAnomaly(events: DataFrame, tsCol: String, bucketSec: Long,
      z: Long): DataFrame = {
    val buckets = bucketCounts(events, tsCol, bucketSec)
    flagBuckets(buckets, volumeStats(buckets), bucketSec, z)
  }

  /** [[volumeAnomaly]] over a CALENDAR SPINE: every bucket between the
    * stream's first and last event exists, zero-count buckets included —
    * so a SILENT outage (a dead pipeline emitting nothing) FLAGS instead
    * of being an absent row the default shape never tests. The spine is
    * one `sequence(minB, maxB)` generator row (two longs of driver state,
    * the frozen-baseline convention) left-joined with the counts; the
    * baseline (N, S, Q) is recomputed over the spined frame (zeros change
    * N, so μ/σ see the outage too — the monitoring semantics). Empty
    * input yields an empty result (no spine to build).
    *
    * Scale: the spine adds (maxB − minB + 1) rows — bounded by elapsed
    * time over bucketSec, not by events; everything else is the
    * volumeAnomaly plan. Spines beyond 10⁸ buckets refuse loudly (a
    * misparameterized bucketSec would otherwise explode the generator). */
  def volumeAnomalySpine(events: DataFrame, tsCol: String, bucketSec: Long,
      z: Long): DataFrame = {
    val counts = bucketCounts(events, tsCol, bucketSec)
    val bounds = counts.agg(min(col("b")), max(col("b"))).head()
    if (bounds.isNullAt(0)) return flagBuckets(counts, (0L, 0L, 0L), bucketSec, z)
    val (minB, maxB) = (bounds.getLong(0), bounds.getLong(1))
    require(maxB - minB < 100000000L,
      s"calendar spine would hold ${maxB - minB + 1} buckets; check bucketSec")
    val spine = events.sparkSession.range(minB, maxB + 1).select(col("id").as("b"))
      .join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("n"), lit(0L)).as("n"))
    flagBuckets(spine, volumeStats(spine), bucketSec, z)
  }

  private def bucketCounts(events: DataFrame, tsCol: String,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "need bucketSec > 0")
    events.select(expr(s"unix_timestamp(`$tsCol`) div ${bucketSec}L").as("b"))
      .groupBy("b").agg(count(lit(1)).as("n"))
  }

  /** The (N, S, Q) = (#buckets, Σn, Σn²) baseline of [[volumeAnomaly]]'s
    * z-test — three longs of bounded driver state a monitor trains on a
    * reference window and FREEZES (the sq8/kmeans codec convention). */
  def volumeStats(events: DataFrame, tsCol: String, bucketSec: Long): (Long, Long, Long) =
    volumeStats(bucketCounts(events, tsCol, bucketSec))

  private def volumeStats(buckets: DataFrame): (Long, Long, Long) = {
    // coalesce: on an empty frame count is 0 but the sums are NULL, and a
    // bare getLong would unbox null into an opaque NPE — (0, 0, 0) is the
    // lawful empty baseline (flagBuckets over it flags nothing: rhs = 0
    // and there are no live buckets to test)
    val r = buckets.agg(count(lit(1)), coalesce(sum(col("n")), lit(0L)),
      coalesce(sum(col("n") * col("n")), lit(0L))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Flag live buckets against FROZEN baseline stats: a pure literal-stats
    * scan predicate over the per-bucket counts, so the SAME arithmetic
    * flags a streaming window aggregate micro-batch by micro-batch (the
    * baseline-week → live-alert monitoring shape; bridge-spec'd against
    * the oracled batch flags). */
  def flagBuckets(buckets: DataFrame, stats: (Long, Long, Long),
      bucketSec: Long, z: Long): DataFrame = {
    require(z > 0, "need z > 0")
    val (nB, s, q) = stats
    // the SQUARED terms run in DECIMAL(38,0): (x·N − S)² overflows Long
    // already at x·N ≈ 3·10⁹ (realistic counts × bucket counts), where
    // Spark wraps SILENTLY and DuckDB errors loudly — decimal keeps both
    // engines exact and identical (the assortativity convention). The
    // LINEAR state (S, Q) stays Long: the documented bound is per-bucket
    // n and Σn² inside 2⁶³ (n ≤ ~3·10⁹ per bucket at any bucket count
    // whose Σn² fits — beyond that, train on a sampled reference window)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val dev = (col("n") * nB - s).cast(dec)
    val rhs = (lit(z * z).cast(dec) *
      (lit(nB).cast(dec) * lit(q).cast(dec) - lit(s).cast(dec) * lit(s).cast(dec)))
    buckets.select((col("b") * bucketSec).as("bucket_ts"), col("n"),
      (dev * dev > rhs).cast("int").as("flag"))
  }

  /** Cohort retention: users are cohorted by the WEEK of their first
    * `signupType` event (epoch-seconds div weekSec — floor on both engines
    * for positive timestamps), and for each offset k ≥ 0 the fraction of
    * the cohort active (ANY event) in cohort_week + k is reported in basis
    * points. Activity before the signup week is ignored; the signup event
    * itself makes k = 0 retention 10⁴ by construction. Emits
    * (cohort_week, k, n_active, n_cohort, retention_bp).
    *
    * Scale: one keyed min-agg (cohorts), one distinct over (key, week) —
    * the only corpus-sized shuffle, bounded by active user-weeks — then
    * key-joined counts; output is cohorts × offsets. */
  def retention(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, signupType: String, weekSec: Long = 604800L): DataFrame = {
    require(weekSec > 0, "weekSec must be positive")
    val su = events.where(col(typeCol) === signupType)
      .groupBy(col(keyCol).as("key"))
      .agg(expr(s"unix_timestamp(min(`$tsCol`)) div ${weekSec}L").as("cw"))
    val act = events.select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$tsCol`) div ${weekSec}L").as("w"))
      .dropDuplicates("key", "w")
    val joined = act.join(su, "key").where(col("w") >= col("cw"))
      .select(col("cw"), (col("w") - col("cw")).as("k"), col("key"))
      .dropDuplicates()
    val nActive = joined.groupBy("cw", "k").agg(count(lit(1)).as("n_active"))
    val nCohort = su.groupBy("cw").agg(count(lit(1)).as("n_cohort"))
    nActive.join(nCohort, "cw")
      .select(col("cw").as("cohort_week"), col("k"), col("n_active"), col("n_cohort"),
        expr("(n_active * 10000) div n_cohort").as("retention_bp"))
  }

  /** Ordered-funnel analysis: per key, the GREEDY-EARLIEST completion of
    * the step sequence — t₁ = min ts of step 1, tᵢ = min ts of step i
    * STRICTLY after tᵢ₋₁ — emitting one row per key that completes every
    * step, with the step timestamps (t1..tk). Greedy-earliest is the
    * deterministic existence-optimal matching for an unwindowed funnel
    * (starting any later only shrinks what can follow); a max-span variant
    * is the post-filter t_k − t_1 ≤ span over this output, which keeps the
    * common "within T of the first step, matched greedily" semantics —
    * both SQL-replayable.
    *
    * Scale: k−1 key-equi-joins + k keyed min-aggs over the single events
    * scan, each shuffling on the funnel key only — no window over the full
    * event stream, no per-key event materialization, output ≤ one row per
    * key. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    steps.indices.drop(1).foldLeft(funnelFirst(events, keyCol, tsCol, typeCol, steps)) {
      (acc, i) => funnelStep(events, keyCol, tsCol, typeCol, steps(i), i)(acc)
    }
  }

  private def funnelFirst(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame =
    events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol).as("key")).agg(min(col(tsCol)).as("t1"))

  private def funnelStep(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, step: String, i: Int)(acc: DataFrame): DataFrame =
    events.where(col(typeCol) === step)
      .select(col(keyCol).as("key"), col(tsCol).as("__ts"))
      .join(acc, "key")
      .where(col("__ts") > col(s"t$i"))
      .groupBy((col("key") +: (1 to i).map(j => col(s"t$j"))): _*)
      .agg(min(col("__ts")).as(s"t${i + 1}"))

  case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelProgress(progress: Int, stepTs: Array[Long])
  case class FunnelCompletion(user_id: Long, step_ts: Array[Long])

  /** Streaming funnel progression: the stateful form of [[funnel]] — per
    * key, greedy-earliest matching of the step sequence maintained as
    * (progress, matched timestamps), one completion row emitted the moment
    * the last step matches (Append mode; a completed key's state pins at
    * `progress = steps.length` so re-deliveries never re-emit). State is
    * two small fields per ACTIVE key — the funnel analytic over an
    * unbounded stream without materializing per-key histories.
    *
    * Semantics contract: greedy-earliest is a SEQUENTIAL scan, so the
    * stream reproduces the oracled batch [[funnel]] exactly when each
    * key's events arrive in event-time order across micro-batches (events
    * within one micro-batch are sorted here; the bridge spec replays the
    * real table chronologically and asserts row equality). Out-of-order
    * arrivals degrade gracefully — a late earlier-step event is simply not
    * matched (the documented StreamQuota arrival-order deviation), because
    * greedily re-matching would need the per-key history this operator
    * exists to avoid. */
  def streamingFunnel(events: Dataset[TypedEvent], steps: Seq[String])(
      implicit spark: SparkSession): Dataset[FunnelCompletion] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelCompletion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[FunnelProgress]) =>
          // epoch MICROS: the batch funnel compares Timestamp columns at
          // full micro precision, so the strict-inequality step matching
          // must too (getTime alone would truncate to millis)
          def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000L
          var st = state.getOption.getOrElse(FunnelProgress(0, Array.empty))
          val out = scala.collection.mutable.ArrayBuffer[FunnelCompletion]()
          evs.toSeq.sortBy(e => us(e.ts)).foreach { e =>
            if (st.progress < steps.length && e.event_type == steps(st.progress) &&
                (st.progress == 0 || us(e.ts) > st.stepTs(st.progress - 1))) {
              st = FunnelProgress(st.progress + 1, st.stepTs :+ us(e.ts))
              if (st.progress == steps.length) out += FunnelCompletion(uid, st.stepTs)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** The drop-off funnel PRODUCT over [[funnel]]'s greedy-earliest
    * matching: one row per step with the count of keys completing the
    * step-prefix, plus the count completing it WITHIN `spanSec` of the
    * first step (the t_k − t_1 ≤ span windowed variant as a post-filter —
    * greedy-earliest start minimizes t_1, and the within-count reads the
    * same prefix frames). Emits (step, step_type, n_keys, n_within);
    * step 1's n_within = n_keys by construction.
    *
    * Scale: the [[funnel]] join chain per prefix + one scalar agg each —
    * step counts are bounded by the step list (a funnel has a handful of
    * steps by nature), and each prefix frame shares the funnel plan's
    * keyed-join shape. */
  def funnelSteps(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], spanSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(spanSec >= 0, "spanSec must be non-negative")
    val prefixes = steps.indices.drop(1).scanLeft(
      funnelFirst(events, keyCol, tsCol, typeCol, steps)) {
      (acc, i) => funnelStep(events, keyCol, tsCol, typeCol, steps(i), i)(acc)
    }
    prefixes.zipWithIndex.map { case (df, i) =>
      val within = unix_timestamp(col(s"t${i + 1}")) - unix_timestamp(col("t1")) <= spanSec
      df.agg(count(lit(1)).as("n_keys"),
          coalesce(sum(within.cast("long")), lit(0L)).as("n_within"))
        .select(lit(i + 1).cast("int").as("step"), lit(steps(i)).as("step_type"),
          col("n_keys"), col("n_within"))
    }.reduce(_ union _)
  }
}
