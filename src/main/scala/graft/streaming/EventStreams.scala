package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row (mirrors the events table schema, ns already micros). */
case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                    event_type: String, value: Double)

/** Emitted per closed session by the custom-state sessionizer. */
case class SessionOut(user_id: Long, n_events: Long, start_ts: Long, end_ts: Long)

/** Per-user running state for the custom sessionizer. */
case class SessState(n: Long, start: Long, last: Long)

/** Per-user funnel frontier state/output: epoch-MICROS of the first
  * signup, first post-signup view, first post-view purchase (0 = not yet
  * reached) — the streaming mirror of Events.funnel's window minima. */
case class FunnelState(user_id: Long, signup_ts: Long, view_ts: Long, purchase_ts: Long)

/** Per-(user_id, event_type) LWW state: the current winning write — the
  * streaming mirror of the Cassandra upsert path (every INSERT is an
  * upsert; the register holds the newest cell). */
case class LwwWin(user_id: Long, event_type: String, ts: java.sql.Timestamp,
                  event_id: Long, value: Double)

/** Per-user last-event state for the streaming transition miner. */
case class StepState(last_us: Long, last_id: Long, last_type: String)

/** One emitted (from → to) step of a user's event stream. */
case class StepEmit(from_type: String, to_type: String)

/** SURVEY.md §2.C — Structured Streaming twins of the batch event
  * operators. Same logic, same state partitioning (keyed by user_id /
  * window), so a batch backfill and the live stream agree.
  *
  * Inputs are any streaming DataFrame with the events schema (file source,
  * kafka, or MemoryStream in tests — readStream.parquet over the events
  * directory works unchanged at cluster scale).
  */
object EventStreams {

  /** Shared body of the windowed streaming twins: watermark → per-(window,
    * type) count + exact-decimal value sum (graft.Cols.sumExact — the SAME
    * correctness-critical idiom every batch operator uses) so a drained
    * backfill is bit-identical to the batch result regardless of
    * partial-aggregation order. */
  private def windowedCounts(events: DataFrame, win: org.apache.spark.sql.Column): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.Cols.sumExact(col("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Watermarked tumbling-window counts per event type — the streaming twin
    * of Events.tumblingWindow. */
  def tumblingCounts(events: DataFrame): DataFrame =
    windowedCounts(events, window(col("ts"), "1 hour"))

  /** Sliding (hopping) windows — the streaming twin of
    * Events.slidingWindow: identical window(ts, size, slide) expression,
    * watermark-bounded state. */
  def slidingCounts(events: DataFrame): DataFrame =
    windowedCounts(events, window(col("ts"), "1 hour", "15 minutes"))

  /** Built-in session windows (30 min gap) — the streaming twin of
    * Events.sessionization. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Full-precision event time as epoch MICROS — Timestamp.getTime
    * truncates to millis while events carry microseconds, so ordering or
    * strict `>` comparisons at getTime precision can diverge from the
    * batch oracle on same-millisecond pairs. */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L

  /** Streaming twin of Events.funnel: per-user ordered-funnel frontiers as
    * mapGroupsWithState state (same user_id partitioning as the batch
    * window). Emits each user's current stage timestamps (epoch micros); a
    * sink-side aggregation of non-zero columns gives the live funnel
    * counts. Events inside a micro-batch are sorted by (ts, event_id) at
    * full micros precision so replaying a backfill through the stream
    * matches the batch exactly. */
  def funnelStages(events: Dataset[EventRow]): Dataset[FunnelState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelState](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(userId, 0L, 0L, 0L))
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val t = micros(e.ts)
            e.event_type match {
              case "signup" if st.signup_ts == 0L => st = st.copy(signup_ts = t)
              case "view" if st.signup_ts != 0L && t > st.signup_ts && st.view_ts == 0L =>
                st = st.copy(view_ts = t)
              case "purchase" if st.view_ts != 0L && t > st.view_ts && st.purchase_ts == 0L =>
                st = st.copy(purchase_ts = t)
              case _ => ()
            }
          }
          state.update(st)
          st
      }
  }

  /** Streaming transition miner — the stateful mirror of
    * Events.markovTransitions' lead(): per user, ONE StepState row (the
    * last event seen) bridges micro-batch boundaries, and each arriving
    * event emits its (last_type → event_type) step. In-batch ordering is
    * restored by the same (ts, event_id) sort the other custom-state
    * twins use; like them, the drain assumes batches arrive in event-time
    * order (a live deployment would add a watermark + late-data policy).
    * Emissions are O(events) → files-sink drain; the |types|² matrix is
    * batch-side finishing. */
  def transitionSteps(events: Dataset[EventRow]): Dataset[StepEmit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StepState, StepEmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[EventRow], state: GroupState[StepState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[StepEmit]
          sorted.foreach { e =>
            last.foreach(l => out += StepEmit(l.last_type, e.event_type))
            last = Some(StepState(micros(e.ts), e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming twin of WideColumn.upsertLww — Cassandra's WRITE path as
    * streaming state: one register per (user_id, event_type) holding the
    * winning cell under the same (ts DESC, event_id DESC) order the batch
    * compaction uses. Emits the current winner per touched key each
    * micro-batch; the final drained winner per key equals the batch LWW
    * view exactly (oracle shared verbatim). State is one row per key —
    * constant per key, watermark-free, the same layout a
    * Cassandra-replacement ingest keeps at scale. */
  def lwwWinners(events: Dataset[EventRow]): Dataset[LwwWin] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[LwwWin, LwwWin](GroupStateTimeout.NoTimeout) {
        case ((uid, et), rows, state) =>
          val candidates = state.getOption.toSeq ++
            rows.map(e => LwwWin(uid, et, e.ts, e.event_id, e.value))
          // full-precision order (see micros()): the batch oracle orders
          // by the full timestamp, so ties must break below milliseconds
          val win = candidates.maxBy(w => (micros(w.ts), w.event_id))
          state.update(win)
          win
      }
  }

  /** Custom-state sessionization via mapGroupsWithState: demonstrates
    * arbitrary per-key state (the (c)-tier tool when session_window can't
    * express the semantics — e.g. value-dependent gaps). Emits the CURRENT
    * open session per user on every trigger. (A production job would add a
    * GroupStateTimeout to close idle sessions; omitted here because a
    * processing-time timeout keeps scheduling batches, which livelocks
    * processAllAvailable-style draining in tests/backfills.) */
  def statefulSessions(events: Dataset[EventRow]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessState, SessionOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessState(0L, Long.MaxValue, Long.MinValue))
          sorted.foreach { e =>
            val t = e.ts.getTime
            st =
              if (st.n == 0L || t - st.last > gapMs) SessState(1L, t, t) // new session
              else SessState(st.n + 1, st.start, t)
          }
          state.update(st)
          SessionOut(userId, st.n, st.start, st.last)
      }
  }
}
