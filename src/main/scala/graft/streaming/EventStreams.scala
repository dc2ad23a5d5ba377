package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, Dataset}

/** Event-time streaming operators over the `events` stream shape
  * (`ts timestamp, user_id long, event_type string, value double`) —
  * the streaming side of the batch event queries in
  * [[graft.queries.Analytics]] (qHourlyEventStats / qEventSessions).
  *
  * Design (SURVEY §2.9 goes beyond the reference here — the reference
  * has no Spark streaming, so this is north-star surface):
  *   - Watermarked tumbling-window aggregation: the canonical
  *     `withWatermark` + `window()` + groupBy — late data beyond the
  *     watermark is dropped, windows finalize (append mode) once the
  *     watermark passes their end.
  *   - Gap sessionization with CUSTOM state via
  *     `flatMapGroupsWithState`: sessions close either by a later
  *     event starting a new one or by event-time TIMEOUT when the
  *     watermark passes last_ts + gap. Semantics match the batch
  *     `session_window` query (exclusive end: an event exactly `gap`
  *     after its predecessor opens a NEW session), so batch and
  *     streaming results agree on the same data — asserted in
  *     EventStreamsSpec.
  *
  * Scale notes: state is per-user and O(1) per key (one open session),
  * the smallest possible stateful footprint; both operators shuffle
  * once on the grouping key per micro-batch, same as their batch
  * twins. State-store growth is bounded by timeout cleanup.
  */
object EventStreams {

  /** Input/output records for the typed sessionization path. */
  case class StreamEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)
  /** Open-session state: timestamps in epoch millis. */
  case class SessionState(startMs: Long, lastMs: Long, n: Long, total: Double)

  /** Streaming twin of [[graft.queries.Analytics.qHourlyEventStats]]:
    * per-hour tumbling windows finalized by the watermark. `delay` is
    * the max expected event-time disorder.
    */
  def hourlyStats(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Streaming member of the dedup family ([[graft.ext.Dedup]] holds the
    * batch members): exactly-once emission per `keyCols` value among
    * records whose event times fall within the watermark horizon.
    * Bounded state is the point — a global streaming `dropDuplicates`
    * grows state forever; the watermark variant evicts a key once the
    * watermark passes its event time + delay, so re-ingesting old data
    * (the reference's re-dropped-month story, SURVEY §2.9) re-emits
    * instead of OOM-ing the state store. At 100 TB of history that
    * bound is the difference between a runnable and an unrunnable
    * streaming dedup.
    */
  def dedupWithinWatermark(records: DataFrame, delay: String, keyCols: String*): DataFrame =
    records.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Gap-based sessionization with explicit state. Used with
    * `OutputMode.Append`: only CLOSED sessions are emitted, each exactly
    * once. Event-time timeout fires when the watermark passes
    * `last_ts + gap`, closing idle sessions without waiting for the
    * user's next event.
    */
  def sessionize(events: Dataset[StreamEvent], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateSessions(gapMs))
  }

  private def close(userId: Long, s: SessionState, gapMs: Long): SessionOut =
    SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs + gapMs), s.n, s.total)

  /** Per-key, per-batch state transition. Spark has already dropped
    * events below the watermark; within a batch we sort the (small)
    * per-user slice by event time so gap logic sees time order.
    */
  private[streaming] def updateSessions(gapMs: Long)(
      userId: Long,
      events: Iterator[StreamEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = close(userId, state.get, gapMs)
      state.remove()
      Iterator.single(out)
    } else {
      val sorted = events.toIndexedSeq.sortBy(_.ts.getTime)
      var closed = Vector.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs >= gapMs => // exclusive end, as batch
            closed :+= close(userId, s, gapMs)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.startMs, math.max(s.lastMs, t), s.n + 1, s.total + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.iterator
    }
  }
}
