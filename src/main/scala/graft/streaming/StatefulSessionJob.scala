package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed input event for custom-state sessionization. */
case class KeyedEvent(key: Long, eventTs: Timestamp, value: Double)

/** Per-key open-session state (epoch millis; kept tiny — state store rows
  * are the scarce resource at scale).
  */
case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

/** A finalized session emitted downstream. */
case class SessionOut(key: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, sum_value: Double)

/** Custom streaming state via `flatMapGroupsWithState` — the escape hatch
  * for stateful semantics `session_window` can't express (emit-on-close
  * with arbitrary per-session payload, custom merge logic, explicit
  * timeout control).
  *
  * Contrast with SessionStreamJob.sessionize (declarative session_window):
  * same session semantics, but here WE own the state row — O(1) per key,
  * event-time timeout closes it `gap` after the last event, and the state
  * store never holds more than one open session per key. Bounded state +
  * append-mode emission is exactly the shape that survives a 1000-executor
  * streaming job: state is hash-partitioned by key, timeouts fire locally,
  * nothing accumulates past the watermark horizon.
  */
object StatefulSessionJob {

  /** Gap-based sessionization with explicit state: sessions closed by an
    * in-batch gap emit immediately; the trailing open session closes when
    * the event-time timeout fires (watermark passes `end + gap`).
    */
  def sessionize(events: Dataset[KeyedEvent], gapMs: Long,
      delay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("eventTs", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[KeyedEvent], state: GroupState[OpenSession]) =>
          def close(s: OpenSession): SessionOut =
            SessionOut(key, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            // events within a micro-batch are unordered — sort this key's
            // slice (bounded by batch size, not history)
            val evs = it.toArray.sortBy(e => (e.eventTs.getTime, e.value))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.eventTs.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= close(s)
                  cur = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  cur = Some(OpenSession(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once event time passes end + gap; the
              // timeout must sit past the current watermark or Spark
              // rejects it (the session would already be closeable)
              val target = s.end + gapMs
              state.setTimeoutTimestamp(
                math.max(target, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
