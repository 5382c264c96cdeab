package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Gap sessionization on `transformWithState` (Spark 4's successor to
  * `flatMapGroupsWithState`): state is a named [[ValueState]] in the
  * RocksDB-backed store and session closes fire through first-class
  * event-time TIMERS instead of a single per-key timeout slot.
  *
  * Same session semantics as [[StatefulSessionJob]] (merge when the gap
  * is <= gapMs; in-batch splits emit immediately; the trailing open
  * session closes when the watermark passes `end + gap`), so the two
  * implementations are mutually checkable — and both reconcile against
  * the batch lag+cumsum oracle.
  *
  * Timer discipline: a fresh timer is registered every time the open
  * session extends, and STALE timers (an earlier registration for a
  * session that has since grown) are disarmed in the handler by
  * re-deriving the close condition from state — `watermark >= end+gap`
  * — rather than trusting the firing itself. This is the recommended
  * pattern for the new API: timers are delivery signals, state is the
  * truth. Scale shape matches the old job: O(1) state per key,
  * hash-partitioned, nothing accumulates past the watermark horizon.
  */
class SessionProcessor(gapMs: Long)
    extends StatefulProcessorWithInitialState[
      Long, KeyedEvent, SessionOut, OpenSession] {

  @transient private var sess: ValueState[OpenSession] = _

  /** Warm start: adopt a batch-built open session as this key's state
    * (the backfill-then-stream bootstrap; a no-op for cold starts —
    * plain `sessionize` never calls it). The adopted session gets its
    * close timer like any other.
    */
  override def handleInitialState(key: Long, init: OpenSession,
      tv: TimerValues): Unit = {
    sess.update(init)
    getHandle.registerTimer(
      math.max(init.end + gapMs, tv.getCurrentWatermarkInMs() + 1))
  }

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[OpenSession]("session",
      Encoders.product[OpenSession], TTLConfig.NONE)

  private def close(key: Long, s: OpenSession): SessionOut =
    SessionOut(key, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)

  override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
      tv: TimerValues): Iterator[SessionOut] = {
    val evs = rows.toArray.sortBy(e => (e.eventTs.getTime, e.value))
    var closed = List.empty[SessionOut]
    var cur = if (sess.exists()) Some(sess.get()) else None
    evs.foreach { e =>
      val t = e.eventTs.getTime
      cur match {
        case Some(s) if t - s.end <= gapMs =>
          cur = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1,
            s.sum + e.value))
        case Some(s) =>
          closed ::= close(key, s)
          cur = Some(OpenSession(t, t, 1, e.value))
        case None =>
          cur = Some(OpenSession(t, t, 1, e.value))
      }
    }
    cur.foreach { s =>
      sess.update(s)
      // the timer must sit past the current watermark or the engine
      // rejects it (the session would already be closeable)
      getHandle.registerTimer(
        math.max(s.end + gapMs, tv.getCurrentWatermarkInMs() + 1))
    }
    closed.reverseIterator
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessionOut] = {
    // re-derive expiry from STATE: a stale timer (registered before the
    // session grew) fires harmlessly because the condition fails
    if (sess.exists()) {
      val s = sess.get()
      if (tv.getCurrentWatermarkInMs() >= s.end + gapMs) {
        sess.clear()
        return Iterator.single(close(key, s))
      }
    }
    Iterator.empty
  }
}

object TwsSessionJob {

  /** Gap-based sessionization via `transformWithState`. Requires the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — the new API does not run
    * on the HDFS-backed default.
    */
  def sessionize(events: Dataset[KeyedEvent], gapMs: Long,
      delay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    events
      .withWatermark("eventTs", delay)
      .groupByKey(_.key)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Warm-started sessionization: `initial` carries each key's
    * batch-built open session (the lakehouse backfill), and the stream
    * continues — or timer-closes — those sessions. The correctness law:
    * backfill-closed sessions + this job's output ≡ one batch
    * sessionization over everything (events_sessionize_warm proves it
    * against DuckDB).
    */
  def sessionizeWarm(events: Dataset[KeyedEvent],
      initial: Dataset[(Long, OpenSession)], gapMs: Long,
      delay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    implicit val initEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
    events
      .withWatermark("eventTs", delay)
      .groupByKey(_.key)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }
}
