package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** A typed event for pattern detection. */
case class TypedEvent(key: Long, eventTs: Timestamp, etype: String)

/** A pattern hit: `trigger` arrived with `antecedent` among the key's
  * previous `lookback` events.
  */
case class PatternHit(key: Long, hit_ts: Timestamp)

/** COUNT-based lookback pattern detection on `transformWithState`
  * ListState — the CEP-lite primitive an interval join cannot express:
  * "a `trigger` event whose same-key ANTECEDENT occurred within the
  * last N events" is a ring-buffer predicate, not a time-window one.
  *
  * State per key is the bounded last-`lookback` event types (ListState
  * rewritten with the trimmed tail each batch — O(N) rows per key, the
  * ring never grows). Events inside a micro-batch are processed in
  * (event time, type) order so results are independent of batch
  * carving; cross-batch continuity comes from the ring itself.
  */
class PatternProcessor(trigger: String, antecedent: String, lookback: Int)
    extends StatefulProcessor[Long, TypedEvent, PatternHit] {

  @transient private var recent: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[String]("recent",
      Encoders.STRING, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
      tv: TimerValues): Iterator[PatternHit] = {
    val evs = rows.toArray.sortBy(e => (e.eventTs.getTime, e.etype))
    var ring = if (recent.exists()) recent.get().toVector else Vector.empty
    var hits = List.empty[PatternHit]
    evs.foreach { e =>
      if (e.etype == trigger && ring.contains(antecedent))
        hits ::= PatternHit(key, e.eventTs)
      ring = (ring :+ e.etype).takeRight(lookback)
    }
    recent.put(ring.toArray)
    hits.reverseIterator
  }
}

object TwsPatternJob {

  /** Detect `trigger` events preceded by `antecedent` within the key's
    * last `lookback` events. Requires the RocksDB state store provider.
    * TimeMode.None: the ring needs no timers or watermark — state is
    * bounded by construction.
    */
  def detect(events: Dataset[TypedEvent], trigger: String,
      antecedent: String, lookback: Int): Dataset[PatternHit] = {
    import events.sparkSession.implicits._
    implicit val outEnc: Encoder[PatternHit] = Encoders.product[PatternHit]
    events
      .groupByKey(_.key)
      .transformWithState(new PatternProcessor(trigger, antecedent, lookback),
        TimeMode.None(), OutputMode.Append())
  }
}
