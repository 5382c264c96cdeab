package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** A first-occurrence record: the key's first sighting of `etype`. */
case class FirstSeen(key: Long, etype: String, first_ts: Timestamp)

/** Per-key first-occurrence log on `transformWithState` MapState — the
  * third state shape of the new API (ValueState: TwsSessionJob,
  * ListState: TwsPatternJob): the map holds sub-key -> first event
  * time, a row is emitted exactly when a (key, sub-key) pair is first
  * seen, and every later sighting is absorbed silently. The richer
  * cousin of streaming dedup: dropDuplicates drops rows, this REPORTS
  * the first one per pair.
  *
  * State per key is bounded by the sub-key cardinality (here event
  * types), not the stream; in-batch processing sorts by event time so
  * the first-seen timestamp is batch-carving-independent.
  */
class FirstSeenProcessor
    extends StatefulProcessor[Long, TypedEvent, FirstSeen] {

  @transient private var seen: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getMapState[String, Long]("seen",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
      tv: TimerValues): Iterator[FirstSeen] = {
    val evs = rows.toArray.sortBy(e => (e.eventTs.getTime, e.etype))
    var out = List.empty[FirstSeen]
    evs.foreach { e =>
      if (!seen.containsKey(e.etype)) {
        seen.updateValue(e.etype, e.eventTs.getTime)
        out ::= FirstSeen(key, e.etype, e.eventTs)
      }
    }
    out.reverseIterator
  }
}

object TwsFirstSeenJob {

  /** Emit each (key, etype)'s first sighting exactly once. Requires the
    * RocksDB state store provider; TimeMode.None — the map is bounded
    * by sub-key cardinality, no timers needed.
    */
  def firstSeen(events: Dataset[TypedEvent]): Dataset[FirstSeen] = {
    import events.sparkSession.implicits._
    implicit val outEnc: Encoder[FirstSeen] = Encoders.product[FirstSeen]
    events
      .groupByKey(_.key)
      .transformWithState(new FirstSeenProcessor(),
        TimeMode.None(), OutputMode.Append())
  }
}
