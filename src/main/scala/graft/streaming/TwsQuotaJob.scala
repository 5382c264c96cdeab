package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** A finalized per-(key, hour-bucket) admission report. */
case class QuotaReport(key: Long, hour_ms: Long, n_events: Long,
    n_admitted: Long, n_throttled: Long)

/** Watermark-finalized admission quotas on `transformWithState`: each
  * key's events are counted into fixed hour buckets (MapState
  * hour-start -> count), and a bucket's report — total, admitted up to
  * the cap, throttled remainder — is emitted EXACTLY ONCE, when the
  * event-time watermark passes the bucket's end. That finalization is
  * the point: a per-batch quota would re-admit on every micro-batch
  * boundary, while this report is independent of batch carving by
  * construction (counts only accumulate until the watermark proves the
  * bucket can no longer grow).
  *
  * The fourth state shape in the engine's transformWithState family
  * (ValueState sessions, ListState lookback, MapState first-seen):
  * MapState keyed by TIME BUCKET with event-time timers sweeping
  * completed buckets. State per key is bounded by the number of open
  * buckets inside the watermark horizon, not by the stream.
  *
  * Timer discipline follows TwsSessionJob: timers are delivery signals,
  * state is the truth — the handler sweeps every bucket whose end has
  * passed the CURRENT watermark, so duplicate or stale registrations
  * fire harmlessly.
  */
class QuotaProcessor(bucketMs: Long, cap: Long)
    extends StatefulProcessor[Long, KeyedEvent, QuotaReport] {

  @transient private var counts: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[Long, Long]("counts",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
      tv: TimerValues): Iterator[QuotaReport] = {
    val touched = scala.collection.mutable.Set.empty[Long]
    rows.foreach { e =>
      val h = Math.floorDiv(e.eventTs.getTime, bucketMs) * bucketMs
      val cur = if (counts.containsKey(h)) counts.getValue(h) else 0L
      counts.updateValue(h, cur + 1L)
      touched += h
    }
    touched.foreach { h =>
      // a timer must sit past the current watermark or the engine
      // rejects it (the bucket would already be closeable)
      getHandle.registerTimer(
        math.max(h + bucketMs, tv.getCurrentWatermarkInMs() + 1))
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[QuotaReport] = {
    val wm = tv.getCurrentWatermarkInMs()
    val done = counts.iterator()
      .filter { case (h, _) => h + bucketMs <= wm }
      .toArray.sortBy(_._1)
    done.foreach { case (h, _) => counts.removeKey(h) }
    done.iterator.map { case (h, n) =>
      val admitted = math.min(n, cap)
      QuotaReport(key, h, n, admitted, n - admitted)
    }
  }
}

object TwsQuotaJob {

  /** Per-(key, `bucketMs`-bucket) admission reports, finalized as the
    * watermark passes each bucket end. Requires the RocksDB state store
    * provider (the new API does not run on the HDFS-backed default).
    */
  def quota(events: Dataset[KeyedEvent], bucketMs: Long, cap: Long,
      delay: String = "0 seconds"): Dataset[QuotaReport] = {
    import events.sparkSession.implicits._
    implicit val outEnc: Encoder[QuotaReport] = Encoders.product[QuotaReport]
    events
      .withWatermark("eventTs", delay)
      .groupByKey(_.key)
      .transformWithState(new QuotaProcessor(bucketMs, cap),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
