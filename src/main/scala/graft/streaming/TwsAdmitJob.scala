package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** A view admitted by [[AdmitFirstProcessor]] — the surviving event-time
  * column (`viewTs`) is re-declared as the operator's OUTPUT event time,
  * so downstream stateful operators (the family-L stream-stream join)
  * evict on the watermark propagated THROUGH this operator.
  */
case class AdmittedView(key: Long, viewTs: java.sql.Timestamp)

/** Bucketed first-admission on `transformWithState`: per key, the first
  * event of each fixed time bucket is emitted (with its own event time),
  * every later event of that bucket is suppressed — the impression-dedup
  * / "bill the first view per user-hour" shape.
  *
  * Determinism under micro-batch carving: `handleInputRows` receives a
  * batch's rows in PARTITION order, which is not stable run to run, so
  * admission picks the MIN event time among the batch's rows per bucket
  * (never "first seen in iterator order"). Across batches, the earliest
  * batch that touches a bucket wins — so the admitted row for
  * (key, bucket) is a pure function of {kept rows, their batch indexes}:
  * min event time within the earliest touching batch. The family-L fuzz
  * oracle replays exactly that rule in SQL (ROW_NUMBER over wave, ms).
  *
  * State boundedness: MapState holds only OPEN buckets; an event-time
  * timer sweeps every bucket whose end has passed the current watermark.
  * A swept bucket can never re-admit: a later row for it is
  * watermark-dropped before reaching the processor (its time is below
  * the bucket end, which is below the sweeping watermark, which is below
  * every later batch's late-filter bound — the same closed-bucket
  * argument as [[QuotaProcessor]]).
  *
  * Timer discipline follows TwsSessionJob: timers are delivery signals,
  * state is the truth — the handler sweeps every closeable bucket, so
  * duplicate or stale registrations fire harmlessly.
  */
class AdmitFirstProcessor(bucketMs: Long)
    extends StatefulProcessor[Long, KeyedEvent, AdmittedView] {

  @transient private var admitted: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    admitted = getHandle.getMapState[Long, Long]("admitted",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
      tv: TimerValues): Iterator[AdmittedView] = {
    val best = scala.collection.mutable.Map.empty[Long, Long]
    rows.foreach { e =>
      val ms = e.eventTs.getTime
      val b = Math.floorDiv(ms, bucketMs) * bucketMs
      if (best.get(b).forall(ms < _)) best(b) = ms
    }
    best.toSeq.sortBy(_._1).iterator.flatMap { case (b, ms) =>
      if (admitted.containsKey(b)) Iterator.empty
      else {
        admitted.updateValue(b, ms)
        // a timer must sit past the current watermark or the engine
        // rejects it (the bucket would already be closeable)
        getHandle.registerTimer(
          math.max(b + bucketMs, tv.getCurrentWatermarkInMs() + 1))
        Iterator.single(AdmittedView(key, new java.sql.Timestamp(ms)))
      }
    }
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[AdmittedView] = {
    val wm = tv.getCurrentWatermarkInMs()
    admitted.iterator()
      .filter { case (b, _) => b + bucketMs <= wm }
      .map(_._1).toArray.foreach(admitted.removeKey)
    Iterator.empty
  }
}

object TwsAdmitJob {

  /** First-per-(key, `bucketMs`-bucket) admission with the admitted
    * row's own time re-declared as the output event-time column — the
    * transformWithState composition point for a DOWNSTREAM stateful
    * operator. Requires the RocksDB state store provider.
    */
  def admitFirst(views: Dataset[KeyedEvent], bucketMs: Long,
      delay: String = "0 seconds"): Dataset[AdmittedView] = {
    import views.sparkSession.implicits._
    implicit val outEnc: Encoder[AdmittedView] = Encoders.product[AdmittedView]
    views
      .withWatermark("eventTs", delay)
      .groupByKey(_.key)
      .transformWithState(new AdmitFirstProcessor(bucketMs),
        "viewTs", OutputMode.Append())
  }
}
