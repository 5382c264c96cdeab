package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** A keyed numeric observation for the streaming quantile monitor. */
case class ValObs(key: String, value: Double)

/** Per-key running quantile report: total observed count + DDSketch
  * p50/p95/p99 estimates (NaN sentinels are never emitted — keys with
  * no data emit nothing).
  */
case class KeyQuantiles(key: String, n: Long, p50: Double, p95: Double,
    p99: Double)

/** Serialized DDSketch state: geometric bucket indices + counts, kept
  * index-sorted so the stored state is a canonical function of the
  * observed multiset (batch carving cannot change the bytes).
  */
case class DdBuf(idx: Array[Int], cnt: Array[Long], n: Long, nZero: Long)

/** Streaming percentile monitoring on `transformWithState` ValueState:
  * each key holds ONE DDSketch buffer (the [[graft.functions.DdSketch]]
  * bucket law: `i = ceil(log_γ(x))`, `γ = (1+α)/(1−α)`), folded forward
  * every micro-batch and emitting the running (n, p50, p95, p99) report.
  * Because DDSketch state is a pure function of the observed MULTISET,
  * the final report is identical to the batch `dd_sketch` aggregate over
  * the same rows — for ANY wave carving, which is what the oracle drive
  * asserts (exact match to the batch twin, plus the hard α-bound against
  * exact percentile_disc).
  *
  * State per key is O(log(max/min)/α) buckets regardless of stream
  * length — the sketch is the reason per-key quantile monitoring is
  * feasible as streaming state at all (exact quantiles need the full
  * value log). TimeMode.None: the report is cumulative, no timers.
  */
class DdQuantileProcessor(alpha: Double)
    extends StatefulProcessor[String, ValObs, KeyQuantiles] {

  private val gamma: Double = (1 + alpha) / (1 - alpha)
  private val lnGamma: Double = math.log(gamma)

  @transient private var state: ValueState[DdBuf] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[DdBuf]("dd",
      Encoders.product[DdBuf], TTLConfig.NONE)

  private def quantile(sorted: Array[(Int, Long)], n: Long, nZero: Long,
      q: Double): Double = {
    val k = math.max(1L, math.ceil(q * n).toLong)
    if (k <= nZero) 0.0
    else {
      var cum = nZero
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= k) return 2.0 * math.pow(gamma, sorted(i)._1) / (gamma + 1)
        i += 1
      }
      Double.NaN // unreachable: k <= n by construction
    }
  }

  override def handleInputRows(key: String, rows: Iterator[ValObs],
      tv: TimerValues): Iterator[KeyQuantiles] = {
    val prev = Option(state.get())
    val counts = scala.collection.mutable.HashMap.empty[Int, Long]
    var n = 0L
    var nZero = 0L
    prev.foreach { b =>
      b.idx.indices.foreach(i => counts.update(b.idx(i), b.cnt(i)))
      n = b.n; nZero = b.nZero
    }
    rows.foreach { r =>
      n += 1
      if (r.value <= 0.0) nZero += 1
      else {
        val i = math.ceil(math.log(r.value) / lnGamma).toInt
        counts.update(i, counts.getOrElse(i, 0L) + 1L)
      }
    }
    val sorted = counts.toArray.sortBy(_._1)
    state.update(DdBuf(sorted.map(_._1), sorted.map(_._2), n, nZero))
    if (n == 0L) Iterator.empty
    else Iterator.single(KeyQuantiles(key, n,
      quantile(sorted, n, nZero, 0.5),
      quantile(sorted, n, nZero, 0.95),
      quantile(sorted, n, nZero, 0.99)))
  }
}

object TwsQuantileJob {

  /** Per-key running DDSketch quantile reports, one per key per
    * micro-batch that touched the key (the last report per key is the
    * final cumulative state). Requires the RocksDB state store provider.
    */
  def quantiles(obs: Dataset[ValObs], alpha: Double): Dataset[KeyQuantiles] = {
    import obs.sparkSession.implicits._
    implicit val outEnc: Encoder[KeyQuantiles] = Encoders.product[KeyQuantiles]
    obs
      .groupByKey(_.key)
      .transformWithState(new DdQuantileProcessor(alpha),
        TimeMode.None(), OutputMode.Append())
  }
}
