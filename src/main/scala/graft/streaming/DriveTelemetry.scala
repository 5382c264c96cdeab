package graft.streaming

import scala.collection.concurrent.TrieMap

/** Session-global side channel for the oracle-harness streaming drives:
  * every [[graft.operators.EventOps!.driveWaves]] run records its
  * per-micro-batch state-store row totals (summed across state
  * operators, read off the query's progress ring buffer) just before the
  * drive stops. Two consumers: Bench emits the per-drive PEAK into
  * `bench_detail.json` as `state_peaks` (the bounded-state claim as a
  * recorded number, not just Scaladoc), and StateTelemetrySpec asserts
  * the series DROPS after the sentinel eviction waves — watermark-horizon
  * eviction observed, not argued.
  *
  * Keys are the drive names passed to driveWaves (e.g. `sfz_agg_12000`,
  * `events_window_stream`); a re-run overwrites its previous series, so
  * Bench's two-pass loop reports the last pass.
  */
object DriveTelemetry {
  private val series = TrieMap.empty[String, Seq[Long]]

  def record(name: String, stateRows: Seq[Long]): Unit =
    series.put(name, stateRows)

  def stateSeries(name: String): Option[Seq[Long]] = series.get(name)

  /** Per-drive peak state rows across recorded micro-batches. */
  def peaks: Map[String, Long] =
    series.readOnlySnapshot().toMap.map { case (k, v) =>
      k -> (if (v.isEmpty) 0L else v.max)
    }

  def clear(): Unit = series.clear()
}
