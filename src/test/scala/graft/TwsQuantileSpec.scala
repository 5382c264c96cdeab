package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** The streaming DDSketch monitor's reconciliation laws, asserted
  * directly (the oracle hash-checks the same booleans at sf0.01): the
  * final streamed state must equal the batch aggregate exactly —
  * DDSketch state is a pure multiset function, so micro-batch carving
  * cannot move it — and must sit inside the hard α-bound of the exact
  * order statistics.
  */
class TwsQuantileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed final sketch equals the batch dd_sketch aggregate and " +
      "holds the alpha bound per key") {
    val rows = EventOps.eventsQuantileStream(spark, TestSpark.sfDir).collect()
    assert(rows.length == 5, s"expected 5 event types, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("n_matches"), s"count drifted: $r")
      assert(r.getAs[Boolean]("stream_equals_batch"),
        s"wave carving moved the sketch: $r")
      Seq("ok_p50", "ok_p95", "ok_p99").foreach(c =>
        assert(r.getAs[Boolean](c), s"$c false: $r"))
    }
  }
}
