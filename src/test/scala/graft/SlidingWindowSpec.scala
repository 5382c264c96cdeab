package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** Structural laws for the sliding-window aggregation: replication factor
  * and decomposition into tumbling sub-buckets.
  */
class SlidingWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("every event lands in exactly width/slide windows") {
    val total = Tables.events(spark, dir).count()
    val replicated = EventOps.eventsSlidingWindow(spark, dir)
      .agg(sum(col("n"))).head().getLong(0)
    val factor = EventOps.SlideWidthMs / EventOps.SlideStepMs
    assert(replicated == factor * total,
      s"$replicated replicated rows != $factor x $total events")
  }

  test("a sliding window is the sum of its tumbling sub-buckets") {
    val ev = Tables.events(spark, dir)
    val us = Tables.eventMicros(ev)
    val step = EventOps.SlideStepMs
    // tumbling 5-minute counts per event_type
    val tumble = ev.select(us.as("us"), col("event_type"))
      .select(expr(s"(us div 1000) div $step").as("b"), col("event_type"))
      .groupBy(col("b"), col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0) * step, r.getString(1)), r.getLong(2)))
      .toMap.withDefaultValue(0L)
    val sliding = EventOps.eventsSlidingWindow(spark, dir)
      .select(col("window_start_ms"), col("event_type"), col("n")).collect()
    assert(sliding.nonEmpty)
    sliding.foreach { r =>
      val (ws, et, n) = (r.getLong(0), r.getString(1), r.getLong(2))
      val expected = tumble((ws, et)) + tumble((ws + step, et))
      assert(n == expected, s"window $ws/$et: $n != $expected")
    }
  }
}
