package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventOps, JoinOps, RelationalOps}

/** Equivalence laws for the day-bucketed interval union and the
  * nearest-direction as-of join, each checked against a straightforward
  * in-memory reference implementation at sf0.001.
  */
class IntervalNearestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("day-bucketed interval union equals the global (unbucketed) merge " +
      "after stitching at day boundaries") {
    val ev = Tables.events(spark, dir)
    val us = Tables.eventMicros(ev)
    val starts = ev.filter(col("event_type") === "error")
      .select(us.as("us")).select(expr("us div 1000").as("ms"))
      .collect().map(_.getLong(0)).sorted
    // reference: plain global sweep, no day decomposition
    val w = EventOps.IncidentWidthMs
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    starts.foreach { s =>
      val e = s + w
      if (merged.nonEmpty && s <= merged.last._2)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, e))
      else merged += ((s, e))
    }
    val out = EventOps.eventsMergeIntervals(spark, dir)
      .select(col("start_ms"), col("end_ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // stitch operator intervals that abut exactly at a day boundary —
    // the only split the bucketed sweep introduces
    val stitched = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    out.foreach { case (s, e) =>
      if (stitched.nonEmpty && s == stitched.last._2)
        stitched(stitched.length - 1) = (stitched.last._1, e)
      else stitched += ((s, e))
    }
    assert(stitched.toSeq == merged.toSeq,
      s"bucketed union != global union (${stitched.length} vs ${merged.length} intervals)")
    // and coverage adds up either way
    assert(stitched.map(p => p._2 - p._1).sum == merged.map(p => p._2 - p._1).sum)
  }

  test("nearest as-of picks the true nearest click with the backward tie " +
      "rule (brute-force cross-check)") {
    val ev = Tables.events(spark, dir)
    val us = Tables.eventMicros(ev)
    val base = ev.select(col("event_id"), col("user_id"),
      col("event_type"), us.as("us"))
    val clicksByUser = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = purchases.map { case (eid, uid, t) =>
      val cs = clicksByUser.getOrElse(uid, Array.empty[Long])
      val back = cs.filter(_ <= t).lastOption
      val fwd = cs.find(_ >= t)
      val pick = (back, fwd) match {
        case (None, None) => None
        case (Some(b), None) => Some(b)
        case (None, Some(f)) => Some(f)
        case (Some(b), Some(f)) => if (t - b <= f - t) Some(b) else Some(f)
      }
      eid -> pick
    }.toMap
    val got = JoinOps.qAsofNearest(spark, dir)
      .select(col("event_id"), col("click_us")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.keySet == expected.keySet)
    val bad = got.filter { case (k, v) => expected(k) != v }
    assert(bad.isEmpty, s"${bad.size} mismatches, e.g. ${bad.take(3)}")
  }

  test("skew metrics: heaviest key really is the max-count key and the " +
      "factor is max/avg") {
    val row = RelationalOps.qSkewMetrics(spark, dir).head()
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val maxN = counts.map(_._2).max
    val heaviest = counts.filter(_._2 == maxN).map(_._1).min
    assert(row.getAs[Long]("max_rows_per_key") == maxN)
    assert(row.getAs[Long]("heaviest_key") == heaviest)
    val avg = counts.map(_._2).sum.toDouble / counts.length
    assert(math.abs(row.getAs[Double]("skew_factor") - maxN / avg) < 1e-3)
  }
}
