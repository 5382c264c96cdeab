package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoinOps

/** The binned range join must (1) agree with the naive non-equi join and
  * (2) plan as an equi-join on the bin key — never a nested-loop/cartesian
  * product, which is the whole point at scale.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binned range join equals the naive non-equi formulation") {
    val raw = Tables.events(spark, TestSpark.sfDir)
    val ev = raw.withColumn("us", Tables.eventMicros(raw))
    val inc = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("us").as("s"),
        (col("us") + lit(600000000L)).as("e"))
    val pts = ev.select(col("event_id").as("pid"), col("us").as("t"))
    val binned = RangeJoinOps.rangeJoinBinned(pts, inc, "t", "s", "e", 600000000L)
      .select(col("pid"), col("incident_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(inc, col("t") >= col("s") && col("t") < col("e"))
      .select(col("pid"), col("incident_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("matches land in exactly one bin (no duplicate pairs)") {
    val raw = Tables.events(spark, TestSpark.sfDir)
    val ev = raw.withColumn("us", Tables.eventMicros(raw))
    val inc = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("us").as("s"),
        (col("us") + lit(900000000L)).as("e")) // 1.5× bin width → 2-3 bins/interval
    val pts = ev.select(col("event_id").as("pid"), col("us").as("t"))
    val joined = RangeJoinOps.rangeJoinBinned(pts, inc, "t", "s", "e", 600000000L)
      .select(col("pid"), col("incident_id"))
    assert(joined.count() == joined.distinct().count())
  }

  test("plans as an equi-join on the bin, not BroadcastNestedLoopJoin") {
    val plan = RangeJoinOps.qRangeJoin(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
