package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalOps

/** Physical-plan shape assertions: the optimizations we design for must
  * actually fire (SURVEY.md §4; builder mandate "explain and iterate").
  *
  * Plans are materialized (collect) before inspection so AQE's final plan
  * — the one that actually ran — is what gets asserted, and
  * `explainString(formatted)` avoids the truncation in plan toString.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("filter + projection push down to the parquet scan") {
    val plan = finalPlan(RelationalOps.qFilterPushdown(spark, dir))
    assert(plan.contains("PushedFilters"), s"no pushed filters in:\n$plan")
    assert(plan.contains("GreaterThan(l_discount,0.08)"), s"discount predicate not pushed:\n$plan")
    // pruned read schema — only the referenced columns are scanned
    assert(!plan.contains("l_returnflag") && !plan.contains("l_tax"),
      "scan reads columns the query never references")
  }

  test("dimension joins broadcast; no shuffle of the fact side") {
    val plan = finalPlan(RelationalOps.qBroadcastJoin(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = finalPlan(RelationalOps.qSortLimit(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }

  test("grouped aggregation is partial+final hash aggregate") {
    val plan = finalPlan(RelationalOps.q1PricingSummary(spark, dir))
    assert(plan.contains("HashAggregate"), s"expected hash aggregate:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected map-side partial aggregation before the shuffle")
  }

  test("weather pipeline stays in whole-stage codegen up to the aggregate") {
    val plan = finalPlan(graft.operators.WeatherOps.weatherPipeline(spark, dir))
    // formatted mode marks whole-stage-codegen operators with [codegen id : N]
    assert(plan.contains("[codegen id :"), s"no codegen spans:\n$plan")
    assert(plan.contains("HashAggregate"))
  }
}
