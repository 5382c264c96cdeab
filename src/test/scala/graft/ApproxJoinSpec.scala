package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JoinOps, RelationalOps}

/** Error-bound checks for the sketch aggregates (no cross-engine oracle
  * exists for sketches) and semantics checks for the as-of join.
  */
class ApproxJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("qApproxAgg self-validation booleans all hold (sketches within bounds)") {
    val rows = RelationalOps.qApproxAgg(spark, TestSpark.sfDir)
      .select("l_returnflag", "parts_ok", "orders_ok", "p50_ok", "p95_ok").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(1, 2, 3, 4).foreach { i =>
        assert(r.getBoolean(i), s"flag ${r.getString(0)}: ${r.schema(i).name} is false")
      }
    }
  }

  test("approx_count_distinct within its configured 2% rsd (allow 4x margin)") {
    val both = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        countDistinct(col("l_partkey")).as("ex"))
      .as[(String, Long, Long)].collect()
    both.foreach { case (k, ap, ex) =>
      assert(math.abs(ap - ex).toDouble / ex <= 0.08,
        s"flag $k: approx $ap vs exact $ex exceeds 8% error")
    }
  }

  test("approx percentiles sit close to the exact quantiles") {
    val both = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("pq"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"))
      .select(col("l_returnflag"),
        element_at(col("pq"), 1), element_at(col("pq"), 2), col("e50"), col("e95"))
      .as[(String, Double, Double, Double, Double)].collect()
    both.foreach { case (k, p50, p95, e50, e95) =>
      assert(math.abs(p50 - e50) / e50 <= 0.02, s"flag $k p50: $p50 vs $e50")
      assert(math.abs(p95 - e95) / e95 <= 0.02, s"flag $k p95: $p95 vs $e95")
    }
  }

  test("as-of join matches a right row at the exact same timestamp (inclusive bound)") {
    val left = Seq((1L, 100L), (2L, 50L)).toDF("id", "ts")
    val right = Seq((10L, 100L), (11L, 99L)).toDF("rid", "ts_r")
    // single synthetic key joins everything
    val keyed = JoinOps.asOfJoin(
      left.withColumn("k", lit(1)), right.withColumn("k", lit(1)),
      key = "k", leftTs = "ts", rightTs = "ts_r")
      .select(col("id"), col("asof.rid").as("rid")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(keyed(1L).contains(10L), "ts=100 must match the rid=10 row at rts=100 (inclusive)")
    assert(keyed(2L).isEmpty, "ts=50 has no prior right row -> null match")
  }
}
