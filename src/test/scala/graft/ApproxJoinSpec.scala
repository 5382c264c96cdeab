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

  test("approx_count_distinct within its configured 2% rsd (allow 4x margin)") {
    val approx = RelationalOps.qApproxAgg(spark, TestSpark.sfDir)
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("d"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.08,
        s"flag $k: approx $ap vs exact $ex exceeds 8% error")
    }
  }

  test("approx percentiles sit close to the exact quantiles") {
    val approx = RelationalOps.qApproxAgg(spark, TestSpark.sfDir)
      .select("l_returnflag", "price_p50", "price_p95")
      .as[(String, Double, Double)].collect()
      .map { case (k, p50, p95) => k -> (p50, p95) }.toMap
    val exact = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"))
      .as[(String, Double, Double)].collect()
      .map { case (k, e50, e95) => k -> (e50, e95) }.toMap
    exact.foreach { case (k, (e50, e95)) =>
      val (p50, p95) = approx(k)
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
