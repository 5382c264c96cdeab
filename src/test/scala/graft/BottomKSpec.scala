package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BottomKByHash
import graft.operators.EventOps

/** The custom TypedImperativeAggregate must agree with the window-sort
  * formulation and plan with map-side partial aggregation.
  */
class BottomKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bottom-k sample equals the window row_number formulation") {
    BottomKByHash.register(spark)
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select(col("event_type"), col("event_id").cast("string").as("val"))
    val viaAgg = EventOps.eventsSampleBottomK(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(md5(col("val").cast("binary")), col("val"))
    val viaWindow = ev.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("event_type"), col("rk").cast("long"), col("val"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("plans with partial (map-side) object-hash aggregation") {
    BottomKByHash.register(spark)
    val df = Tables.events(spark, TestSpark.sfDir)
      .select(col("event_type"), col("event_id").cast("string").as("val"))
      .groupBy(col("event_type"))
      .agg(expr("bottom_k_by_hash(val, 3)").as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(plan.contains("partial_bottom_k_by_hash"),
      s"expected map-side partial aggregation:\n$plan")
  }

  test("buffers merge correctly across many partitions") {
    BottomKByHash.register(spark)
    import spark.implicits._
    val vals = (1 to 1000).map(_.toString)
    val expected = vals.sortBy(v => {
      val d = java.security.MessageDigest.getInstance("MD5").digest(v.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }).take(7)
    val got = vals.toDF("val").repartition(32)
      .agg(expr("bottom_k_by_hash(val, 7)")).head().getSeq[String](0)
    assert(got.toList == expected.toList)
  }
}
