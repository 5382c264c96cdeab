package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JoinOps

/** Scale-mechanics tests: bucketed co-located joins (shuffle elimination),
  * salted skew joins (correctness of the rewrite), partitioned warehouse
  * writes — the levers the engine relies on at 100 TB, exercised for real
  * on the local session.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a temp dir set statically in TestSpark
    val o = Tables.orders(spark, TestSpark.sfDir)
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed scan: the join itself needs no shuffle; the only
    // exchange allowed is the one for the final aggregation
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("salted join returns the same rows as the plain join") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = li.join(o, "k").groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("q")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = JoinOps.saltedJoin(li, o, "k", salt = 4)
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, v) =>
      assert(math.abs(salted(k) - v) < 1e-6, s"priority $k: salted ${salted(k)} != $v")
    }
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, TestSpark.sfDir)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("event_type") === "click")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("event_type"),
      s"no partition pruning in:\n$plan")
  }
}
