package graft

/** Dev probe (Test/runMain): does Spark 4.1 parse/plan the LATERAL
  * correlated-top-N shapes a prospective fuzz family would share with
  * DuckDB? Prints OK/FAIL per candidate text. Not a test.
  */
object LateralProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    Seq("customer", "orders", "lineitem").foreach(t =>
      Tables.table(spark, TestSpark.sfDir, t).createOrReplaceTempView(t))
    val tests = Seq(
      "inner_join_lateral" ->
        """SELECT c.c_custkey AS key, t.v AS v, t.uid AS uid
          |FROM customer c JOIN LATERAL (
          |  SELECT o_totalprice AS v, o_orderkey AS uid FROM orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true
          |ORDER BY key, uid LIMIT 5""".stripMargin,
      "left_join_lateral" ->
        """SELECT c.c_custkey AS key, t.v AS v, t.uid AS uid
          |FROM customer c LEFT JOIN LATERAL (
          |  SELECT o_totalprice AS v, o_orderkey AS uid FROM orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true
          |ORDER BY key, uid LIMIT 5""".stripMargin,
      "cross_join_lateral_agg" ->
        """SELECT c.c_custkey AS key, CAST(t.cnt AS BIGINT) AS a0,
          |       ROUND(t.s * (1.0 + 1e-12), 2) AS a1
          |FROM customer c CROSS JOIN LATERAL (
          |  SELECT COUNT(*) AS cnt, SUM(v) AS s FROM (
          |    SELECT o_totalprice AS v FROM orders
          |    WHERE o_custkey = c.c_custkey
          |    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)) t
          |ORDER BY key LIMIT 5""".stripMargin)
    tests.foreach { case (name, sql) =>
      try {
        val rows = spark.sql(sql).collect()
        println(s"LPROBE $name OK ${rows.take(2).mkString(" ")}")
      } catch {
        case e: Throwable =>
          println(s"LPROBE $name FAIL ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
