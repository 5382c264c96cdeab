package graft

/** Dev scanner for the PIVOT family (25000+, Test/runMain): prints each
  * candidate's variant/table/pivot-column axes and group count at
  * sf0.001 so the registered picks cover all three variants and every
  * pivot domain. Not a test.
  */
object PivotSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n = g.build(spark, TestSpark.sfDir).count()
      val v = if (g.sql.contains("_sd")) "both"
        else if (g.sql.contains("ROUND")) "sum-double" else "sum-int"
      val pc = Seq("l_returnflag", "l_linestatus", "o_orderstatus",
        "c_mktsegment").find(g.sql.contains).getOrElse("?")
      val from_ = g.sql.linesIterator.find(_.startsWith("FROM"))
        .map(_.take(50)).getOrElse("")
      println(s"SEED $seed rows=$n $v $pc | $from_")
    }
    spark.stop()
  }
}
