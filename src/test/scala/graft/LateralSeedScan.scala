package graft

/** Dev scanner for LATERAL-family QueryFuzz seeds (Test/runMain): prints
  * each candidate's shape axes and row count at sf0.001 so the registered
  * picks cover all three variants and several edges without vacuousness.
  * Not a test.
  */
object LateralSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n = g.build(spark, TestSpark.sfDir).count()
      val s = g.sql
      val variant =
        if (s.contains("CROSS JOIN LATERAL")) "agg"
        else if (s.contains("LEFT JOIN LATERAL")) "left"
        else "inner"
      val edge = s.linesIterator.find(_.contains("FROM"))
        .map(_.trim.take(60)).getOrElse("")
      println(s"SEED $seed rows=$n $variant | $edge")
    }
    spark.stop()
  }
}
