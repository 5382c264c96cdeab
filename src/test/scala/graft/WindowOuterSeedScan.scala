package graft

/** Dev scanner for window-over-outer-join QueryFuzz seeds (Test/runMain):
  * prints each candidate's shape axes (variant / join type / null
  * placement / ordering column) and row count at sf0.001 so the
  * registered picks cover all three variants, all three join types, and
  * both null placements without vacuousness. Not a test.
  */
object WindowOuterSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n = g.build(spark, TestSpark.sfDir).count()
      val s = g.sql
      val join = Seq("FULL JOIN", "LEFT JOIN", "RIGHT JOIN")
        .find(s.contains).getOrElse("?")
      val variant =
        if (s.contains("RANK()")) "rank"
        else if (s.contains("LAG(")) "lag"
        else "frame"
      val nulls = if (s.contains("NULLS FIRST")) "first" else "last"
      val ov = if (s.contains("ORDER BY rk")) "rk" else "lk"
      val tbl = s.linesIterator.find(_.contains("FROM ("))
        .map(_.trim.takeRight(30)).getOrElse("")
      println(s"SEED $seed rows=$n $variant $join nulls=$nulls ov=$ov | $tbl")
    }
    spark.stop()
  }
}
