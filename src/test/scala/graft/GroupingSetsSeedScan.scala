package graft

/** Dev scanner for the GROUPING SETS family (26000+, Test/runMain):
  * prints each candidate's set-list/key-type axes and row count at
  * sf0.001 so the registered picks cover all four set menus and both
  * key types. Not a test.
  */
object GroupingSetsSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n = g.build(spark, TestSpark.sfDir).count()
      val setsLine = g.sql.linesIterator
        .find(_.contains("GROUPING SETS")).map(_.trim).getOrElse("")
      val from_ = g.sql.linesIterator.find(_.startsWith("FROM"))
        .map(_.take(55)).getOrElse("")
      println(s"SEED $seed rows=$n $setsLine | $from_")
    }
    spark.stop()
  }
}
