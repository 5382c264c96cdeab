package graft

/** Dev scanner for explode-family QueryFuzz seeds (Test/runMain): prints
  * each candidate's rendered SQL head and row count at sf0.001 so the
  * registered picks cover all three variants and several tables without
  * vacuousness. Not a test.
  */
object ExplodeSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n = g.build(spark, TestSpark.sfDir).count()
      val head = g.sql.linesIterator.toSeq
      val from_ = head.find(_.startsWith("FROM")).getOrElse("")
      val on = head.find(_.contains(" v ON ")).getOrElse("")
      val dis = if (g.sql.contains("DISTINCT")) "distinct" else ""
      val cond = if (g.sql.contains("CASE WHEN")) "conditional" else ""
      println(s"SEED $seed rows=$n $from_ | ${on.take(90)} | $dis$cond")
    }
    spark.stop()
  }
}
