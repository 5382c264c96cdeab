package graft

/** Dev scanner for the JSON round-trip family (29000+, Test/runMain):
  * prints each candidate's axes (from the generator's params accessor)
  * and row counts at sf0.001 and sf0.01 so the registered picks cover
  * all five variants and all three tables without vacuousness. Not a
  * test.
  */
object JsonSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n1 = g.build(spark, TestSpark.sfDir).count()
      val n2 = g.build(spark, TestSpark.sfDirMid).count()
      val p = graft.fuzz.QueryFuzz.jsonP(seed)
      println(s"SEED $seed rows_sf0.001=$n1 rows_sf0.01=$n2 " +
        s"${p.table} variant=${p.variant} punch=${p.punch} " +
        s"slice=${p.sm}/${p.r}")
    }
    spark.stop()
  }
}
