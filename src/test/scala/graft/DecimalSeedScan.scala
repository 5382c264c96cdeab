package graft

/** Dev scanner for the DECIMAL arithmetic family (28000+, Test/runMain):
  * prints each candidate's axes (from the generator's params accessor,
  * not SQL sniffing) and row counts at sf0.001 and sf0.01 so the
  * registered picks cover all four variants and the negative-valued
  * money column without vacuousness. Not a test.
  */
object DecimalSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n1 = g.build(spark, TestSpark.sfDir).count()
      val n2 = g.build(spark, TestSpark.sfDirMid).count()
      val p = graft.fuzz.QueryFuzz.decimalP(seed)
      println(s"SEED $seed rows_sf0.001=$n1 rows_sf0.01=$n2 " +
        s"${p.table}.${p.x} variant=${p.variant} grp%${p.m} " +
        s"slice=${p.sm}/${p.r}")
    }
    spark.stop()
  }
}
