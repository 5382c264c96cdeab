package graft

/** Dev scanner for the UNPIVOT/stack family (27000+, Test/runMain):
  * prints each candidate's axes (from the generator's own params
  * accessor, not SQL sniffing) and row counts at sf0.001 and sf0.01 so
  * the registered picks cover both null modes, the agg rollup, and all
  * four table menus without vacuousness. Not a test.
  */
object UnpivotSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n1 = g.build(spark, TestSpark.sfDir).count()
      val n2 = g.build(spark, TestSpark.sfDirMid).count()
      val p = graft.fuzz.QueryFuzz.unpivotP(seed)
      println(s"SEED $seed rows_sf0.001=$n1 rows_sf0.01=$n2 " +
        s"${p.table} measures=${p.measures.mkString("+")} " +
        s"punch=${p.punched} includeNulls=${p.includeNulls} " +
        s"agg=${p.agg} slice=${p.m}/${p.r}")
    }
    spark.stop()
  }
}
