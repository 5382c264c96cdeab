package graft

/** Dev scanner for the null-aware anti/semi subquery family (24000+,
  * Test/runMain): prints each candidate's variant/edge/punch axes and
  * row counts at sf0.001 and sf0.01 so the registered picks cover all
  * four variants and the empty-inner branch without vacuousness. Not a
  * test.
  */
object AntiSemiSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val g = graft.fuzz.QueryFuzz.generate(seed)
      val n1 = g.build(spark, TestSpark.sfDir).count()
      val n2 = g.build(spark, TestSpark.sfDirMid).count()
      // axes come from the generator's own params accessor, not from
      // sniffing the rendered SQL (formatting-change-proof)
      val ap = graft.fuzz.QueryFuzz.antiSemiP(seed)
      val empty = if (ap.emptyInner) " emptyInner" else ""
      println(s"SEED $seed rows_sf0.001=$n1 rows_sf0.01=$n2 " +
        s"${ap.variantName}$empty | ${ap.outer} vs ${ap.inner} " +
        s"punch=${ap.punch} m=${ap.m} r=${ap.r}")
    }
    spark.stop()
  }
}
