package graft

/** Dev scanner for candidate StreamFuzz seeds (run via Test/runMain):
  * prints each candidate's params and twin row counts at sf0.001 and
  * sf0.01 so only non-vacuous seeds get registered (memory: family
  * conventions step 4). Not a test — costs nothing in CI.
  *
  * Params/twin resolution goes through the single
  * [[graft.fuzz.StreamFuzz.paramsFor]]/[[graft.fuzz.StreamFuzz.twinFor]]
  * dispatch, so every family (past and future) scans correctly without
  * touching this file.
  */
object FuzzSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      import graft.fuzz.StreamFuzz
      val p = StreamFuzz.paramsFor(seed).toString
      val twin = StreamFuzz.twinFor(seed)
      val n1 = twin(spark, TestSpark.sfDir).count()
      val n2 = twin(spark, TestSpark.sfDirMid).count()
      val extra =
        if (seed >= StreamFuzz.TwsJoinSeedFloor &&
            seed < StreamFuzz.DedupAggSeedFloor)
          " internals_sf0.01=" +
            StreamFuzz.twsJoinInternals(seed, spark, TestSpark.sfDirMid)
        else ""
      println(s"SEED $seed $p twin_sf0.001=$n1 twin_sf0.01=$n2$extra")
    }
    spark.stop()
  }
}
