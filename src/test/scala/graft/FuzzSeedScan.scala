package graft

/** Dev scanner for candidate StreamFuzz seeds (run via Test/runMain):
  * prints each candidate's params and twin row counts at sf0.001 and
  * sf0.01 so only non-vacuous seeds get registered (memory: family
  * conventions step 4). Not a test — costs nothing in CI.
  */
object FuzzSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val (from, to) = (args(0).toLong, args(1).toLong)
    (from to to).foreach { seed =>
      val p = graft.fuzz.StreamFuzz.twsJoinP(seed)
      val twin = graft.fuzz.StreamFuzz.twsJoinTwin(seed)
      val n1 = twin(spark, TestSpark.sfDir).count()
      val n2 = twin(spark, TestSpark.sfDirMid).count()
      val i = graft.fuzz.StreamFuzz.twsJoinInternals(seed, spark,
        TestSpark.sfDirMid)
      println(s"SEED $seed $p twin_sf0.001=$n1 twin_sf0.01=$n2 " +
        s"internals_sf0.01=$i")
    }
    spark.stop()
  }
}
