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
      import graft.fuzz.StreamFuzz
      val (p, twin) =
        if (seed >= StreamFuzz.TwsAggSeedFloor)
          (StreamFuzz.twsAggP(seed).toString, StreamFuzz.twsAggTwin(seed))
        else if (seed >= StreamFuzz.UnionJoinSeedFloor)
          (StreamFuzz.unionJoinP(seed).toString,
            StreamFuzz.unionJoinTwin(seed))
        else if (seed >= StreamFuzz.AggJoinOuterSeedFloor)
          (StreamFuzz.aggJoinOuterP(seed).toString,
            StreamFuzz.aggJoinOuterTwin(seed))
        else if (seed >= StreamFuzz.AggJoinSeedFloor)
          (StreamFuzz.aggJoinP(seed).toString, StreamFuzz.aggJoinTwin(seed))
        else if (seed >= StreamFuzz.DedupJoinSeedFloor)
          (StreamFuzz.dedupJoinP(seed).toString, StreamFuzz.dedupJoinTwin(seed))
        else if (seed >= StreamFuzz.JoinJoinSeedFloor)
          (StreamFuzz.joinJoinP(seed).toString, StreamFuzz.joinJoinTwin(seed))
        else if (seed >= StreamFuzz.DedupAggSeedFloor)
          (StreamFuzz.dedupAggP(seed).toString, StreamFuzz.dedupAggTwin(seed))
        else
          (StreamFuzz.twsJoinP(seed).toString, StreamFuzz.twsJoinTwin(seed))
      val n1 = twin(spark, TestSpark.sfDir).count()
      val n2 = twin(spark, TestSpark.sfDirMid).count()
      val extra =
        if (seed < StreamFuzz.DedupAggSeedFloor)
          " internals_sf0.01=" +
            StreamFuzz.twsJoinInternals(seed, spark, TestSpark.sfDirMid)
        else ""
      println(s"SEED $seed $p twin_sf0.001=$n1 twin_sf0.01=$n2$extra")
    }
    spark.stop()
  }
}
