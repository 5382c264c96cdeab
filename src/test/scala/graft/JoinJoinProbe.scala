package graft

/** Dev probe for family N (Test/runMain): drive the double stream-stream
  * join for the given seeds and diff the finalized output against the
  * in-Spark batch twin. Not a test.
  */
object JoinJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = if (args.length > 1 && args(1) == "mid") TestSpark.sfDirMid
      else TestSpark.sfDir
    args(0).split(",").map(_.toLong).foreach { seed =>
      import graft.fuzz.StreamFuzz
      try {
        val drive = StreamFuzz.generate(seed).build(spark, dir)
          .collect().map(_.toSeq).toSeq
        // single-source dispatch: any family's seed probes correctly
        val twin = StreamFuzz.twinFor(seed)(spark, dir)
          .collect().map(_.toSeq).toSeq
        val ok = drive == twin
        println(s"PROBE $seed drive=${drive.size} twin=${twin.size} match=$ok")
        if (!ok) {
          (drive.toSet -- twin.toSet).take(5)
            .foreach(r => println(s"  drive-only: $r"))
          (twin.toSet -- drive.toSet).take(5)
            .foreach(r => println(s"  twin-only:  $r"))
        }
      } catch {
        case e: Throwable =>
          println(s"PROBE $seed THREW: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
