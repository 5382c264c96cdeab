package graft.tools

import org.apache.spark.sql.SparkSession

/** Emits `plan_manifest.json` — one normalized [[PlanFingerprint]] per
  * batch query — the committed baseline the Bench plan tripwire diffs
  * against (VERDICT r12 #1: the wall-time/shuffle-bytes tripwires cried
  * wolf across hosts; the plan is the noise-free signal).
  *
  * Usage: runMain graft.tools.PlanManifest <sfDir> <outFile> [q1,q2,...]
  *        (names default to every batch query in SparkEntry)
  *
  * Each query runs ONCE before fingerprinting so session-staged
  * substrates are in place and AQE's final plan — the plan a steady
  * production run sees — is what gets fingerprinted. Streaming drives
  * are excluded by design: their result frames read run-scoped sink
  * dirs, so their "plan" is harness plumbing, not engine shape.
  *
  * `SPARK_GRAFT_PLAN_DEBUG=<dir>` additionally writes the normalized
  * token list per query, for diffing a flagged fingerprint by eye.
  */
object PlanManifest {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val batchNames =
      (graft.SparkEntry.queries.keySet -- graft.SparkEntry.streamingQueries)
        .toSeq.sorted
    val names = if (args.length > 2) args(2).split(",").toSeq else batchNames
    val debugDir = sys.env.get("SPARK_GRAFT_PLAN_DEBUG")
    debugDir.foreach(d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    val fps = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val fp = try {
        fn(spark, sfDir).count() // warm: stage substrates, settle AQE
        val df = fn(spark, sfDir)
        df.count()
        debugDir.foreach { d =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"$name.tokens"),
            PlanFingerprint.debugTokens(df))
        }
        PlanFingerprint.fingerprint(df)
      } catch { case e: Throwable =>
        System.err.println(s"[plan-manifest] $name FAILED: ${e.getMessage}")
        "FAILED"
      }
      spark.catalog.clearCache()
      name -> fp
    }
    val body = fps.sortBy(_._1)
      .map { case (n, f) => s"""  "$n": "$f"""" }.mkString(",\n")
    val json = s"""{\n"sf": "$sfDir",\n"plans": {\n$body\n}\n}\n"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    val failed = fps.count(_._2 == "FAILED")
    println(s"[plan-manifest] wrote ${fps.size} fingerprints " +
      s"($failed failed) to $outFile")
    spark.stop()
  }
}
