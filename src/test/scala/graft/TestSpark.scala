package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (guide: one session per suite;
  * sharing across suites is safe here since config is identical).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // production install path: the extensions class is loaded by NAME
      // via reflection at context/session creation — every suite runs
      // against an extensions-installed session, and the dedicated
      // SortedIntersectSpec case proves resolution in a clean newSession()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
  // 10x document step for scaling-regression guards (sf0.001 and sf0.01
  // share the same 500-doc documents table; sf0.1 is the 5000-doc one)
  val sfDirMid = "/root/testdata/sf0.01"
  val sfDirBig = "/root/testdata/sf0.1"
}
