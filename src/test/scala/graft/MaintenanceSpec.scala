package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MaintenanceOps

/** Compaction rewrites a fragmented parquet directory into few files
  * without a shuffle and without changing the data.
  */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("compact merges a 64-file directory into few files, data unchanged") {
    val frag = Files.createTempDirectory("frag").toString
    val compacted = Files.createTempDirectory("compacted").toString
    val src = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    src.repartition(64).write.mode("overwrite").parquet(frag)
    val before = MaintenanceOps.fileStats(spark, frag).head()
    assert(before.getAs[Long]("n_files") == 64)

    val written = MaintenanceOps.compact(spark, frag, compacted)
    val after = MaintenanceOps.fileStats(spark, compacted).head()
    assert(after.getAs[Long]("n_files") == written.toLong)
    assert(written < 8, s"expected few output files, wrote $written")
    assert(after.getAs[Long]("n_rows") == before.getAs[Long]("n_rows"))
    // content identical, not just counts
    assert(spark.read.parquet(compacted).exceptAll(src).isEmpty)
  }

  test("compact plans no shuffle (coalesce narrows)") {
    val frag = Files.createTempDirectory("frag2").toString
    spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .repartition(8).write.mode("overwrite").parquet(frag)
    val plan = spark.read.parquet(frag).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction plan shuffles:\n$plan")
  }
}
