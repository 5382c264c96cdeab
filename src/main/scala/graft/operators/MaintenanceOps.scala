package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-based-warehouse maintenance: the small-file problem is the #1
  * operational failure mode of a 100 TB parquet lake (every file is a
  * task + a footer fetch; millions of KB-sized files stall the driver
  * and the scan). These utilities keep table layout healthy; they are
  * operational tools, not queries, so they are ScalaTest-covered rather
  * than oracle-checked.
  */
object MaintenanceOps {

  /** Per-file layout stats for a parquet directory: files, rows per
    * file, skew. Uses `input_file_name` so the stats come from one scan
    * with no extra metadata pass.
    */
  def fileStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        min(col("n_rows")).as("min_rows_per_file"),
        max(col("n_rows")).as("max_rows_per_file"))

  /** Rewrite a parquet directory into ~`targetFileBytes` output files.
    * The file count comes from the optimizer's size estimate;
    * `coalesce` narrows partitions without a shuffle (compaction must
    * not pay one — it is IO-bound by design). Returns the file count
    * written.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20): Int = {
    val df = spark.read.parquet(inDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes.toDouble).toInt)
    df.coalesce(n).write.mode("overwrite").parquet(outDir)
    n
  }
}
