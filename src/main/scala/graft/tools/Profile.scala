package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{DedupOps, TextOps}

/** Ad-hoc stage profiler for the heavy dedup queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val sh = TextOps.docShingles(docs).cache()
    time("shingles materialize")(sh.count())
    time("shingles count again")(sh.count())
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    time("sizes")(sizes.count())
    val rare = sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= DedupOps.MaxShingleDf)
    time("rare (window df)")(rare.count())
    val rareG = sh.groupBy(col("s")).agg(collect_list(col("doc_id")).as("docs"))
      .filter(size(col("docs")) <= DedupOps.MaxShingleDf)
    time("rare (groupBy form)")(rareG.count())
    val cand = rare.as("a").join(rare.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    time("cand (self-join)")(cand.count())
    val candG = rareG.select(explode(expr(
        "flatten(transform(docs, (d, i) -> transform(slice(docs, i + 2, size(docs)), d2 -> struct(d AS da, d2 AS db))))")).as("p"))
      .select(least(col("p.da"), col("p.db")).as("da"),
        greatest(col("p.da"), col("p.db")).as("db"))
      .filter(col("da") < col("db")).distinct()
    time("cand (pair-gen form)")(candG.count())
    time("full jaccard query")(DedupOps.dedupNgramJaccard(spark, sfDir).count())
    time("full minhash query")(DedupOps.dedupMinhashLsh(spark, sfDir).count())
    spark.stop()
  }
}
