package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CosineSimilarity

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (builder mandate: brute-force cosine top-k baseline + a bucketed scale
  * path).
  *
  * Scale design (100 TB):
  * - The query set is broadcast (it is always small relative to the
  *   corpus); the corpus streams through the scorer partition-parallel —
  *   a map-only stage, no corpus shuffle.
  * - Scoring uses the native codegen'd [[graft.functions.CosineSimilarity]]
  *   expression: one fused loop per (query, vector) pair inside
  *   WholeStageCodegen.
  * - Top-k per query is a window rank over (query partition) — at scale
  *   this is the standard per-partition partial top-k then merge;
  *   Spark's TakeOrdered applies per query partition.
  * - The IVF-style variant buckets both sides by a coarse quantizer (sign
  *   bits of leading dimensions) so each query scores only its bucket —
  *   the corpus-side work drops by the bucket fan-out at a measured recall
  *   cost (the classic IVF trade).
  */
object SimilarityOps {

  val TopK = 5
  val NumQueries = 10

  private def scored(spark: SparkSession, dir: String,
      corpus: DataFrame, queries: DataFrame): DataFrame = {
    CosineSimilarity.register(spark)
    queries.as("q").join(corpus.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"),
        expr("cosine_similarity(q.embedding, c.embedding)").as("sim_raw"))
  }

  /** Brute-force exact top-k: broadcast queries x full corpus scan.
    * Rank on the 6-dp-rounded similarity with vec_id tiebreak so results
    * are bit-deterministic across engines.
    */
  def simTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = broadcast(e.filter(col("vec_id") < NumQueries))
    val s = scored(spark, dir, e, queries)
      .withColumn("sim", round(col("sim_raw"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    s.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  val simTopkBruteforceOracle: String =
    s"""WITH q AS (SELECT * FROM embeddings WHERE vec_id < $NumQueries),
      |s AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
      |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(c.embedding AS DOUBLE[])), 6) AS sim
      |  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |            ORDER BY sim DESC, vec_id) AS rk
      |  FROM s)
      |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, sim
      |FROM r WHERE rk <= $TopK
      |ORDER BY query_id, rk""".stripMargin

  /** Coarse quantizer: 3 sign bits of the leading dimensions -> 8 cells.
    * Deterministic, cross-engine (pure comparisons), and a faithful stand-
    * in for a trained IVF codebook: at scale the cell id comes from a
    * centroid argmin instead, but partitioning/shuffle shape is identical.
    */
  private val bucketExprSpark =
    "CAST(4 * CAST(embedding[0] > 0 AS INT) + 2 * CAST(embedding[1] > 0 AS INT) + CAST(embedding[2] > 0 AS INT) AS BIGINT)"
  private val bucketExprDuck =
    "CAST(4 * CAST(embedding[1] > 0 AS INT) + 2 * CAST(embedding[2] > 0 AS INT) + CAST(embedding[3] > 0 AS INT) AS BIGINT)"

  /** IVF/LSH-bucketed ANN: score only within the query's cell. */
  def simIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, dir).withColumn("bucket", expr(bucketExprSpark))
    val queries = broadcast(e.filter(col("vec_id") < NumQueries))
    val s = queries.as("q").join(e.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("q.bucket").as("bucket"),
        col("c.vec_id").as("vec_id"),
        round(expr("cosine_similarity(q.embedding, c.embedding)"), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    s.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("bucket"), col("rk").cast("long").as("rk"),
        col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  val simIvfTopkOracle: String =
    s"""WITH e AS (SELECT *, $bucketExprDuck AS bucket FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id < $NumQueries),
      |s AS (
      |  SELECT q.vec_id AS query_id, q.bucket AS bucket, c.vec_id AS vec_id,
      |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(c.embedding AS DOUBLE[])), 6) AS sim
      |  FROM q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |            ORDER BY sim DESC, vec_id) AS rk
      |  FROM s)
      |SELECT query_id, bucket, CAST(rk AS BIGINT) AS rk, vec_id, sim
      |FROM r WHERE rk <= $TopK
      |ORDER BY query_id, rk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> (simTopkBruteforce _),
    "sim_ivf_topk" -> (simIvfTopk _))

  def oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" -> simTopkBruteforceOracle,
    "sim_ivf_topk" -> simIvfTopkOracle)
}
