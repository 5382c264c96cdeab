package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityOps

/** SRP-LSH ANN evidence, mirroring KMeansSpec's IVF story: the index must
  * EARN its pruning — high recall on a corpus with cluster structure while
  * scoring a small fraction of the brute-force pairs. (The isotropic sf
  * fixture is the documented worst case for any space-partitioning ANN;
  * the oracle checks exactness of the bucketed semantics there, this spec
  * measures usefulness in the realistic clustered regime.)
  */
class LshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("signatures are deterministic and band-complete") {
    val e = graft.Tables.embeddings(spark, dir)
    val s1 = SimilarityOps.rpSignature(e, 64).orderBy("vec_id").collect()
    val s2 = SimilarityOps.rpSignature(e, 64).orderBy("vec_id").collect()
    assert(s1.sameElements(s2), "rpSignature is not deterministic")
    // every band value must be a valid RpBandBits-bit integer
    val bad = SimilarityOps.rpSignature(e, 64)
      .filter((0 until SimilarityOps.RpBands).map(b =>
        col(s"band$b") < 0 || col(s"band$b") >= (1 << SimilarityOps.RpBandBits))
        .reduce(_ || _))
      .count()
    assert(bad == 0, s"$bad vectors have out-of-range band values")
  }

  test("clustered corpus: recall >= 0.9 while scoring <= 25% of the " +
      "brute-force pairs") {
    import spark.implicits._
    val d = 32; val nClusters = 50; val nVecs = 5000; val nQueries = 10
    val rnd = new scala.util.Random(42) // seeded -> deterministic fixture
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(normalize(Array.fill(d)(rnd.nextGaussian())))
    val corpus = (0 until nVecs).map { i =>
      val v = normalize(centers(i % nClusters).map(_ + 0.05 * rnd.nextGaussian()))
      (i.toLong, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding").repartition(8).cache()
    try {
      val queries = corpus.filter(col("vec_id") < nQueries)
      graft.functions.CosineSimilarity.register(spark)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
      val bf = queries.as("q")
        .join(corpus.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"),
          round(expr("cosine_similarity(q.embedding, c.embedding)"), 6).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= SimilarityOps.TopK)
        .select("query_id", "vec_id").cache()

      val lsh = SimilarityOps.lshSearch(corpus, queries, d, SimilarityOps.TopK)
      val hits = lsh.select("query_id", "vec_id").intersect(bf).count()
      val recall = hits.toDouble / bf.count()
      assert(recall >= 0.9,
        s"clustered SRP-LSH recall@${SimilarityOps.TopK} = $recall < 0.9")

      val scoredPairs = SimilarityOps.lshCandidates(corpus, queries, d).count()
      val bfPairs = nQueries.toLong * (nVecs - 1)
      assert(scoredPairs <= 0.25 * bfPairs,
        s"SRP-LSH scored $scoredPairs pairs — more than 25% of brute force's $bfPairs")
      info(f"recall $recall%.3f, scored $scoredPairs/$bfPairs pairs " +
        f"(${100.0 * scoredPairs / bfPairs}%.1f%%)")
    } finally corpus.unpersist()
  }

  test("lsh results carry exact (brute-force-equal) similarities") {
    // every (query, vec, sim) the LSH query returns must equal the
    // brute-force similarity for that pair — bucketing may lose
    // neighbors, it must never corrupt a score
    val lsh = SimilarityOps.simLshTopk(spark, dir)
      .select("query_id", "vec_id", "sim")
    val bfAll = SimilarityOps.queries("sim_topk_bruteforce")(spark, dir)
      .select("query_id", "vec_id", "sim")
    // restrict to pairs present in both top-k outputs (bruteforce only
    // materializes its own top-k, so compare on the intersection)
    val joined = lsh.as("l").join(bfAll.as("b"), Seq("query_id", "vec_id"))
      .filter(col("l.sim") =!= col("b.sim"))
    assert(joined.count() == 0, "LSH returned a similarity that differs " +
      "from the brute-force score for the same pair")
  }
}
