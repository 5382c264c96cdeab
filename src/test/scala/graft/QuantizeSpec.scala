package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityOps

/** Degenerate-input guard for int8 quantization: an all-zero embedding
  * must quantize to zero codes with zero error, not NULL/NaN from a
  * divide-by-zero (whose propagation differs between engines).
  */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("all-zero embedding quantizes to scale=0, q_min=q_max=0, mse=0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("quant0").toString
    Seq(
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f), "a"),
      (2L, Array(1.0f, -2.0f, 0.5f, 0.0f), "a"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SimilarityOps.simQuantize(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[Long]("q_min"),
          r.getAs[Long]("q_max"), r.getAs[Double]("mse"))).toMap
    assert(rows(1L) == ((0.0, 0L, 0L, 0.0)), s"zero vector: ${rows(1L)}")
    // the non-degenerate row still quantizes normally
    val (scale, qmin, qmax, mse) = rows(2L)
    assert(scale == 2.0 && qmin == -127L && qmax == 64L && mse >= 0.0)
  }
}
