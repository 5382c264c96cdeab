package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityOps
import graft.operators.SimilarityOps.{PqK, PqM, PqSubDim}

/** Product-quantization laws on the real fixture: the code table has the
  * right shape, seed vectors reconstruct exactly (their sub-slices ARE
  * codewords), and ADC obeys its defining identity — the asymmetric
  * distance of (query, candidate) equals the exact squared L2 between
  * the query and the candidate's RECONSTRUCTION from codewords (up to
  * the 6-dp per-subspace rounding).
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb: Map[Long, Array[Float]] =
    Tables.embeddings(spark, TestSpark.sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private lazy val cb: Map[(Long, Long), Array[Float]] =
    SimilarityOps.pqCodebook(Tables.embeddings(spark, TestSpark.sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Float](2).toArray)
      .toMap

  private lazy val codes: Map[(Long, Long), Long] =
    SimilarityOps.pqEncode(Tables.embeddings(spark, TestSpark.sfDir),
        SimilarityOps.pqCodebook(Tables.embeddings(spark, TestSpark.sfDir)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def recon(vecId: Long): Array[Double] =
    (0 until PqM).flatMap { m =>
      cb((m.toLong, codes((vecId, m.toLong)))).map(_.toDouble)
    }.toArray

  private def sq(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("codes: one code per (vector, subspace), every code in [0, PqK)") {
    val n = emb.size
    assert(codes.size == n * PqM, s"expected ${n * PqM} codes, got ${codes.size}")
    assert(codes.values.forall(c => c >= 0 && c < PqK),
      "code escaped [0, PqK)")
    assert(cb.size == PqM * PqK, s"codebook size ${cb.size}")
    assert(cb.values.forall(_.length == PqSubDim), "codeword dim wrong")
  }

  test("seed vectors reconstruct exactly: their slices are codewords") {
    // the PqK smallest-md5 seeds donated the codewords, so each seed's
    // per-subspace nearest codeword is at distance 0 and the decoded
    // reconstruction is the seed itself
    val zeroRecon = emb.keys.filter { id =>
      val v = emb(id).map(_.toDouble)
      sq(v, recon(id)) == 0.0
    }
    assert(zeroRecon.size >= PqK,
      s"only ${zeroRecon.size} vectors reconstruct exactly; the $PqK seeds must")
  }

  test("ADC identity: search distance == exact distance to reconstruction") {
    val rows = SimilarityOps.pqSearch(
        Tables.embeddings(spark, TestSpark.sfDir),
        Tables.embeddings(spark, TestSpark.sfDir)
          .filter(col("vec_id") < SimilarityOps.NumQueries),
        SimilarityOps.pqCodebook(Tables.embeddings(spark, TestSpark.sfDir)),
        SimilarityOps.TopK)
      .collect()
    assert(rows.nonEmpty, "pqSearch returned nothing")
    rows.foreach { r =>
      val q = emb(r.getAs[Long]("query_id")).map(_.toDouble)
      val adc = r.getAs[Double]("adc")
      val exact = sq(q, recon(r.getAs[Long]("vec_id")))
      assert(math.abs(adc - exact) < 1e-4,
        s"ADC ${adc} != d2(q, recon) $exact for row $r")
    }
  }
}
