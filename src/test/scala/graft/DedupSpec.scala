package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Dedup family invariants beyond the per-query DuckDB oracle. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("minhash-LSH pairs are a subset of exact jaccard pairs (verification step)") {
    val jac = DedupOps.dedupNgramJaccard(spark, TestSpark.sfDir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.dedupMinhashLsh(spark, TestSpark.sfDir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(jac), s"LSH produced non-verified pairs: ${lsh.diff(jac)}")
    assert(lsh.nonEmpty, "LSH found no candidate pairs on the fixture corpus")
    val recall = lsh.size.toDouble / jac.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8 (found ${lsh.size}/${jac.size})")
  }

  test("exactDedup (dropDuplicates) keeps one row per key") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val deduped = DedupOps.exactDedup(docs, Seq("lang"))
    assert(deduped.count() == docs.select("lang").distinct().count())
  }

  test("near-dup pairs have near-identical fingerprint hamming distance") {
    val fp = DedupOps.dedupSimhash(spark, TestSpark.sfDir)
    val jac = DedupOps.dedupNgramJaccard(spark, TestSpark.sfDir)
    val joined = jac.join(fp.withColumnRenamed("doc_id", "da").withColumnRenamed("simhash", "ha"), "da")
      .join(fp.withColumnRenamed("doc_id", "db").withColumnRenamed("simhash", "hb"), "db")
      .select(expr("bit_count(ha ^ hb)").as("hamming"))
    val maxHam = joined.agg(max(col("hamming"))).head().getInt(0)
    assert(maxHam <= 4, s"a jaccard>=0.6 near-dup pair had simhash hamming $maxHam")
  }
}
