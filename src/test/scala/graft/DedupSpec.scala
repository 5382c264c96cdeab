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

  test("near-dup pairs sit far below the random simhash hamming baseline") {
    val fp = DedupOps.dedupSimhash(spark, TestSpark.sfDir)
    val jac = DedupOps.dedupNgramJaccard(spark, TestSpark.sfDir)
    val joined = jac.join(fp.withColumnRenamed("doc_id", "da").withColumnRenamed("simhash", "ha"), "da")
      .join(fp.withColumnRenamed("doc_id", "db").withColumnRenamed("simhash", "hb"), "db")
      .select(expr("bit_count(ha ^ hb)").as("hamming"))
    // unrelated 48-bit fingerprints differ in ~24 bits; near-dups must be
    // well under half that (simhash is lossy, so not a hard <= threshold)
    val stats = joined.agg(max(col("hamming")).as("mx"), avg(col("hamming")).as("av")).head()
    assert(stats.getInt(0) <= 15, s"near-dup pair at hamming ${stats.getInt(0)} (random ~24)")
    assert(stats.getDouble(1) <= 8.0, s"mean near-dup hamming ${stats.getDouble(1)} too high")
  }
}
