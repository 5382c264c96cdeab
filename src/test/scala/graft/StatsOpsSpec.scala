package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, StatsOps}

/** Semantic invariants for the corpus-statistics operators, beyond the
  * DuckDB oracle hash check.
  */
class StatsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("sketch rollup: merged HLL estimate within margin of exact at " +
      "both scale steps, and partials sum losslessly") {
    Seq(TestSpark.sfDir, TestSpark.sfDirBig).foreach { d =>
      val rows = StatsOps.qSketchRollup(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getBoolean(3), s"estimate out of margin for ${r.getString(0)} at $d")
      }
      // exact_docs re-derived independently: distinct doc_id per lang
      val expected = Tables.documents(spark, d)
        .groupBy("lang").agg(countDistinct("doc_id").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.foreach { r =>
        assert(r.getLong(1) == expected(r.getString(0)),
          s"partials did not sum losslessly for ${r.getString(0)}")
      }
    }
  }

  test("zipf fit: slope is negative and R2 in (0, 1] for every language") {
    val rows = StatsOps.textZipf(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (slope, r2) = (r.getDouble(1), r.getDouble(2))
      assert(slope < 0, s"${r.getString(0)} slope $slope not negative")
      assert(r2 > 0 && r2 <= 1.0, s"${r.getString(0)} r2 $r2 out of range")
      assert(r.getLong(3) <= StatsOps.ZipfTopRanks)
    }
  }

  test("quantile normalization: decile populations near-uniform per " +
      "source, decile bounds monotone") {
    val rows = StatsOps.curationQuantileNorm(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (src, ds) =>
      val counts = ds.map(_._3)
      // percent_rank deciles over n docs differ by at most a couple of
      // docs between buckets (ties broken by doc_id -> unique ranks)
      assert(counts.max - counts.min <= 2,
        s"$src decile counts not near-uniform: ${counts.mkString(",")}")
      val ordered = ds.sortBy(_._2)
      ordered.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._5 <= b._4 + 1e-9,
          s"$src deciles ${a._2}->${b._2} bounds not monotone")
      }
    }
  }

  test("leakage split: every cluster lands in exactly one split and the " +
      "audit bit is set") {
    val rows = DedupOps.dedupLeakageSplit(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    rows.foreach(r => assert(r.getBoolean(3), "no_leak audit bit false"))
    // independent check: recompute straddle directly from the labels
    val lab = DedupOps.dedupClusters(spark, dir)
      .select(col("doc_id"), col("canonical_id"))
    val straddle = lab
      .withColumn("split",
        conv(substring(md5(col("canonical_id").cast("string").cast("binary")),
          1, 15), 16, 10).cast("long") % 100 < DedupOps.LeakSplitTrainPct)
      .groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("n_sides"))
      .filter(col("n_sides") > 1)
      .count()
    assert(straddle == 0L, s"$straddle clusters straddle the train boundary")
    // doc totals conserved
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, dir).count())
  }

  test("hll intersection: bound boolean holds at two scale steps and the " +
      "exact inclusion-exclusion is internally consistent") {
    for (d <- Seq(dir, TestSpark.sfDirMid)) {
      val rows = StatsOps.qHllIntersection(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Boolean]("inter_ok"), s"sketch bound violated at $d: $r")
        val (a, b, i) = (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"),
          r.getAs[Long]("exact_inter"))
        assert(i >= 0 && i <= math.min(a, b), s"impossible intersection: $r")
      }
    }
  }

  test("dd quantiles: every alpha-bound boolean holds per group at two " +
      "scale steps") {
    for (d <- Seq(dir, TestSpark.sfDirMid)) {
      val rows = StatsOps.qDdQuantiles(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        Seq("ok_p50", "ok_p95", "ok_p99").foreach(c =>
          assert(r.getAs[Boolean](c), s"$c false at $d: $r"))
        assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p95_exact"))
        assert(r.getAs[Double]("p95_exact") <= r.getAs[Double]("p99_exact"))
      }
    }
  }
}
