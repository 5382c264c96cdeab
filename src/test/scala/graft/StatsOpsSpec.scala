package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, RelationalOps, StatsOps}

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

  test("benford audit: digits partition the orders, observed and expected " +
      "proportions each sum to 1, and chi-square terms are non-negative") {
    val rows = StatsOps.qBenfordAudit(spark, dir).collect()
    val digits = rows.map(_.getAs[Int]("digit")).sorted
    assert(digits.forall(d => d >= 1 && d <= 9), digits.mkString(","))
    assert(digits.distinct.length == digits.length)
    val nOrders = Tables.orders(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders,
      s"digit counts must partition the ${nOrders} orders")
    val obsSum = rows.map(_.getAs[Double]("obs_p")).sum
    assert(math.abs(obsSum - 1.0) < 1e-2, s"obs_p sums to $obsSum")
    // sum_d log10(1 + 1/d) telescopes to log10(10) = 1 exactly
    if (digits.length == 9) {
      val expSum = rows.map(_.getAs[Double]("exp_p")).sum
      assert(math.abs(expSum - 1.0) < 1e-4, s"exp_p sums to $expSum")
    }
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0.0, r.toString))
  }

  test("ab test: one row, arms partition the click users, and the " +
      "significance boolean thresholds the reported t") {
    val rows = StatsOps.eventsAbTest(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val clickUsers = Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n0") + r.getAs[Long]("n1") == clickUsers)
    val t = r.getAs[Double]("t_stat")
    assert(!t.isNaN && !t.isInfinite, s"t_stat must be finite: $t")
    assert(r.getAs[Boolean]("significant") == (math.abs(t) > 1.96))
  }

  test("gini: Lorenz curve is monotone to 1.0 and the coefficient " +
      "stays in [0, 1)") {
    val rows = StatsOps.curationGini(spark, dir).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("lorenz_cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a - 1e-9 },
      "Lorenz curve must be nondecreasing")
    assert(math.abs(shares.last - 1.0) < 1e-9, s"last share ${shares.last}")
    val gini = rows.head.getAs[Double]("gini")
    assert(rows.forall(r => math.abs(r.getAs[Double]("gini") - gini) < 1e-9))
    assert(gini >= 0.0 - 1e-9 && gini < 1.0, s"gini $gini")
    val totalDocs = Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
  }

  test("decile lift: deciles partition the users, capture is monotone " +
      "to 1.0, and lift times base rate gives the decile rate") {
    val rows = StatsOps.eventsDecileLift(spark, dir).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    val caps = rows.map(_.getAs[Double]("cum_capture"))
    assert(caps.zip(caps.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(math.abs(caps.last - 1.0) < 1e-9, s"final capture ${caps.last}")
    val base = rows.map(_.getAs[Long]("n_conv")).sum.toDouble /
      rows.map(_.getAs[Long]("n_users")).sum
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("lift") * base -
        r.getAs[Double]("conv_rate")) < 2e-4, r.toString)
    }
  }

  test("waterfill: allocations exhaust the budget, uncapped sources keep " +
      "their mass, and capped sources share one level") {
    val rows = StatsOps.curationWaterfill(spark, dir).collect()
    assert(rows.nonEmpty)
    val budget = rows.head.getAs[Long]("budget")
    val total = rows.map(_.getAs[Long]("mass")).sum
    assert(budget == total / 2)
    val allocSum = rows.map(_.getAs[Double]("alloc")).sum
    assert(math.abs(allocSum - budget) < rows.length * 0.011 + 1.0,
      s"allocations sum to $allocSum, budget $budget")
    val (capped, uncapped) = rows.partition(_.getAs[Boolean]("capped"))
    uncapped.foreach(r => assert(
      math.abs(r.getAs[Double]("alloc") - r.getAs[Long]("mass")) < 1e-6,
      s"uncapped source must keep its mass: $r"))
    // a half-mass budget over near-uniform sources caps everything at
    // the common level; skewed masses leave a tail uncapped — both are
    // correct waterfills, so only the shared-level law is universal
    assert(capped.nonEmpty, "half-mass budget must cap at least one source")
    val levels = capped.map(_.getAs[Double]("alloc")).distinct
    assert(levels.length == 1, s"capped sources at different levels: ${levels.toSeq}")
    capped.foreach(r => assert(levels.head <= r.getAs[Long]("mass"), r.toString))
    uncapped.foreach(r => assert(r.getAs[Long]("mass") <= levels.head + 1e-6,
      s"uncapped source above the water level: $r"))
  }

  test("basket affinity: counts nest (pair <= min part count) and the " +
      "ratio columns are consistent") {
    val rows = RelationalOps.qBasketAffinity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pn, c1, c2) = (r.getAs[Long]("pair_n"), r.getAs[Long]("c1"),
        r.getAs[Long]("c2"))
      assert(pn >= 3 && pn <= math.min(c1, c2), r.toString)
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"), r.toString)
      val (sup, conf) = (r.getAs[Double]("support"), r.getAs[Double]("confidence"))
      assert(conf >= sup - 1e-9, s"confidence below support: $r")
      assert(r.getAs[Double]("lift") > 0.0, r.toString)
    }
  }

  test("cohen's kappa: confusion cells partition the corpus and kappa " +
      "reassembles from its own cells") {
    val r = StatsOps.curationCohensKappa(spark, dir).collect().head
    val (n, n11, n10, n01, n00) = (r.getAs[Long]("n"), r.getAs[Long]("n11"),
      r.getAs[Long]("n10"), r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n == Tables.documents(spark, dir).count())
    assert(n11 + n10 + n01 + n00 == n, "cells must partition the corpus")
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)).toDouble / (n.toDouble * n)
    assert(math.abs(r.getAs[Double]("p_observed") - po) < 1e-3)
    assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-3)
    assert(r.getAs[Double]("kappa") <= 1.0 + 1e-9)
  }

  test("diff-in-diff: the estimate is exactly the rounded cell algebra") {
    val r = StatsOps.eventsDiffInDiff(spark, dir).collect().head
    val did = (r.getAs[Double]("t_post") - r.getAs[Double]("t_pre")) -
      (r.getAs[Double]("c_post") - r.getAs[Double]("c_pre"))
    assert(math.abs(r.getAs[Double]("did") -
      BigDecimal(did).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9, r.toString)
  }

  test("kaplan-meier: the risk set telescopes by the event counts and " +
      "survival is nonincreasing to the exhaustion point") {
    val rows = StatsOps.eventsSurvivalKm(spark, dir).collect()
      .sortBy(_.getAs[java.sql.Date]("t").getTime)
    assert(rows.nonEmpty)
    val buyers = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("d")).sum == buyers,
      "events must partition the converters")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_risk") <=
          a.getAs[Long]("n_risk") - a.getAs[Long]("d"),
          s"risk set must shrink by at least the events: $a -> $b")
        assert(b.getAs[Double]("survival") <=
          a.getAs[Double]("survival") + 1e-9,
          s"survival must be nonincreasing: $a -> $b")
      case _ =>
    }
    val last = rows.last
    if (last.getAs[Long]("d") == last.getAs[Long]("n_risk"))
      assert(last.getAs[Double]("survival") == 0.0,
        "exhausted risk set must pin survival to zero")
  }

  test("pareto skyline: no survivor dominates another and every " +
      "non-survivor is dominated by a survivor") {
    val toks = split(col("text"), " ")
    val pts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sky = RelationalOps.qParetoSkyline(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(sky.nonEmpty && sky.size < pts.length)
    def dominates(b: (Long, Long, Double), a: (Long, Long, Double)) =
      (b._2 >= a._2 && b._3 > a._3) || (b._2 > a._2 && b._3 >= a._3)
    val skyPts = pts.filter(p => sky(p._1))
    skyPts.foreach { a =>
      assert(!skyPts.exists(b => b._1 != a._1 && dominates(b, a)),
        s"skyline point dominated within the frontier: $a")
    }
    pts.filterNot(p => sky(p._1)).foreach { a =>
      assert(skyPts.exists(b => dominates(b, a)),
        s"non-skyline point undominated by the frontier: $a")
    }
  }

  test("power analysis: detectable effect shrinks with n and the " +
      "required n is consistent with the variance") {
    val r = StatsOps.eventsPowerAnalysis(spark, dir).collect().head
    val (v, mde) = (r.getAs[Double]("pooled_var"), r.getAs[Double]("mde_now"))
    assert(v > 0 && mde > 0, r.toString)
    val nReq = r.getAs[Long]("n_per_arm_for_unit_effect")
    assert(nReq >= math.floor(2.0 * v * 2.8 * 2.8).toLong &&
      nReq <= math.ceil(2.0 * v * 2.8 * 2.8).toLong + 1, r.toString)
    // at the required n, the detectable effect is (about) the unit
    val mdeAtReq = 2.8 * math.sqrt(2.0 * v / nReq)
    assert(mdeAtReq <= 1.0 + 0.05, s"required n does not reach unit MDE: $r")
  }

  test("abc analysis: classes partition parts, revenue shares nest " +
      "A < B < C boundaries") {
    val rows = RelationalOps.qAbcAnalysis(spark, dir).collect()
      .sortBy(_.getAs[String]("abc_class"))
    assert(rows.map(_.getAs[String]("abc_class")).toSeq.forall(Set("A", "B", "C")))
    val parts = Tables.lineitem(spark, dir)
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == parts)
    rows.foreach { r =>
      assert(r.getAs[Double]("share_lo") <= r.getAs[Double]("share_hi"))
      assert(r.getAs[Double]("class_revenue") > 0)
    }
    val hiByClass = rows.map(r =>
      r.getAs[String]("abc_class") -> r.getAs[Double]("share_hi")).toMap
    assert(hiByClass.get("A").forall(_ <= 0.80 + 1e-9))
    assert(hiByClass.get("B").forall(_ <= 0.95 + 1e-9))
    assert(math.abs(hiByClass("C") - 1.0) < 1e-6,
      "class C must close the cumulative share at 1")
  }

  test("corr matrix: six pairs, each a valid correlation, and the " +
      "known fixture relation (price ~ quantity) is strong") {
    val rows = StatsOps.qCorrMatrix(spark, dir).collect()
    assert(rows.length == 6)
    val m = rows.map(r => r.getAs[String]("pair") ->
      (if (r.isNullAt(1)) None else Some(r.getAs[Double]("pearson")))).toMap
    m.values.flatten.foreach(c => assert(math.abs(c) <= 1.0 + 1e-9))
    // the synthetic measures are drawn independently — every pair
    // should read as noise; a strong correlation would mean the moment
    // algebra (not the fixture) broke
    assert(m.values.flatten.forall(c => math.abs(c) < 0.1),
      s"independent fixture columns must not correlate: $m")
    assert(m.values.forall(_.nonEmpty), s"no pair should be degenerate: $m")
  }

  test("bot score: gap accounting telescopes (n_gaps = events - 1) and " +
      "the flag thresholds the reported cv") {
    val rows = StatsOps.eventsBotScore(spark, dir).collect()
    assert(rows.nonEmpty)
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gaps") ==
        perUser(r.getAs[Long]("user_id")) - 1, r.toString)
      val cv = r.getAs[Double]("cv")
      assert(cv >= 0 && r.getAs[Double]("mean_gap_s") > 0, r.toString)
      assert(r.getAs[Boolean]("is_regular") == (cv < 0.85), r.toString)
    }
  }

  test("duplicate payments: every pair is canonical, same-customer, and " +
      "inside both tolerance windows") {
    val rows = RelationalOps.qDuplicatePayments(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("k1") < r.getAs[Long]("k2"), r.toString)
      assert(r.getAs[Double]("amount_gap") <= 5000.0 + 0.01, r.toString)
      assert(r.getAs[Long]("day_gap") <= 30, r.toString)
    }
  }

  test("temperature mix: both share columns are distributions and the " +
      "boost strictly favors tail languages") {
    val rows = StatsOps.curationTemperatureMix(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("raw_share")).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-2)
    val byShare = rows.sortBy(_.getAs[Double]("raw_share"))
    byShare.sliding(2).foreach {
      case Array(tail, head) =>
        if (tail.getAs[Double]("raw_share") < head.getAs[Double]("raw_share"))
          assert(tail.getAs[Double]("boost") >= head.getAs[Double]("boost") - 1e-9,
            s"temperature must up-weight the smaller language: $tail vs $head")
      case _ =>
    }
  }

  test("bias audit: one row per source, doc counts partition the corpus, " +
      "and the fixture's length-diversity anticorrelation shows up") {
    val rows = StatsOps.curationBiasAudit(spark, dir).collect()
    val sources = Tables.documents(spark, dir)
      .select("source").distinct().count()
    assert(rows.length.toLong == sources)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, dir).count())
    val corrs = rows.filterNot(_.isNullAt(2)).map(_.getAs[Double](2))
    assert(corrs.nonEmpty)
    corrs.foreach(c => assert(math.abs(c) <= 1.0 + 1e-9))
    // longer word-soup docs repeat more tokens -> diversity falls with
    // length; a mostly-negative profile is the expected fixture shape
    assert(corrs.count(_ < 0) > corrs.length / 2,
      s"expected predominantly negative correlations: ${corrs.toSeq}")
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
