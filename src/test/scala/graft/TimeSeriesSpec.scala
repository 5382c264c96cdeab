package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeriesOps

/** Invariant laws for the time-series operators, beyond the DuckDB hash
  * check: EWMA convexity and head renormalization, autocorrelation range,
  * and MERGE status classification being a partition of the key space.
  */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("ewma: head row equals its own x (weights renormalize), and every " +
      "row stays inside the trailing-5-day envelope (convex combination)") {
    val rows = TimeSeriesOps.eventsEwma(spark, dir)
      .withColumn("lo", least(col("x"),
        min(col("x")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day")).rowsBetween(-4, 0))))
      .withColumn("hi", greatest(col("x"),
        max(col("x")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day")).rowsBetween(-4, 0))))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, e) = (r.getAs[Double]("x"), r.getAs[Double]("ewma"))
      if (r.getAs[Int]("rn") == 1)
        assert(math.abs(e - BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"head ewma must equal x: $r")
      assert(e >= r.getAs[Double]("lo") - 1e-6 && e <= r.getAs[Double]("hi") + 1e-6,
        s"ewma outside trailing envelope: $r")
    }
  }

  test("autocorr: every coefficient is a correlation (|acf| <= 1) and " +
      "pair counts shrink with the lag") {
    val rows = TimeSeriesOps.eventsAutocorr(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("acf")))
        assert(math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-9, r.toString)
    }
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rs =>
      val n1 = rs.find(_.getAs[Long]("lag_days") == 1L).map(_.getAs[Long]("n_pairs"))
      val n7 = rs.find(_.getAs[Long]("lag_days") == 7L).map(_.getAs[Long]("n_pairs"))
      for (a <- n1; b <- n7) assert(a >= b, s"lag-1 pairs $a < lag-7 pairs $b")
    }
  }

  test("gap_fill: each series is a contiguous calendar bounded by observed " +
      "days, and every interpolated value sits inside its bracket") {
    val rows = TimeSeriesOps.eventsGapFill(spark, dir).collect()
    assert(rows.nonEmpty)
    val byKey = rows.groupBy(r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    assert(byKey.nonEmpty)
    var sawInterp = false
    byKey.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
      // contiguous calendar: row count == span in days
      val span = sorted.last.getAs[java.sql.Date]("day").toLocalDate.toEpochDay -
        sorted.head.getAs[java.sql.Date]("day").toLocalDate.toEpochDay + 1
      assert(sorted.length.toLong == span, s"calendar has holes: $span vs ${sorted.length}")
      // boundaries are observed by construction
      assert(sorted.head.getAs[Boolean]("observed"), "first day must be observed")
      assert(sorted.last.getAs[Boolean]("observed"), "last day must be observed")
      // interpolated values inside the bracketing observed values
      var i = 0
      while (i < sorted.length) {
        if (!sorted(i).getAs[Boolean]("observed")) {
          sawInterp = true
          val prev = sorted.take(i).reverse.find(_.getAs[Boolean]("observed")).get
          val next = sorted.drop(i + 1).find(_.getAs[Boolean]("observed")).get
          val (lo, hi) = (math.min(prev.getAs[Double]("x_filled"),
            next.getAs[Double]("x_filled")),
            math.max(prev.getAs[Double]("x_filled"), next.getAs[Double]("x_filled")))
          val v = sorted(i).getAs[Double]("x_filled")
          assert(v >= lo - 1e-3 && v <= hi + 1e-3,
            s"interpolation $v escapes bracket [$lo, $hi]")
        }
        i += 1
      }
    }
    assert(sawInterp, "fixture must exercise at least one interpolated day")
  }

  test("rolling_median: the median stays inside the trailing window " +
      "envelope and heads equal their own x") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day")).rowsBetween(-6, 0)
    val rows = TimeSeriesOps.eventsRollingMedian(spark, dir)
      .withColumn("lo", min(col("x")).over(w))
      .withColumn("hi", max(col("x")).over(w))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("event_type")).orderBy(col("day"))))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("med7")
      assert(m >= r.getAs[Double]("lo") - 1e-6 && m <= r.getAs[Double]("hi") + 1e-6,
        s"median outside window envelope: $r")
      if (r.getAs[Int]("rn") == 1)
        assert(math.abs(m - BigDecimal(r.getAs[Double]("x"))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"head median must equal its own x: $r")
    }
  }

  test("streaks: per-user accounting is consistent and matches the " +
      "distinct active-day count") {
    val rows = TimeSeriesOps.eventsStreaks(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, dir)
    val expect = ev.select(col("user_id"),
        to_date(timestamp_micros(Tables.eventMicros(ev))).as("day"))
      .distinct().groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val (longest, nStreaks, active) = (r.getAs[Long]("longest_streak"),
        r.getAs[Long]("n_streaks"), r.getAs[Long]("active_days"))
      assert(longest >= 1 && longest <= active, r.toString)
      assert(nStreaks >= 1 && active >= nStreaks, r.toString)
      // n_streaks runs of total length active_days: longest >= ceil(avg)
      assert(longest * nStreaks >= active, r.toString)
      assert(expect(r.getAs[Long]("user_id")) == active,
        s"active_days disagrees with distinct day count: $r")
    }
  }

  test("changepoint: one row per type, the break sits inside the " +
      "calendar, and the shift is the rounded mean difference") {
    val rows = TimeSeriesOps.eventsChangepoint(spark, dir).collect()
    val types = Tables.events(spark, dir)
      .select(col("event_type")).distinct().count()
    assert(rows.length.toLong == types, s"${rows.length} rows vs $types types")
    val ev = Tables.events(spark, dir)
    val span = ev.agg(
      min(to_date(timestamp_micros(Tables.eventMicros(ev)))).as("mn"),
      max(to_date(timestamp_micros(Tables.eventMicros(ev)))).as("mx")).head()
    rows.foreach { r =>
      val cp = r.getAs[java.sql.Date]("cp_day")
      assert(!cp.before(span.getAs[java.sql.Date]("mn")) &&
        !cp.after(span.getAs[java.sql.Date]("mx")), s"cp outside span: $r")
      val (b, a, s) = (r.getAs[Double]("mean_before"),
        r.getAs[Double]("mean_after"), r.getAs[Double]("shift"))
      assert(math.abs(s - BigDecimal(a - b).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, r.toString)
    }
  }

  test("trend forecast: R-squared is a proportion and the forecast " +
      "extrapolates the fitted line") {
    val rows = TimeSeriesOps.eventsTrendForecast(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("r2"))) {
        val r2 = r.getAs[Double]("r2")
        assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 out of range: $r")
      }
      if (!r.isNullAt(r.fieldIndex("slope"))) {
        val line = r.getAs[Double]("intercept") +
          r.getAs[Double]("slope") * (r.getAs[Long]("n") + 6)
        // slope/intercept are rounded independently of forecast_7d, so
        // agreement is to rounding granularity amplified by the horizon
        assert(math.abs(r.getAs[Double]("forecast_7d") - line) < 0.01 *
          (r.getAs[Long]("n") + 7), s"forecast off the fitted line: $r")
      }
    }
  }

  test("stl decompose: components reassemble to x within rounding and " +
      "residuals cancel within each weekday cell") {
    val rows = TimeSeriesOps.eventsStlDecompose(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dow = r.getAs[Long]("dow")
      assert(dow >= 0 && dow <= 6, r.toString)
      val re = r.getAs[Double]("x") - r.getAs[Double]("trend") -
        r.getAs[Double]("seasonal") - r.getAs[Double]("resid")
      assert(math.abs(re) < 3e-4, s"components do not reassemble: $r")
    }
    rows.groupBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow")))
      .foreach { case (k, rs) =>
        val s = rs.map(_.getAs[Double]("resid")).sum
        assert(math.abs(s) < rs.length * 2e-4 + 1e-6,
          s"weekday-cell residuals do not cancel at $k: $s")
      }
  }

  test("forecast backtest: evaluation windows are leakage-free by count " +
      "and the error metrics are nonnegative") {
    val rows = TimeSeriesOps.eventsForecastBacktest(spark, dir).collect()
    assert(rows.nonEmpty)
    val days = Tables.events(spark, dir)
      .select(to_date(timestamp_micros(Tables.eventMicros(
        Tables.events(spark, dir)))).as("day"))
      .distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_evals") == days - 14,
        s"each type evaluates exactly the post-warmup days: $r")
      assert(r.getAs[Double]("mae") >= 0.0, r.toString)
      assert(r.getAs[Double]("wape_pct") >= 0.0, r.toString)
    }
  }

  test("rolling distinct: the 7-day count brackets between the daily " +
      "count and the user universe") {
    val ev = Tables.events(spark, dir)
    val dailyU = ev.select(col("event_type"),
        to_date(timestamp_micros(Tables.eventMicros(ev))).as("day"),
        col("user_id"))
      .distinct().groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toString) ->
        r.getLong(2)).toMap
    val users = ev.select("user_id").distinct().count()
    val rows = TimeSeriesOps.eventsRollingDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    var widened = false
    rows.foreach { r =>
      val key = (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString)
      val u7 = r.getAs[Long]("u7")
      val u1 = dailyU.getOrElse(key, 0L)
      assert(u7 >= u1, s"window count below the single day at $key")
      assert(u7 <= users, s"window count above the universe at $key")
      if (u7 > u1) widened = true
    }
    assert(widened, "the 7-day window never widened past one day")
  }

  test("seasonal forecast: a full 7-day horizon per type starting the " +
      "day after the calendar ends") {
    val rows = TimeSeriesOps.eventsSeasonalForecast(spark, dir).collect()
    val ev = Tables.events(spark, dir)
    val lastDay = ev.agg(max(to_date(timestamp_micros(
      Tables.eventMicros(ev))))).head().getAs[java.sql.Date](0)
      .toLocalDate
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    assert(byType.nonEmpty)
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("h"))
      assert(sorted.map(_.getAs[Int]("h")).toSeq == (1 to 7), s"type $t")
      sorted.foreach { r =>
        assert(r.getAs[java.sql.Date]("target_day").toLocalDate ==
          lastDay.plusDays(r.getAs[Int]("h")), s"horizon misaligned: $r")
        assert(!r.getAs[Double]("pred").isNaN, r.toString)
      }
    }
  }

  test("cohort ltv: curves are cumulative-monotone, per-user value is " +
      "the cumulative over the cohort size, and cohorts partition buyers") {
    val rows = TimeSeriesOps.eventsCohortLtv(spark, dir).collect()
    assert(rows.nonEmpty)
    val buyers = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    val byCohort = rows.groupBy(_.getAs[String]("cohort_week"))
    assert(byCohort.values.map(_.head.getAs[Long]("cohort_users")).sum
      == buyers, "cohort sizes must partition the buyers")
    byCohort.foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("age_week"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Double]("cum_rev") >= a.getAs[Double]("cum_rev") - 1e-6,
            s"cumulative revenue fell in cohort $c")
        case _ =>
      }
      sorted.foreach { r =>
        val expect = r.getAs[Double]("cum_rev") / r.getAs[Long]("cohort_users")
        assert(math.abs(r.getAs[Double]("ltv_per_user") - expect) < 1e-3,
          s"ltv inconsistent with its own cells: $r")
      }
    }
  }

  test("burn rate: the page flag is exactly the two-window AND and " +
      "error counts stay within totals") {
    val rows = TimeSeriesOps.eventsBurnRateAlert(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("e") <= r.getAs[Long]("n"), r.toString)
      val (b1, b6) = (r.getAs[Double]("burn_1h"), r.getAs[Double]("burn_6h"))
      assert(b1 >= 0 && b6 >= 0, r.toString)
      assert(r.getAs[Boolean]("page") == (b1 > 2.0 && b6 > 1.5), r.toString)
    }
    val totalE = Tables.events(spark, dir)
      .filter(col("event_type") === "error").count()
    assert(rows.map(_.getAs[Long]("e")).sum == totalE,
      "hourly error counts must partition the error events")
  }

  test("conversion lag: buckets partition the converters, bounds respect " +
      "the band edges, and cumulative share closes at 1") {
    val rows = TimeSeriesOps.eventsConversionLag(spark, dir).collect()
      .sortBy(_.getAs[String]("bucket"))
    assert(rows.nonEmpty)
    val edges = Map("a_under_1h" -> (0L, 3600L),
      "b_under_1d" -> (3600L, 86400L),
      "c_under_7d" -> (86400L, 604800L),
      "d_over_7d" -> (604800L, Long.MaxValue))
    rows.foreach { r =>
      val (lo, hi) = edges(r.getAs[String]("bucket"))
      assert(r.getAs[Long]("min_lag_s") >= lo &&
        r.getAs[Long]("max_lag_s") < hi, s"band edges violated: $r")
      assert(r.getAs[Long]("min_lag_s") <= r.getAs[Long]("max_lag_s"))
    }
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-6,
      "cumulative share must close at 1")
    val caps = rows.map(_.getAs[Double]("cum_share"))
    assert(caps.zip(caps.tail).forall { case (a, b) => b >= a - 1e-9 })
  }

  test("merge_upsert: statuses partition the keys, deletions null the " +
      "value, and every event-horizon user appears exactly once") {
    val out = TimeSeriesOps.eventsMergeUpsert(spark, dir).collect()
    val users = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(out.length == users, s"${out.length} rows vs $users users")
    assert(out.map(_.getAs[Long]("user_id")).distinct.length == out.length)
    out.foreach { r =>
      val st = r.getAs[String]("status")
      assert(Set("retained", "updated", "inserted", "deleted", "noop")(st), r.toString)
      if (st == "deleted" || st == "noop")
        assert(r.isNullAt(r.fieldIndex("final_v")), s"tombstone kept a value: $r")
    }
  }
}
