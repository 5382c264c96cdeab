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
