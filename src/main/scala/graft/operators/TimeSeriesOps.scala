package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series analytics over the `events` table — the smoothing /
  * autocorrelation / changelog-merge primitives a metrics pipeline layers
  * on top of the sessionization and outlier operators in [[EventOps]].
  *
  * Shared plan skeleton: ONE shuffle on (event_type, day) produces the
  * daily series (map-side partial aggregation does the heavy lifting —
  * the post-agg table is |types|·|days| rows), and everything downstream
  * runs windows over that key-space-sized frame. At 100 TB the daily
  * rollup is the only stage that touches raw data; its width is bounded
  * by the calendar, not the event count, so the window stages are
  * constant-size regardless of scale.
  *
  * Cross-engine float discipline (the [[EventOps.eventsSeriesCorr]]
  * rules): round the aggregated series BEFORE it feeds lag arithmetic,
  * keep weights exactly representable in binary (powers of 1/2), prefer
  * explicit co-moment algebra over opaque corr() variants, and guard
  * zero-variance windows to NULL, not NaN.
  */
object TimeSeriesOps {

  private def daily(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.withColumn("day", to_date(timestamp_micros(Tables.eventMicros(ev))))
      .groupBy(col("event_type"), col("day"))
      .agg(round(sum(col("value")), 5).as("x"))
  }

  /** Truncated-horizon EWMA (α = 1/2, 5 taps) of the per-type daily
    * value total. The weights 1, 1/2, 1/4, 1/8, 1/16 are exact binary
    * fractions, the tap count is fixed, and the term order is the same
    * literal expression tree in both engines, so the double arithmetic
    * is bit-reproducible — the reason this is a lag-chain and not a
    * recursive scan (an infinite-horizon EWMA needs pow(α, n) rescaling
    * whose rounding differs per engine). A 5-tap lag chain is also the
    * 100 TB shape: it reads the key-space-sized daily table once within
    * a single window sort, no self-join, no driver iteration.
    */
  def eventsEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    def tap(k: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
      val l = lag(col("x"), k).over(w)
      val wt = lit(math.pow(0.5, k))
      (when(l.isNull, lit(0.0)).otherwise(l * wt),
        when(l.isNull, lit(0.0)).otherwise(wt))
    }
    val taps = (1 to 4).map(tap)
    daily(spark, dir)
      .select(col("event_type"), col("day"), col("x"),
        round((col("x") + taps.map(_._1).reduce(_ + _)) /
          (lit(1.0) + taps.map(_._2).reduce(_ + _)), 4).as("ewma"))
      .orderBy(col("event_type"), col("day"))
  }

  val eventsEwmaOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |l AS (
      |  SELECT event_type, day, x,
      |         lag(x, 1) OVER w AS l1, lag(x, 2) OVER w AS l2,
      |         lag(x, 3) OVER w AS l3, lag(x, 4) OVER w AS l4
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
      |SELECT event_type, day, x,
      |       round((x + CASE WHEN l1 IS NULL THEN 0.0 ELSE l1 * 0.5 END
      |                + CASE WHEN l2 IS NULL THEN 0.0 ELSE l2 * 0.25 END
      |                + CASE WHEN l3 IS NULL THEN 0.0 ELSE l3 * 0.125 END
      |                + CASE WHEN l4 IS NULL THEN 0.0 ELSE l4 * 0.0625 END)
      |           / (1.0 + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.5 END
      |                  + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.25 END
      |                  + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.125 END
      |                  + CASE WHEN l4 IS NULL THEN 0.0 ELSE 0.0625 END), 4)
      |         AS ewma
      |FROM l ORDER BY event_type, day""".stripMargin

  /** Lag-k autocorrelation (k = 1, 7) of the per-type daily series —
    * the seasonality probe (a strong lag-7 says weekly cycle). Pearson
    * over (x_t, x_{t-k}) pairs from explicit co-moment sums, same
    * algebra both engines; both lags come out of ONE window pass over
    * the key-space-sized daily table, then a 2-row-per-type aggregate.
    */
  def eventsAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = daily(spark, dir)
      .select(col("event_type"), col("x"),
        lag(col("x"), 1).over(w).as("y1"), lag(col("x"), 7).over(w).as("y7"))
    def pearson(df: DataFrame, y: String, k: Int): DataFrame =
      df.filter(col(y).isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col(y)).as("sy"),
          sum(col("x") * col(y)).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col(y) * col(y)).as("syy"))
        .withColumn("varx", col("n_pairs") * col("sxx") - col("sx") * col("sx"))
        .withColumn("vary", col("n_pairs") * col("syy") - col("sy") * col("sy"))
        .select(col("event_type"), lit(k.toLong).as("lag_days"), col("n_pairs"),
          when(col("varx") <= 0 || col("vary") <= 0, lit(null).cast("double"))
            .otherwise(round((col("n_pairs") * col("sxy") - col("sx") * col("sy"))
              / sqrt(col("varx") * col("vary")), 4))
            .as("acf"))
    pearson(lagged, "y1", 1).unionByName(pearson(lagged, "y7", 7))
      .orderBy(col("event_type"), col("lag_days"))
  }

  val eventsAutocorrOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |l AS (
      |  SELECT event_type, x, lag(x, 1) OVER w AS y1, lag(x, 7) OVER w AS y7
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |p AS (
      |  SELECT event_type, CAST(1 AS BIGINT) AS lag_days, x, y1 AS y FROM l
      |  WHERE y1 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, CAST(7 AS BIGINT) AS lag_days, x, y7 AS y FROM l
      |  WHERE y7 IS NOT NULL),
      |m AS (
      |  SELECT event_type, lag_days, COUNT(*) AS n_pairs,
      |         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
      |         SUM(x*x) AS sxx, SUM(y*y) AS syy
      |  FROM p GROUP BY event_type, lag_days),
      |v AS (
      |  SELECT *, n_pairs * sxx - sx * sx AS varx,
      |         n_pairs * syy - sy * sy AS vary
      |  FROM m)
      |SELECT event_type, lag_days, n_pairs,
      |       CASE WHEN varx <= 0 OR vary <= 0 THEN NULL
      |            ELSE round((n_pairs * sxy - sx * sy) / sqrt(varx * vary), 4)
      |       END AS acf
      |FROM v ORDER BY event_type, lag_days""".stripMargin

  /** Changelog MERGE (the batch MERGE INTO / CDC-apply shape): the first
    * half of the event horizon materializes a keyed snapshot (last value
    * per user), the second half is the changelog; each user's FINAL
    * change wins (an 'error' tombstones the key, anything else upserts),
    * and the full-outer reconciliation classifies every key as
    * inserted / updated / deleted / retained. Plan: both sides collapse
    * to ≤|users| rows via windowed last-writer-wins BEFORE the join, so
    * the merge joins key-space-sized inputs — the shape that survives a
    * 100 TB changelog (at which scale the snapshot side is the bucketed
    * base table and the join co-locates on the bucket key). The split
    * point is data-derived (midpoint of the epoch range) so fixture
    * regeneration moves the split instead of breaking it.
    */
  def eventsMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ev0 = Tables.events(spark, dir)
    val ev = ev0.select(col("event_id"), col("user_id"), col("event_type"),
      round(col("value"), 2).as("v"), Tables.eventMicros(ev0).as("us"))
    val mid = ev.agg(((min(col("us")) + max(col("us"))) / lit(2L))
      .cast("long").as("m"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc)
    val base = ev.crossJoin(broadcast(mid)).filter(col("us") < col("m"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("v").as("base_v"))
    val change = ev.crossJoin(broadcast(mid)).filter(col("us") >= col("m"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("v").as("chg_v"),
        (col("event_type") === "error").as("is_del"))
    base.join(change, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("is_del").isNull,
          when(col("base_v").isNull, lit(null).cast("string"))
            .otherwise(lit("retained")))
          .when(col("is_del"), when(col("base_v").isNull, lit("noop"))
            .otherwise(lit("deleted")))
          .when(col("base_v").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("status"),
        when(col("is_del") === true, lit(null).cast("double"))
          .otherwise(coalesce(col("chg_v"), col("base_v"))).as("final_v"))
      .orderBy(col("user_id"))
  }

  val eventsMergeUpsertOracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, round(value, 2) AS v,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |mid AS (SELECT CAST((MIN(us) + MAX(us)) / 2 AS BIGINT) AS m FROM e),
      |base AS (
      |  SELECT user_id, v AS base_v FROM (
      |    SELECT user_id, v, row_number() OVER
      |      (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |    FROM e, mid WHERE us < m) WHERE rn = 1),
      |change AS (
      |  SELECT user_id, v AS chg_v, is_del FROM (
      |    SELECT user_id, v, event_type = 'error' AS is_del, row_number() OVER
      |      (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |    FROM e, mid WHERE us >= m) WHERE rn = 1)
      |SELECT COALESCE(base.user_id, change.user_id) AS user_id,
      |       CASE WHEN is_del IS NULL THEN
      |              CASE WHEN base_v IS NULL THEN NULL ELSE 'retained' END
      |            WHEN is_del THEN
      |              CASE WHEN base_v IS NULL THEN 'noop' ELSE 'deleted' END
      |            WHEN base_v IS NULL THEN 'inserted'
      |            ELSE 'updated' END AS status,
      |       CASE WHEN is_del THEN NULL
      |            ELSE COALESCE(chg_v, base_v) END AS final_v
      |FROM base FULL OUTER JOIN change ON base.user_id = change.user_id
      |ORDER BY user_id""".stripMargin

  /** Detrended-residual anomaly detection on the per-type daily series —
    * the time-series complement of [[EventOps.eventsOutliers]]'s global
    * median/MAD cut: a centered 7-day moving average estimates the local
    * trend, the residual's per-type z-score flags days that break from
    * their OWN neighborhood (a level shift the global cut would absorb).
    * Both the trend (explicit SUM/COUNT over the ROWS frame) and the
    * z-score (explicit co-moment algebra, sample variance, NULL-guarded)
    * avoid opaque AVG/STDDEV so the arithmetic is identical in both
    * engines; residuals are rounded before feeding the moments, and the
    * flag thresholds the ROUNDED z so the boolean cannot sit on a
    * cross-engine ulp. All window stages run over the calendar-bounded
    * daily table — the one data-touching shuffle is the daily rollup.
    */
  def eventsAnomalyResidual(spark: SparkSession, dir: String): DataFrame = {
    val wTrend = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val wType = Window.partitionBy(col("event_type"))
    val resid = daily(spark, dir)
      .withColumn("trend",
        sum(col("x")).over(wTrend) / count(col("x")).over(wTrend))
      .withColumn("resid", round(col("x") - col("trend"), 4))
    val scored = resid
      .withColumn("n", count(lit(1)).over(wType))
      .withColumn("s1", sum(col("resid")).over(wType))
      .withColumn("s2", sum(col("resid") * col("resid")).over(wType))
      .withColumn("varr",
        (col("n") * col("s2") - col("s1") * col("s1")) /
          (col("n") * (col("n") - 1)))
      .withColumn("z",
        when(col("varr") <= 0, lit(null).cast("double"))
          .otherwise(round((col("resid") - col("s1") / col("n"))
            / sqrt(col("varr")), 4)))
    scored.select(col("event_type"), col("day"), col("x"),
      col("resid"), col("z"),
      coalesce(abs(col("z")) > 2.0, lit(false)).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  val eventsAnomalyResidualOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |t AS (
      |  SELECT event_type, day, x,
      |         round(x - SUM(x) OVER w / COUNT(x) OVER w, 4) AS resid
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
      |                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |m AS (
      |  SELECT *, COUNT(*) OVER wt AS n,
      |         SUM(resid) OVER wt AS s1,
      |         SUM(resid * resid) OVER wt AS s2
      |  FROM t WINDOW wt AS (PARTITION BY event_type)),
      |v AS (
      |  SELECT *, (n * s2 - s1 * s1) / (n * (n - 1)) AS varr FROM m),
      |z AS (
      |  SELECT event_type, day, x, resid,
      |         CASE WHEN varr <= 0 THEN NULL
      |              ELSE round((resid - s1 / n) / sqrt(varr), 4) END AS z
      |  FROM v)
      |SELECT event_type, day, x, resid, z,
      |       COALESCE(abs(z) > 2.0, FALSE) AS is_anomaly
      |FROM z ORDER BY event_type, day""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_anomaly_residual" -> (eventsAnomalyResidual _),
    "events_ewma" -> (eventsEwma _),
    "events_autocorr" -> (eventsAutocorr _),
    "events_merge_upsert" -> (eventsMergeUpsert _))

  def oracles: Map[String, String] = Map(
    "events_anomaly_residual" -> eventsAnomalyResidualOracle,
    "events_ewma" -> eventsEwmaOracle,
    "events_autocorr" -> eventsAutocorrOracle,
    "events_merge_upsert" -> eventsMergeUpsertOracle)
}
