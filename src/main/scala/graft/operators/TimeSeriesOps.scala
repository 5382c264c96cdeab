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

  /** Calendar gap-fill with linear interpolation — the resample operator
    * every metrics warehouse needs before windowed math is valid: a
    * sparse per-(user, type) daily series (≈35% of user-type-day cells
    * are observed in the fixture) is densified to the full calendar
    * between each series' first and last observation, and the holes are
    * filled by linear interpolation between the bracketing observed days.
    *
    * Plan shape: one shuffle on (user_id, event_type) builds the sparse
    * daily rollup; the calendar is GENERATED per group (sequence +
    * explode — map-side, never a cross join against a calendar table);
    * prev/next observed neighbors come from two frames of the SAME
    * window sort (last/first over a (day, x) struct, ignoreNulls — one
    * sort, no self-join). Every missing day is strictly between two
    * observed days by construction (the calendar is bounded by min/max
    * observed day per group), so the interpolation never sees a NULL
    * neighbor. At 100 TB the filled table is |users|·|types|·|days| —
    * linear in the key space, not the event count, and each group's
    * calendar explode is local to its reducer.
    *
    * Float discipline: the observed series is rounded BEFORE
    * interpolation; the interpolation expression `pv + (nv - pv) * (Δd /
    * Δn)` is the same literal tree in both engines (date differences are
    * exact integers), so the doubles match bit-for-bit before the final
    * round(4). That is necessary but NOT sufficient: the interpolated
    * values live on the rational grid (multiples of 1e-5 / Δn), which
    * LANDS EXACTLY ON the 4-decimal .00005 rounding boundary whenever Δn
    * divides the scaled gap — and there Spark's decimal-string HALF_UP
    * and DuckDB's binary-double rounding legitimately disagree (observed
    * in the fixture: 21.17375 → 21.1738 vs 21.1737). The ε = 5e-10
    * tie-break nudge (applied in BOTH engines) is one decade below the
    * grid's minimum off-boundary distance (≥ 5e-9 for Δn ≤ 1000) and
    * five decades above double noise, so it moves boundary values
    * deterministically up without ever flipping an off-boundary value.
    * The user_id % 29 == 3 slice bounds the driver-compared output
    * (~800 rows at sf0.01) while keeping the operator itself unbounded —
    * the filter pushes to the parquet scan.
    */
  def eventsGapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("user_id") % 29 === 3)
    val sparse = ev
      .withColumn("day", to_date(timestamp_micros(Tables.eventMicros(ev))))
      .groupBy(col("user_id"), col("event_type"), col("day"))
      .agg(round(sum(col("value")), 5).as("x"))
    val cal = sparse.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("user_id"), col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day")))
          .as("day"))
    val filled = cal.join(sparse, Seq("user_id", "event_type", "day"), "left")
    val ord = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("day"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = ord.rowsBetween(0, Window.unboundedFollowing)
    val known = when(col("x").isNotNull,
      struct(col("day").as("d"), col("x").as("v")))
    filled
      .withColumn("p", last(known, ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(known, ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("event_type"), col("day"),
        col("x").isNotNull.as("observed"),
        round(when(col("x").isNotNull, col("x"))
          .otherwise(col("p.v") + (col("nx.v") - col("p.v")) *
            (datediff(col("day"), col("p.d")).cast("double") /
              datediff(col("nx.d"), col("p.d")).cast("double")))
          + lit(5e-10), 4)
          .as("x_filled"))
      .orderBy(col("user_id"), col("event_type"), col("day"))
  }

  val eventsGapFillOracle: String =
    """WITH d AS (
      |  SELECT user_id, event_type, CAST(ts AS DATE) AS day,
      |         round(SUM(value), 5) AS x
      |  FROM events WHERE user_id % 29 = 3
      |  GROUP BY user_id, event_type, day),
      |b AS (
      |  SELECT user_id, event_type, min(day) AS mn, max(day) AS mx
      |  FROM d GROUP BY user_id, event_type),
      |cal AS (
      |  SELECT user_id, event_type,
      |         CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
      |                                     CAST(mx AS TIMESTAMP),
      |                                     INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM b),
      |f AS (
      |  SELECT c.user_id, c.event_type, c.day, d.x
      |  FROM cal c LEFT JOIN d USING (user_id, event_type, day)),
      |n AS (
      |  SELECT user_id, event_type, day, x,
      |    last_value(CASE WHEN x IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER wp AS pd,
      |    last_value(x IGNORE NULLS) OVER wp AS pv,
      |    first_value(CASE WHEN x IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER wn AS nd,
      |    first_value(x IGNORE NULLS) OVER wn AS nv
      |  FROM f WINDOW
      |    wp AS (PARTITION BY user_id, event_type ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wn AS (PARTITION BY user_id, event_type ORDER BY day
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, event_type, day, x IS NOT NULL AS observed,
      |       round((CASE WHEN x IS NOT NULL THEN x
      |              ELSE pv + (nv - pv) *
      |                   (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
      |              END) + 5e-10, 4) AS x_filled
      |FROM n ORDER BY user_id, event_type, day""".stripMargin

  /** Rolling exact median (trailing 7 days) of the per-type daily series
    * — the robust smoother that, unlike [[eventsEwma]], ignores a single
    * spike entirely. Exact, not a sketch: the ROWS frame is bounded (≤7
    * values), so collecting it into a sorted array is O(1) per row and
    * the plan stays one window sort over the calendar-bounded daily
    * table. The even-count branch averages the two middle elements with
    * the SAME `(lo + hi) / 2.0` tree in both engines — deliberately NOT
    * DuckDB's `median()`, whose quantile interpolation (`lo + (hi - lo)
    * * 0.5`) can differ from the average in the last ulp. The midpoint
    * lives on the 5e-6 grid, which can land exactly on the 4-decimal
    * rounding boundary where the engines' round() implementations
    * disagree — the ε = 5e-10 tie-break (both engines; see
    * [[eventsGapFill]]) moves boundary values deterministically up.
    */
  def eventsRollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    val arr = sort_array(collect_list(col("x")).over(w))
    daily(spark, dir)
      .withColumn("a", arr)
      .select(col("event_type"), col("day"), col("x"),
        round(when(size(col("a")) % 2 === 1,
            element_at(col("a"), ((size(col("a")) + 1) / 2).cast("int")))
          .otherwise((element_at(col("a"), (size(col("a")) / 2).cast("int")) +
            element_at(col("a"), (size(col("a")) / 2 + 1).cast("int")))
            / lit(2.0)) + lit(5e-10), 4)
          .as("med7"))
      .orderBy(col("event_type"), col("day"))
  }

  val eventsRollingMedianOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |l AS (
      |  SELECT event_type, day, x,
      |         list_sort(list(x) OVER (PARTITION BY event_type ORDER BY day
      |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS a
      |  FROM d)
      |SELECT event_type, day, x,
      |       round((CASE WHEN len(a) % 2 = 1 THEN a[(len(a) + 1) // 2]
      |              ELSE (a[len(a) // 2] + a[len(a) // 2 + 1]) / 2.0 END)
      |             + 5e-10, 4) AS med7
      |FROM l ORDER BY event_type, day""".stripMargin

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands pattern (day minus dense row_number is constant
    * within a run) every retention dashboard computes. One shuffle on
    * user_id serves the distinct, the window sort, and both rollups;
    * per-user state is the active-day list, bounded by the calendar.
    */
  def eventsStreaks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val active = ev
      .select(col("user_id"),
        to_date(timestamp_micros(Tables.eventMicros(ev))).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    active
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy(col("user_id"))
  }

  val eventsStreaksOracle: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |g AS (
      |  SELECT user_id,
      |         day - CAST(row_number() OVER
      |           (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
      |  FROM a),
      |runs AS (
      |  SELECT user_id, anchor, COUNT(*) AS len
      |  FROM g GROUP BY user_id, anchor)
      |SELECT user_id, MAX(len) AS longest_streak,
      |       COUNT(*) AS n_streaks,
      |       CAST(SUM(len) AS BIGINT) AS active_days
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  /** CUSUM changepoint localization — the level-shift detector that
    * complements [[eventsAnomalyResidual]] (which flags single days and
    * ABSORBS sustained shifts into the trend): the cumulative sum of
    * mean-centered daily values peaks in absolute value exactly where
    * the series' level changes, so `argmax |S_i|` localizes the break.
    * Output per type: the changepoint day, the peak CUSUM, and the
    * before/after means with their shift.
    *
    * Plan: the daily rollup is the only data-touching shuffle; the
    * CUSUM window, the argmax rank, and the before/after conditional
    * rollup all run over the calendar-bounded daily table, with the
    * 1-row-per-type changepoint broadcast back. The argmax ranks by the
    * ROUNDED |S| (sum-order noise in the centered cumsum is ~1e-11;
    * ranking raw doubles could flip near-ties across engines) with the
    * day as a deterministic tiebreak. S and the split means live on the
    * 1e-5/n rational grid (round-5 inputs, mean denominator n), which
    * can land exactly on the round-4 boundary — every rounded output
    * carries the ε = 5e-10 tie-break (see [[eventsGapFill]]; ε is ~50×
    * the cumsum noise and ~300× under the grid's off-boundary gap).
    */
  def eventsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val d = daily(spark, dir)
    val wType = Window.partitionBy(col("event_type"))
    val wCum = wType.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cusum = d
      .withColumn("mu", sum(col("x")).over(wType) / count(lit(1)).over(wType))
      .withColumn("s", sum(col("x") - col("mu")).over(wCum))
      .withColumn("s_abs", round(abs(col("s")) + lit(5e-10), 4))
    val cp = cusum
      .withColumn("rn", row_number().over(
        wType.orderBy(col("s_abs").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        round(col("s") + lit(5e-10), 4).as("s_peak"))
    d.join(broadcast(cp), Seq("event_type"))
      .groupBy(col("event_type"), col("cp_day"), col("s_peak"))
      .agg(
        round(sum(when(col("day") <= col("cp_day"), col("x")))
          / count(when(col("day") <= col("cp_day"), lit(1))) + lit(5e-10), 4)
          .as("mean_before"),
        round(sum(when(col("day") > col("cp_day"), col("x")))
          / count(when(col("day") > col("cp_day"), lit(1))) + lit(5e-10), 4)
          .as("mean_after"))
      .withColumn("shift", round(col("mean_after") - col("mean_before"), 4))
      .orderBy(col("event_type"))
  }

  val eventsChangepointOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |c AS (
      |  SELECT event_type, day, x,
      |         SUM(x - mu) OVER (PARTITION BY event_type ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM (SELECT *, SUM(x) OVER wt / COUNT(*) OVER wt AS mu
      |        FROM d WINDOW wt AS (PARTITION BY event_type))),
      |cp AS (
      |  SELECT event_type, day AS cp_day, round(s + 5e-10, 4) AS s_peak
      |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |          ORDER BY round(abs(s) + 5e-10, 4) DESC, day) AS rn FROM c)
      |  WHERE rn = 1)
      |SELECT d.event_type, cp_day, s_peak,
      |       round(SUM(CASE WHEN day <= cp_day THEN x END)
      |             / COUNT(CASE WHEN day <= cp_day THEN 1 END) + 5e-10, 4)
      |         AS mean_before,
      |       round(SUM(CASE WHEN day > cp_day THEN x END)
      |             / COUNT(CASE WHEN day > cp_day THEN 1 END) + 5e-10, 4)
      |         AS mean_after,
      |       round(round(SUM(CASE WHEN day > cp_day THEN x END)
      |                   / COUNT(CASE WHEN day > cp_day THEN 1 END) + 5e-10, 4)
      |             - round(SUM(CASE WHEN day <= cp_day THEN x END)
      |                     / COUNT(CASE WHEN day <= cp_day THEN 1 END) + 5e-10, 4), 4)
      |         AS shift
      |FROM d JOIN cp ON d.event_type = cp.event_type
      |GROUP BY d.event_type, cp_day, s_peak
      |ORDER BY d.event_type""".stripMargin

  /** Per-type OLS linear trend + one-week-ahead forecast — the simplest
    * member of the forecasting family, deliberately closed-form (unlike
    * a recursive Holt smoother, whose per-engine rounding accumulates):
    * slope/intercept/R² come from explicit co-moment sums over
    * (day-index, x) pairs, and the forecast extrapolates the fitted
    * line 7 days past the horizon. Day indices are exact integers
    * (row_number − 1), x is the round-5 daily series, and all five sums
    * come out of ONE aggregate over the calendar-bounded daily table —
    * two window-free shuffles total (the daily rollup, the 5-row type
    * rollup). Zero-variance series (constant x or single day) yield
    * NULL slope/R², not NaN.
    */
  def eventsTrendForecast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pts = daily(spark, dir)
      .withColumn("t", (row_number().over(w) - 1).cast("double"))
    val mo = pts.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("t")).as("st"), sum(col("x")).as("sx"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("x")).as("stx"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("dt", col("n") * col("stt") - col("st") * col("st"))
      .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("cov", col("n") * col("stx") - col("st") * col("sx"))
    mo.select(col("event_type"), col("n"),
      when(col("dt") <= 0, lit(null).cast("double"))
        .otherwise(round(col("cov") / col("dt"), 4)).as("slope"),
      when(col("dt") <= 0, lit(null).cast("double"))
        .otherwise(round((col("sx") - (col("cov") / col("dt")) * col("st"))
          / col("n"), 4)).as("intercept"),
      when(col("dt") <= 0 || col("dx") <= 0, lit(null).cast("double"))
        .otherwise(round(col("cov") * col("cov") / (col("dt") * col("dx")), 4))
        .as("r2"),
      when(col("dt") <= 0, lit(null).cast("double"))
        .otherwise(round((col("sx") - (col("cov") / col("dt")) * col("st"))
          / col("n")
          + (col("cov") / col("dt")) * (col("n") + lit(6)), 4))
        .as("forecast_7d"))
      .orderBy(col("event_type"))
  }

  val eventsTrendForecastOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |p AS (
      |  SELECT event_type, x,
      |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
      |              - 1 AS DOUBLE) AS t
      |  FROM d),
      |mo AS (
      |  SELECT event_type, COUNT(*) AS n,
      |         SUM(t) AS st, SUM(x) AS sx,
      |         SUM(t * t) AS stt, SUM(t * x) AS stx, SUM(x * x) AS sxx
      |  FROM p GROUP BY event_type),
      |k AS (
      |  SELECT *, n * stt - st * st AS dt,
      |         n * sxx - sx * sx AS dx,
      |         n * stx - st * sx AS cov
      |  FROM mo)
      |SELECT event_type, n,
      |       CASE WHEN dt <= 0 THEN NULL
      |            ELSE round(cov / dt, 4) END AS slope,
      |       CASE WHEN dt <= 0 THEN NULL
      |            ELSE round((sx - (cov / dt) * st) / n, 4) END AS intercept,
      |       CASE WHEN dt <= 0 OR dx <= 0 THEN NULL
      |            ELSE round(cov * cov / (dt * dx), 4) END AS r2,
      |       CASE WHEN dt <= 0 THEN NULL
      |            ELSE round((sx - (cov / dt) * st) / n
      |                       + (cov / dt) * (n + 6), 4) END AS forecast_7d
      |FROM k ORDER BY event_type""".stripMargin

  /** STL-lite seasonal decomposition: x = trend + seasonal + residual
    * per (type, day) — trend is the centered 7-day moving average,
    * seasonal is the day-of-week mean of the detrended series (the
    * additive weekly profile), residual is what's left. Each component
    * is ROUNDED before feeding the next (the repo float discipline at
    * its narrowest points), and the seasonal means carry the ε = 5e-10
    * tie-break — with ~4 samples per (type, weekday) cell the mean's
    * rational denominator is SMALL, exactly the regime where round-4
    * boundaries land (see [[eventsGapFill]]). Weekday indexing uses
    * Spark `weekday` (0 = Monday) = DuckDB `isodow − 1`. All three
    * stages are windows/rollups over the calendar-bounded daily table;
    * one data-touching shuffle.
    */
  def eventsStlDecompose(spark: SparkSession, dir: String): DataFrame = {
    val wTrend = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val detr = daily(spark, dir)
      .withColumn("trend", round(
        sum(col("x")).over(wTrend) / count(lit(1)).over(wTrend)
          + lit(5e-10), 4))
      .withColumn("detrend", round(col("x") - col("trend"), 4))
      .withColumn("dow", weekday(col("day")).cast("long"))
    val wDow = Window.partitionBy(col("event_type"), col("dow"))
    detr
      .withColumn("seasonal", round(
        sum(col("detrend")).over(wDow) / count(lit(1)).over(wDow)
          + lit(5e-10), 4))
      .select(col("event_type"), col("day"), col("dow"), col("x"),
        col("trend"), col("seasonal"),
        round(col("detrend") - col("seasonal"), 4).as("resid"))
      .orderBy(col("event_type"), col("day"))
  }

  val eventsStlDecomposeOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |t AS (
      |  SELECT event_type, day, x,
      |         round(SUM(x) OVER w / COUNT(x) OVER w + 5e-10, 4) AS trend
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
      |                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (
      |  SELECT *, round(x - trend, 4) AS detrend,
      |         CAST(isodow(day) - 1 AS BIGINT) AS dow
      |  FROM t),
      |s AS (
      |  SELECT *, round(SUM(detrend) OVER wd / COUNT(*) OVER wd + 5e-10, 4)
      |           AS seasonal
      |  FROM dt WINDOW wd AS (PARTITION BY event_type, dow))
      |SELECT event_type, day, dow, x, trend, seasonal,
      |       round(detrend - seasonal, 4) AS resid
      |FROM s ORDER BY event_type, day""".stripMargin

  /** Rolling-origin forecast backtest — the honesty check on
    * [[eventsTrendForecast]]: for every day with ≥ 14 days of history,
    * fit the OLS line on STRICTLY PRIOR days (cumulative co-moment sums
    * over a PRECEDING-only frame — no leakage by construction) and
    * score the one-step-ahead prediction; report per-type MAE and WAPE
    * (weighted absolute percentage error — Σ|err|/Σ|x|, robust to
    * near-zero days where MAPE explodes).
    *
    * The cumulative sums are WINDOW sums in day order, so both engines
    * accumulate in the same sequence — bit-identical doubles even for
    * the float series (unlike groupBy sums, whose partial-agg order is
    * engine-dependent); day indices are exact integers. One shuffle;
    * everything else is the calendar-bounded window pass. The final
    * per-type means carry the ε tie-break (small denominators).
    */
  def eventsForecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wPrior = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val pts = daily(spark, dir)
      .withColumn("t", (row_number().over(wOrd) - 1).cast("double"))
    val fit = pts
      .withColumn("n0", count(lit(1)).over(wPrior).cast("double"))
      .withColumn("st", sum(col("t")).over(wPrior))
      .withColumn("sx", sum(col("x")).over(wPrior))
      .withColumn("stt", sum(col("t") * col("t")).over(wPrior))
      .withColumn("stx", sum(col("t") * col("x")).over(wPrior))
      .filter(col("n0") >= 14)
      .withColumn("dt", col("n0") * col("stt") - col("st") * col("st"))
      .withColumn("slope",
        (col("n0") * col("stx") - col("st") * col("sx")) / col("dt"))
      .withColumn("pred",
        (col("sx") - col("slope") * col("st")) / col("n0")
          + col("slope") * col("t"))
      .withColumn("err", abs(col("x") - col("pred")))
    fit.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_evals"),
        round(sum(col("err")) / count(lit(1)) + lit(5e-10), 4).as("mae"),
        round(sum(col("err")) / sum(abs(col("x"))) * 100 + lit(5e-10), 4)
          .as("wape_pct"))
      .orderBy(col("event_type"))
  }

  val eventsForecastBacktestOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |p AS (
      |  SELECT event_type, day, x,
      |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
      |              - 1 AS DOUBLE) AS t
      |  FROM d),
      |c AS (
      |  SELECT event_type, day, x, t,
      |         CAST(COUNT(*) OVER w AS DOUBLE) AS n0,
      |         SUM(t) OVER w AS st, SUM(x) OVER w AS sx,
      |         SUM(t * t) OVER w AS stt, SUM(t * x) OVER w AS stx
      |  FROM p WINDOW w AS (PARTITION BY event_type ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |f AS (
      |  SELECT *, n0 * stt - st * st AS dt FROM c WHERE n0 >= 14),
      |s AS (
      |  SELECT *, (n0 * stx - st * sx) / dt AS slope FROM f),
      |e AS (
      |  SELECT event_type,
      |         abs(x - ((sx - slope * st) / n0 + slope * t)) AS err,
      |         abs(x) AS ax
      |  FROM s)
      |SELECT event_type, COUNT(*) AS n_evals,
      |       round(SUM(err) / COUNT(*) + 5e-10, 4) AS mae,
      |       round(SUM(err) / SUM(ax) * 100 + 5e-10, 4) AS wape_pct
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Rolling 7-day DISTINCT active users per type — the sliding
    * distinct-count that a plain window CANNOT partial-aggregate
    * (distinct isn't mergeable across frames), solved with the
    * explode-to-buckets pattern: each distinct (type, user, day)
    * presence emits the ≤ 7 output days whose trailing window covers
    * it (map-side, constant fan-out), and one exact distinct-count
    * rollup per (type, output-day) finishes the job. Cost is 7× the
    * presence table — linear at any scale, no per-day self-joins, no
    * quadratic window recompute; the approximate twin at extreme
    * cardinality is the staged-HLL rollup (`q_sketch_rollup`).
    */
  def eventsRollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val presence = ev
      .select(col("event_type"),
        col("user_id"),
        to_date(timestamp_micros(Tables.eventMicros(ev))).as("day"))
      .distinct()
    val bounds = broadcast(presence.agg(max(col("day")).as("mx")))
    presence
      .select(col("event_type"), col("user_id"),
        explode(sequence(col("day"),
          date_add(col("day"), 6), expr("interval 1 day"))).as("out_day"))
      .crossJoin(bounds)
      .filter(col("out_day") <= col("mx"))
      .groupBy(col("event_type"), col("out_day").as("day"))
      .agg(countDistinct(col("user_id")).as("u7"))
      .orderBy(col("event_type"), col("day"))
  }

  val eventsRollingDistinctOracle: String =
    """WITH p AS (
      |  SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS day
      |  FROM events),
      |mx AS (SELECT MAX(day) AS mx FROM p),
      |b AS (
      |  SELECT event_type, user_id,
      |         CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
      |             CAST(day + 6 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
      |           AS day
      |  FROM p)
      |SELECT event_type, day, COUNT(DISTINCT user_id) AS u7
      |FROM b CROSS JOIN mx WHERE day <= mx
      |GROUP BY event_type, day
      |ORDER BY event_type, day""".stripMargin

  /** Window-navigation completeness sweep — the remaining analytic
    * window functions differentially pinned in one query: first/last/
    * nth_value over the full frame, cume_dist and percent_rank over the
    * value ordering (tie-stable BY DEFINITION: both count order-peers,
    * so equal x gives equal output regardless of within-tie order), and
    * lead with an explicit default at the partition edge. One window
    * sort over the calendar-bounded daily table.
    */
  def qWindowNavigation(spark: SparkSession, dir: String): DataFrame = {
    val wDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wFull = wDay.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wVal = Window.partitionBy(col("event_type")).orderBy(col("x"))
    daily(spark, dir)
      .select(col("event_type"), col("day"), col("x"),
        first(col("x")).over(wFull).as("first_x"),
        last(col("x")).over(wFull).as("last_x"),
        nth_value(col("x"), 3).over(wFull).as("third_x"),
        round(cume_dist().over(wVal) + lit(5e-10), 4).as("cd"),
        round(percent_rank().over(wVal) + lit(5e-10), 4).as("pr"),
        lead(col("x"), 1, -1.0).over(wDay).as("next_x"))
      .orderBy(col("event_type"), col("day"))
  }

  val qWindowNavigationOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day)
      |SELECT event_type, day, x,
      |       first_value(x) OVER wf AS first_x,
      |       last_value(x) OVER wf AS last_x,
      |       nth_value(x, 3) OVER wf AS third_x,
      |       round(cume_dist() OVER wv + 5e-10, 4) AS cd,
      |       round(percent_rank() OVER wv + 5e-10, 4) AS pr,
      |       lead(x, 1, -1.0) OVER wd AS next_x
      |FROM d WINDOW
      |  wf AS (PARTITION BY event_type ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |  wv AS (PARTITION BY event_type ORDER BY x),
      |  wd AS (PARTITION BY event_type ORDER BY day)
      |ORDER BY event_type, day""".stripMargin

  /** Composed 7-day-ahead seasonal forecast — the production shape that
    * neither piece gives alone: the OLS line ([[eventsTrendForecast]])
    * extrapolates the level, the day-of-week profile
    * ([[eventsStlDecompose]]'s seasonal) modulates each target day.
    * `pred(h) = intercept + slope·(n−1+h) + seasonal(dow(last_day+h))`
    * for h = 1..7. Both component fits reuse their operators' exact
    * algebra (moments from one rollup, seasonal means over the rounded
    * detrended series), the horizon fan-out is a 7-element explode per
    * type, and the seasonal lookup is a broadcast join on (type, dow).
    */
  def eventsSeasonalForecast(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pts = daily(spark, dir)
      .withColumn("t", (row_number().over(wOrd) - 1).cast("double"))
    val fit = pts.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("day")).as("last_day"),
        sum(col("t")).as("st"), sum(col("x")).as("sx"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("x")).as("stx"))
      .withColumn("dt", col("n") * col("stt") - col("st") * col("st"))
      .withColumn("slope",
        (col("n") * col("stx") - col("st") * col("sx")) / col("dt"))
      .withColumn("icept",
        (col("sx") - col("slope") * col("st")) / col("n"))
    val wTrend = wOrd.rowsBetween(-3, 3)
    val seasonal = daily(spark, dir)
      .withColumn("trend", round(
        sum(col("x")).over(wTrend) / count(lit(1)).over(wTrend)
          + lit(5e-10), 4))
      .withColumn("detrend", round(col("x") - col("trend"), 4))
      .withColumn("dow", weekday(col("day")).cast("long"))
      .groupBy(col("event_type"), col("dow"))
      .agg((sum(col("detrend")) / count(lit(1))).as("s"))
    val horizon = fit
      .select(col("event_type"), col("n"), col("last_day"),
        col("slope"), col("icept"),
        explode(sequence(lit(1), lit(7))).as("h"))
      .withColumn("target_day", expr("date_add(last_day, h)"))
      .withColumn("dow", weekday(col("target_day")).cast("long"))
    horizon.join(broadcast(seasonal), Seq("event_type", "dow"))
      .select(col("event_type"), col("h"), col("target_day"),
        round(col("icept")
          + col("slope") * (col("n") - lit(1) + col("h"))
          + col("s") + lit(5e-10), 4).as("pred"))
      .orderBy(col("event_type"), col("h"))
  }

  val eventsSeasonalForecastOracle: String =
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(SUM(value), 5) AS x
      |  FROM events GROUP BY event_type, day),
      |p AS (
      |  SELECT event_type, day, x,
      |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
      |              - 1 AS DOUBLE) AS t
      |  FROM d),
      |fit AS (
      |  SELECT event_type, COUNT(*) AS n, MAX(day) AS last_day,
      |         SUM(t) AS st, SUM(x) AS sx,
      |         SUM(t * t) AS stt, SUM(t * x) AS stx
      |  FROM p GROUP BY event_type),
      |k AS (
      |  SELECT *, (n * stx - st * sx) / (n * stt - st * st) AS slope
      |  FROM fit),
      |ic AS (
      |  SELECT *, (sx - slope * st) / n AS icept FROM k),
      |tr AS (
      |  SELECT event_type, day, x,
      |         round(SUM(x) OVER w / COUNT(x) OVER w + 5e-10, 4) AS trend
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
      |                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |sea AS (
      |  SELECT event_type, CAST(isodow(day) - 1 AS BIGINT) AS dow,
      |         SUM(round(x - trend, 4)) / COUNT(*) AS s
      |  FROM tr GROUP BY event_type, CAST(isodow(day) - 1 AS BIGINT)),
      |hz AS (
      |  SELECT ic.event_type, h,
      |         last_day + CAST(h AS INTEGER) AS target_day,
      |         icept, slope, n
      |  FROM ic CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS h))
      |SELECT hz.event_type, h, target_day,
      |       round(icept + slope * (n - 1 + h) + s + 5e-10, 4) AS pred
      |FROM hz JOIN sea ON sea.event_type = hz.event_type
      |        AND sea.dow = CAST(isodow(target_day) - 1 AS BIGINT)
      |ORDER BY hz.event_type, h""".stripMargin

  /** Weekly cohort LTV curve — the revenue companion to the count-based
    * cohort retention: users grouped by FIRST-PURCHASE week, purchase
    * revenue accumulated by cohort age in weeks, reported as cumulative
    * revenue per cohort member. Whether a cohort's curve keeps rising
    * (compounding value) or flattens (one-and-done) is the growth
    * readout counts cannot give. Two key-space rollups (user first-week,
    * then cohort-week × age) plus one cumulative window over the
    * weeks×weeks-bounded curve table; cohort sizes broadcast back. The
    * cumulative sum is a WINDOW accumulation (engine-identical order);
    * per-member division carries the ε tie-break.
    */
  def eventsCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val days = ev.select(col("user_id"), col("event_type"), col("value"),
      to_date(timestamp_micros(Tables.eventMicros(ev))).as("d"))
    // cohort by FIRST-PURCHASE week (acquisition = first conversion):
    // first-activity weeks all collapse to week one in a dense fixture,
    // while conversion weeks genuinely spread the cohorts
    val firstWeek = days.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("d"))).cast("date").as("cohort_week"))
    val sizes = firstWeek.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    val rev = days.filter(col("event_type") === "purchase")
      .join(firstWeek, "user_id")
      .groupBy(col("cohort_week"),
        floor(datediff(col("d"), col("cohort_week")) / 7).cast("long")
          .as("age_week"))
      .agg(round(sum(col("value")), 5).as("week_rev"))
    val wCum = Window.partitionBy(col("cohort_week")).orderBy(col("age_week"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rev
      .withColumn("cum_rev", sum(col("week_rev")).over(wCum))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week").cast("string").as("cohort_week"),
        col("age_week"), col("cohort_users"),
        round(col("week_rev") + lit(5e-10), 2).as("week_rev"),
        round(col("cum_rev") + lit(5e-10), 2).as("cum_rev"),
        round(col("cum_rev") / col("cohort_users") + lit(5e-10), 4)
          .as("ltv_per_user"))
      .orderBy(col("cohort_week"), col("age_week"))
  }

  val eventsCohortLtvOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, value,
      |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      |  FROM events),
      |fw AS (
      |  SELECT user_id,
      |         CAST(date_trunc('week', MIN(d)) AS DATE) AS cohort_week
      |  FROM e WHERE event_type = 'purchase' GROUP BY user_id),
      |sz AS (
      |  SELECT cohort_week, COUNT(*) AS cohort_users
      |  FROM fw GROUP BY cohort_week),
      |rev AS (
      |  SELECT cohort_week,
      |         CAST(floor((d - cohort_week) / 7) AS BIGINT) AS age_week,
      |         round(SUM(value), 5) AS week_rev
      |  FROM e JOIN fw USING (user_id)
      |  WHERE event_type = 'purchase'
      |  GROUP BY cohort_week, age_week),
      |c AS (
      |  SELECT *, SUM(week_rev) OVER (PARTITION BY cohort_week
      |           ORDER BY age_week ROWS BETWEEN UNBOUNDED PRECEDING
      |           AND CURRENT ROW) AS cum_rev
      |  FROM rev)
      |SELECT CAST(c.cohort_week AS STRING) AS cohort_week, age_week,
      |       cohort_users,
      |       round(week_rev + 5e-10, 2) AS week_rev,
      |       round(cum_rev + 5e-10, 2) AS cum_rev,
      |       round(cum_rev / cohort_users + 5e-10, 4) AS ltv_per_user
      |FROM c JOIN sz ON sz.cohort_week = c.cohort_week
      |ORDER BY cohort_week, age_week""".stripMargin

  /** Error-budget burn-rate alerting (the SRE-workbook multi-window
    * rule): with a 20% error budget, page when the SHORT window burns
    * fast (1-hour burn rate > 2×) AND the LONG window confirms it isn't
    * a blip (trailing-6-hour burn > 1.5×) — the two-window AND is what
    * kills both flappy pages and slow-burn blindness. Hourly integer
    * (errors, total) pairs come from one rollup; the trailing window is
    * an integer ROWS frame (exact in both engines); burn rates are
    * integer ratios rounded with the ε tie-break BEFORE the alert
    * compares. Calendar-bounded everything after the rollup.
    */
  def eventsBurnRateAlert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val hourly = ev
      .withColumn("hr", date_trunc("hour",
        timestamp_micros(Tables.eventMicros(ev))))
      .groupBy(col("hr"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))
    val w6 = Window.orderBy(col("hr")).rowsBetween(-5, 0)
    hourly
      .withColumn("n6", sum(col("n")).over(w6))
      .withColumn("e6", sum(col("e")).over(w6))
      .withColumn("burn_1h", round(lit(5.0) * col("e") / col("n")
        + lit(5e-10), 4))
      .withColumn("burn_6h", round(lit(5.0) * col("e6") / col("n6")
        + lit(5e-10), 4))
      .select(date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n"), col("e"), col("burn_1h"), col("burn_6h"),
        (col("burn_1h") > 2.0 && col("burn_6h") > 1.5).as("page"))
      .orderBy(col("hour"))
  }

  val eventsBurnRateAlertOracle: String =
    """WITH h AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
      |         COUNT(*) AS n,
      |         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS e
      |  FROM events GROUP BY hr),
      |wdw AS (
      |  SELECT hr, n, e,
      |         CAST(SUM(n) OVER w AS BIGINT) AS n6,
      |         CAST(SUM(e) OVER w AS BIGINT) AS e6
      |  FROM h WINDOW w AS (ORDER BY hr
      |    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
      |b AS (
      |  SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour, n, e,
      |         round(CAST(5 AS DOUBLE) * e / n + 5e-10, 4) AS burn_1h,
      |         round(CAST(5 AS DOUBLE) * e6 / n6 + 5e-10, 4) AS burn_6h
      |  FROM wdw)
      |SELECT hour, n, e, burn_1h, burn_6h,
      |       burn_1h > 2.0 AND burn_6h > 1.5 AS page
      |FROM b ORDER BY hour""".stripMargin

  /** Conversion-lag distribution — the "how fast do signups become
    * buyers" read-out the funnel COUNT queries cannot give: per user,
    * the first purchase AT OR AFTER the first signup, the lag bucketed
    * into the product-ops bands (hour / day / week / longer), with each
    * band's share and cumulative share of converters. Lags are exact
    * integer micros differenced then floored to seconds (one
    * representative integer per user — no float anywhere until the
    * final shares); two user-keyed aggregates and a join share ONE
    * user_id exchange.
    */
  def eventsConversionLag(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val us = ev.withColumn("us", Tables.eventMicros(ev))
    val signup = us.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
    val firstBuy = us.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("us") >= col("t0"))
      .groupBy(col("user_id"), col("t0")).agg(min(col("us")).as("t1"))
    val lagged = firstBuy
      .withColumn("lag_s", expr("(t1 - t0) div 1000000"))
      .withColumn("bucket",
        when(col("lag_s") < 3600, "a_under_1h")
          .when(col("lag_s") < 86400, "b_under_1d")
          .when(col("lag_s") < 604800, "c_under_7d")
          .otherwise(lit("d_over_7d")))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lagged.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"),
        min(col("lag_s")).as("min_lag_s"),
        max(col("lag_s")).as("max_lag_s"))
      .withColumn("share", round(col("n_users").cast("double")
        / sum(col("n_users")).over(wAll) + lit(5e-10), 4))
      .withColumn("cum_share", round(sum(col("n_users")).over(wCum)
        .cast("double") / sum(col("n_users")).over(wAll) + lit(5e-10), 4))
      .orderBy(col("bucket"))
  }

  val eventsConversionLagOracle: String =
    """WITH u AS (
      |  SELECT user_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |s AS (
      |  SELECT user_id, MIN(us) AS t0 FROM u
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (
      |  SELECT u.user_id, t0, MIN(us) AS t1
      |  FROM u JOIN s USING (user_id)
      |  WHERE event_type = 'purchase' AND us >= t0
      |  GROUP BY u.user_id, t0),
      |l AS (
      |  SELECT user_id, (t1 - t0) // 1000000 AS lag_s FROM p),
      |b AS (
      |  SELECT CASE WHEN lag_s < 3600 THEN 'a_under_1h'
      |              WHEN lag_s < 86400 THEN 'b_under_1d'
      |              WHEN lag_s < 604800 THEN 'c_under_7d'
      |              ELSE 'd_over_7d' END AS bucket,
      |         lag_s
      |  FROM l),
      |g AS (
      |  SELECT bucket, COUNT(*) AS n_users,
      |         CAST(MIN(lag_s) AS BIGINT) AS min_lag_s,
      |         CAST(MAX(lag_s) AS BIGINT) AS max_lag_s
      |  FROM b GROUP BY bucket)
      |SELECT bucket, n_users, min_lag_s, max_lag_s,
      |       round(CAST(n_users AS DOUBLE) / SUM(n_users) OVER ()
      |             + 5e-10, 4) AS share,
      |       round(CAST(SUM(n_users) OVER (ORDER BY bucket
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |             AS DOUBLE) / SUM(n_users) OVER () + 5e-10, 4)
      |         AS cum_share
      |FROM g ORDER BY bucket""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_conversion_lag" -> (eventsConversionLag _),
    "events_burn_rate_alert" -> (eventsBurnRateAlert _),
    "events_cohort_ltv" -> (eventsCohortLtv _),
    "events_seasonal_forecast" -> (eventsSeasonalForecast _),
    "q_window_navigation" -> (qWindowNavigation _),
    "events_rolling_distinct" -> (eventsRollingDistinct _),
    "events_forecast_backtest" -> (eventsForecastBacktest _),
    "events_stl_decompose" -> (eventsStlDecompose _),
    "events_trend_forecast" -> (eventsTrendForecast _),
    "events_changepoint" -> (eventsChangepoint _),
    "events_gap_fill" -> (eventsGapFill _),
    "events_rolling_median" -> (eventsRollingMedian _),
    "events_streaks" -> (eventsStreaks _),
    "events_anomaly_residual" -> (eventsAnomalyResidual _),
    "events_ewma" -> (eventsEwma _),
    "events_autocorr" -> (eventsAutocorr _),
    "events_merge_upsert" -> (eventsMergeUpsert _))

  def oracles: Map[String, String] = Map(
    "events_conversion_lag" -> eventsConversionLagOracle,
    "events_burn_rate_alert" -> eventsBurnRateAlertOracle,
    "events_cohort_ltv" -> eventsCohortLtvOracle,
    "events_seasonal_forecast" -> eventsSeasonalForecastOracle,
    "q_window_navigation" -> qWindowNavigationOracle,
    "events_rolling_distinct" -> eventsRollingDistinctOracle,
    "events_forecast_backtest" -> eventsForecastBacktestOracle,
    "events_stl_decompose" -> eventsStlDecomposeOracle,
    "events_trend_forecast" -> eventsTrendForecastOracle,
    "events_changepoint" -> eventsChangepointOracle,
    "events_gap_fill" -> eventsGapFillOracle,
    "events_rolling_median" -> eventsRollingMedianOracle,
    "events_streaks" -> eventsStreaksOracle,
    "events_anomaly_residual" -> eventsAnomalyResidualOracle,
    "events_ewma" -> eventsEwmaOracle,
    "events_autocorr" -> eventsAutocorrOracle,
    "events_merge_upsert" -> eventsMergeUpsertOracle)
}
