package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (nearest-prior-event) join — an operator Spark lacks natively.
  *
  * Per the extension preference order (SURVEY.md §4 / builder mandate),
  * option (a) — composition of built-ins — fully expresses the semantics,
  * so no custom LogicalPlan/Strategy is needed: tag both inputs, union
  * them, and carry the latest right-side payload forward with
  * `last(_, ignoreNulls)` over a (key, time)-sorted running window.
  *
  * Scale shape: ONE shuffle on the key (the union is map-side; the window
  * sort is per key partition). A join-based formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + max) would shuffle both sides
  * AND explode to |matches-per-row| intermediates; a native merge-join
  * strategy would save the union's sort of the left side but nothing
  * else — the composition is within a constant factor of optimal and
  * inherits AQE/codegen for free.
  *
  * Right-side rows sort before left-side rows at equal timestamps, so the
  * match is inclusive (`r.ts <= l.ts`) — the same contract as DuckDB's
  * `ASOF LEFT JOIN ... ON l.ts >= r.ts`, which the oracle uses as an
  * independent implementation.
  */
object JoinOps {

  /** Generic as-of join: for each `left` row, attach the payload of the
    * latest `right` row with the same `key` and `rightTs <= leftTs`
    * (null struct when no prior right row exists).
    *
    * Returns the left columns plus a nullable `asof` struct of the right
    * columns.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(right.columns.map(col).toIndexedSeq: _*)
    val lSchema = left.select(lStruct).schema.head.dataType
    val rSchema = right.select(rStruct).schema.head.dataType
    val l2 = left.select(col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), lStruct.as("__l"), lit(null).cast(rSchema).as("__r"))
    val r2 = right.select(col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), lit(null).cast(lSchema).as("__l"), rStruct.as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("asof"))
  }

  /** Nearest-direction as-of join (pandas `merge_asof(direction=
    * 'nearest')`): each left row gets BOTH the latest right row at-or-
    * before and the earliest right row at-or-after its timestamp, from
    * ONE union + one keyed sort — the backward pass is a
    * `last(ignoreNulls)` over RANGE(unbounded, 0) and the forward pass a
    * `first(ignoreNulls)` over RANGE(0, unbounded) on the same window
    * sort (RANGE frames, not ROWS, so equal timestamps are inclusive in
    * both directions). Half the shuffles of running [[asOfJoin]] twice
    * with a negated clock.
    */
  def asOfNearestJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(right.columns.map(col).toIndexedSeq: _*)
    val lSchema = left.select(lStruct).schema.head.dataType
    val rSchema = right.select(rStruct).schema.head.dataType
    val l2 = left.select(col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), lStruct.as("__l"), lit(null).cast(rSchema).as("__r"))
    val r2 = right.select(col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), lit(null).cast(lSchema).as("__l"), rStruct.as("__r"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"))
    l2.unionByName(r2)
      .withColumn("asof_back", last(col("__r"), ignoreNulls = true)
        .over(w.rangeBetween(Window.unboundedPreceding, 0)))
      .withColumn("asof_fwd", first(col("__r"), ignoreNulls = true)
        .over(w.rangeBetween(0, Window.unboundedFollowing)))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("asof_back"), col("asof_fwd"))
  }

  /** Oracle-checked query: each purchase joined to the user's NEAREST
    * click in either direction (tie -> the earlier, backward click).
    * Only the click timestamp crosses the join, so equal-timestamp
    * right rows cannot make the output order-dependent.
    */
  def qAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw.withColumn("us", Tables.eventMicros(raw))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"))
    asOfNearestJoin(purchases, clicks, "user_id", "us", "us")
      .withColumn("back_gap", col("us") - col("asof_back.us"))
      .withColumn("fwd_gap", col("asof_fwd.us") - col("us"))
      .withColumn("direction",
        when(col("asof_back.us").isNull && col("asof_fwd.us").isNull,
          lit("none"))
          .when(col("asof_fwd.us").isNull ||
            (col("asof_back.us").isNotNull &&
              col("back_gap") <= col("fwd_gap")), lit("backward"))
          .otherwise(lit("forward")))
      .withColumn("click_us",
        when(col("direction") === "backward", col("asof_back.us"))
          .when(col("direction") === "forward", col("asof_fwd.us")))
      .withColumn("gap_sec", expr(
        "(CASE WHEN direction = 'backward' THEN back_gap " +
          "WHEN direction = 'forward' THEN fwd_gap END) div 1000000"))
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("click_us"), col("gap_sec"), col("direction"))
      .orderBy(col("event_id"))
  }

  val qAsofNearestOracle: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |           FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |           FROM events WHERE event_type = 'click'),
      |b AS (SELECT p.event_id, p.user_id, p.us, c.us AS back_us
      |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.us),
      |f AS (SELECT p.event_id, c.us AS fwd_us
      |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us <= c.us),
      |d AS (SELECT b.*, f.fwd_us,
      |        CASE WHEN b.back_us IS NULL AND f.fwd_us IS NULL THEN 'none'
      |             WHEN f.fwd_us IS NULL OR (b.back_us IS NOT NULL
      |                  AND b.us - b.back_us <= f.fwd_us - b.us) THEN 'backward'
      |             ELSE 'forward' END AS direction
      |      FROM b JOIN f USING (event_id))
      |SELECT event_id, user_id, us AS purchase_us,
      |       CASE WHEN direction = 'backward' THEN back_us
      |            WHEN direction = 'forward' THEN fwd_us END AS click_us,
      |       (CASE WHEN direction = 'backward' THEN us - back_us
      |             WHEN direction = 'forward' THEN fwd_us - us END) // 1000000
      |         AS gap_sec,
      |       direction
      |FROM d ORDER BY event_id""".stripMargin

  /** Oracle-checked query: each purchase event joined to the user's
    * latest prior click, with the gap in seconds.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw.withColumn("us", Tables.eventMicros(raw))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("value"))
    asOfJoin(purchases, clicks, "user_id", "us", "us")
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("asof.us").as("click_us"),
        expr("(us - asof.us) div 1000000").as("gap_sec"),
        round(col("asof.value"), 2).as("click_value"))
      .orderBy(col("event_id"))
  }

  val qAsofJoinOracle: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |           FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |           FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.us AS purchase_us,
      |       c.us AS click_us,
      |       (p.us - c.us) // 1000000 AS gap_sec,
      |       round(c.value, 2) AS click_value
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.us
      |ORDER BY event_id""".stripMargin

  /** As-of join with a match TOLERANCE (the pandas `merge_asof
    * (tolerance=...)` semantics): the nearest prior match only counts if
    * it is within `tolUs` micros, otherwise the row keeps null match
    * columns. Same one-shuffle plan as [[asOfJoin]] — the tolerance is a
    * post-window projection, not a second join.
    */
  def qAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val TolUs = 3600L * 1000000 // 1 hour
    val raw = Tables.events(spark, dir)
    val ev = raw.withColumn("us", Tables.eventMicros(raw))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("value"))
    val inTol = col("asof").isNotNull &&
      (col("us") - col("asof.us")) <= TolUs
    asOfJoin(purchases, clicks, "user_id", "us", "us")
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        when(inTol, col("asof.us")).as("click_us"),
        when(inTol, expr("(us - asof.us) div 1000000")).as("gap_sec"),
        when(inTol, round(col("asof.value"), 2)).as("click_value"))
      .orderBy(col("event_id"))
  }

  val qAsofToleranceOracle: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |           FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |           FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.us AS purchase_us,
      |       CASE WHEN p.us - c.us <= 3600000000 THEN c.us END AS click_us,
      |       CASE WHEN p.us - c.us <= 3600000000
      |            THEN (p.us - c.us) // 1000000 END AS gap_sec,
      |       CASE WHEN p.us - c.us <= 3600000000
      |            THEN round(c.value, 2) END AS click_value
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.us
      |ORDER BY event_id""".stripMargin

  /** Salted join for skewed keys: replicate the build side `salt` times
    * and scatter the probe side uniformly, so one hot key spreads over
    * `salt` reducers instead of one straggler. AQE's skew-join handles
    * moderate skew automatically; salting is the explicit tool for
    * pathological keys (the classic null-key / power-law-user case at
    * 100 TB).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int): DataFrame = {
    val salted = probe.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Oracle-checked salted-join query: events joined to a per-user
    * activity profile through [[saltedJoin]] (salt 8). The salt is an
    * internal physical detail — every probe row lands in exactly one
    * salt bucket and the build side is replicated across all buckets,
    * so the JOINED ROW SET is identical to the plain equi-join the
    * DuckDB oracle runs; the aggregates are integer-exact so no
    * salt-dependent summation order can perturb the comparison. This is
    * the skew escape hatch for pathological keys where AQE's skew
    * splitting is not available (e.g. inside a bucketed pre-partitioned
    * pipeline stage).
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"))
    val profile = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_user_events"))
    saltedJoin(ev, profile, "user_id", salt = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_user_events")).as("sum_profile"),
        sum(col("user_id")).as("sum_uid"))
      .orderBy(col("event_type"))
  }

  val qSaltedJoinOracle: String =
    """WITH profile AS (
      |  SELECT user_id, COUNT(*) AS n_user_events
      |  FROM events GROUP BY user_id)
      |SELECT e.event_type, COUNT(*) AS n,
      |       CAST(SUM(p.n_user_events) AS BIGINT) AS sum_profile,
      |       CAST(SUM(e.user_id) AS BIGINT) AS sum_uid
      |FROM events e JOIN profile p ON e.user_id = p.user_id
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** The same purchases-to-latest-prior-click enrichment as [[qAsofJoin]],
    * through the NATIVE whole-operator path ([[graft.plans.NativeAsOf]]:
    * custom LogicalPlan + strategy + forward-merge exec) instead of the
    * union+window composition. Shares [[qAsofJoinOracle]]'s SQL text —
    * two independent engine paths, one DuckDB ground truth; AsOfNativeSpec
    * additionally asserts row-for-row equality between the two paths.
    */
  def qAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw.withColumn("us", Tables.eventMicros(raw))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("value"))
    graft.plans.NativeAsOf.asOfJoin(purchases, clicks, "user_id", "us", "us")
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("r_us").as("click_us"),
        expr("(us - r_us) div 1000000").as("gap_sec"),
        round(col("r_value"), 2).as("click_value"))
      .orderBy(col("event_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_native" -> (qAsofNative _),
    "q_asof_tolerance" -> (qAsofTolerance _),
    "q_asof_nearest" -> (qAsofNearest _),
    "q_salted_join" -> (qSaltedJoin _))

  def oracles: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinOracle,
    "q_asof_native" -> qAsofJoinOracle,
    "q_asof_tolerance" -> qAsofToleranceOracle,
    "q_asof_nearest" -> qAsofNearestOracle,
    "q_salted_join" -> qSaltedJoinOracle)
}
