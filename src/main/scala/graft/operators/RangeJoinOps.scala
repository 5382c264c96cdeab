package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Point-in-interval range join — an operator Spark lacks natively.
  *
  * With no equi-key, Catalyst plans `p.t BETWEEN i.s AND i.e` as a
  * BroadcastNestedLoopJoin (or a cartesian product when both sides are
  * large): O(|points| × |intervals|) comparisons — dead at 100 TB. The
  * scale path is bin bucketing (the same trick Databricks' range-join
  * optimization and PostGIS grid joins use): quantize time into
  * fixed-width bins, explode each interval into the bins it overlaps,
  * tag each point with its single bin, equi-join on the bin, then apply
  * the exact range predicate as a residual filter.
  *
  * Cost model: the equi-join shuffles on the bin key (distributable,
  * AQE-balanceable) and each interval is replicated `len/binWidth + 1`
  * times — choose binWidth ≈ median interval length so replication is
  * ~2×. Each (point, interval) match is found in exactly ONE bin (the
  * point's bin), so no post-join dedup is needed.
  */
object RangeJoinOps {

  /** Generic binned range join: rows of `points` (point column `t`)
    * matched to rows of `intervals` (columns `s`, `e`) where
    * `s <= t < e` (half-open). All columns are integer micros (events.ts
    * is normalized via the schema-dispatched Tables.eventMicros; integer
    * arithmetic only — see EventOps).
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
      t: String, s: String, e: String, binWidth: Long): DataFrame = {
    val p = points.withColumn("__bin", expr(s"$t div $binWidth"))
    // half-open interval [s, e): the last touched bin is (e-1) div width
    val i = intervals.withColumn("__bin",
      explode(sequence(expr(s"$s div $binWidth"), expr(s"($e - 1) div $binWidth"))))
    p.join(i, Seq("__bin"))
      .filter(col(t) >= col(s) && col(t) < col(e))
      .drop("__bin")
  }

  /** Oracle-checked query: "incident windows" — each error event opens a
    * 10-minute window; count the events and sum their value inside each
    * window. Bin width = window length, so every interval explodes to at
    * most 2 bins (~2× replication of the small side).
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val WindowUs = 600L * 1000000 // 10 min in micros
    val raw = Tables.events(spark, dir)
    val ev = raw.withColumn("us", Tables.eventMicros(raw))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("us").as("s"),
        (col("us") + lit(WindowUs)).as("e"))
    val points = ev.select(col("us").as("t"), col("value"))
    rangeJoinBinned(points, incidents, "t", "s", "e", WindowUs)
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("incident_id"))
  }

  val qRangeJoinOracle: String =
    """WITH inc AS (SELECT event_id AS incident_id,
      |               epoch_us(CAST(ts AS TIMESTAMP)) AS s,
      |               epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e
      |             FROM events WHERE event_type = 'error'),
      |     pts AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS t, value FROM events)
      |SELECT i.incident_id, COUNT(*) AS n_events,
      |       round(SUM(p.value), 2) AS sum_value
      |FROM inc i JOIN pts p ON p.t >= i.s AND p.t < i.e
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> (qRangeJoin _))

  def oracles: Map[String, String] = Map(
    "q_range_join" -> qRangeJoinOracle)
}
