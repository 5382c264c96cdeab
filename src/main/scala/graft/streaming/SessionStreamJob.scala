package graft.streaming

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Streaming twins of the batch event operators (EventOps):
  * session_window sessionization and watermarked streaming dedup — the
  * two stateful building blocks a streaming training-data pipeline needs
  * beyond the reference's plain groupBy-sum.
  *
  * State design: both operators carry a watermark so state is bounded —
  * session state closes `gap + delay` after the last event, dedup keys
  * expire after the watermark horizon. This is the production-shape
  * counterpart of the reference's unbounded update-mode state
  * (weather_processor.py:139-145, preserved verbatim in WeatherStreamJob).
  */
object SessionStreamJob {

  /** Gap-based session aggregation over an event-time stream.
    * Batch twin: EventOps.eventsSessionize (lag + cumulative-sum ids).
    */
  def sessionize(events: DataFrame, tsCol: Column, keyCol: Column,
      gap: String = "4 hours", delay: String = "10 minutes"): DataFrame =
    events
      .withColumn("event_ts", tsCol)
      .withWatermark("event_ts", delay)
      .groupBy(session_window(col("event_ts"), gap), keyCol.as("key"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("key"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup with bounded state: drops duplicate keys seen
    * within the watermark horizon. Batch twin: DedupOps.exactDedup
    * (dropDuplicates).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: Column,
      keys: Seq[String], delay: String = "1 hour"): DataFrame =
    events
      .withColumn("event_ts", tsCol)
      .withWatermark("event_ts", delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join (view -> click attribution): each click
    * joins the views by the same user that preceded it by at most
    * `window`. BOTH sides are watermarked and the join condition bounds
    * event time on both sides, so Spark evicts join state once the
    * watermark passes the interval — bounded state, the canonical
    * stream-stream join shape. Expects `views(user_id, view_ts, ...)` and
    * `clicks(user_id, click_ts, ...)`.
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
      window: String = "10 minutes", delay: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    views.withWatermark("view_ts", delay).as("v")
      .join(clicks.withWatermark("click_ts", delay).as("c"),
        expr(s"""v.user_id = c.user_id
                | AND c.click_ts >= v.view_ts
                | AND c.click_ts <= v.view_ts + interval $window""".stripMargin),
        joinType)
      .select(col("v.user_id").as("user_id"),
        col("v.view_ts").as("view_ts"), col("c.click_ts").as("click_ts"))
}
