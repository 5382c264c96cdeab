package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SessionStreamJob

case class Ev(ts: Timestamp, user_id: Long, value: Double)

class SessionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("session_window groups events within the gap, append mode emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val sessions = SessionStreamJob.sessionize(
      stream.toDF(), col("ts"), col("user_id"), gap = "1 hour", delay = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      stream.addData(
        Ev(t("2024-01-01 10:00:00"), 1, 1.0),
        Ev(t("2024-01-01 10:30:00"), 1, 2.0), // same session (30m < 1h gap)
        Ev(t("2024-01-01 13:00:00"), 1, 4.0)) // new session
      q.processAllAvailable()
      // advance the watermark so the first sessions close
      stream.addData(Ev(t("2024-01-02 00:00:00"), 2, 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_out")
        .select("key", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)), s"merged session missing in $rows")
      assert(rows.contains((1L, 1L, 4.0)), s"singleton session missing in $rows")
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to preceding views " +
      "with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = SessionStreamJob.attributeClicks(
      views.toDF().toDF("user_id", "view_ts"),
      clicks.toDF().toDF("user_id", "click_ts"))
    // both sides watermarked -> the unsupported-operation check passes and
    // the plan carries join state eviction
    assert(joined.queryExecution.logical.toString.contains("EventTimeWatermark"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_out").start()
    try {
      views.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, t("2024-01-01 10:05:00")),  // within 10 min of user 1's view
        (2L, t("2024-01-01 10:30:00")),  // outside the window -> dropped
        (3L, t("2024-01-01 10:02:00")))  // no matching view
      q.processAllAvailable()
      val rows = spark.table("attrib_out")
        .select("user_id").as[Long].collect().toSeq
      assert(rows == Seq(1L), s"expected only user 1 attributed, got $rows")
    } finally q.stop()
  }

  test("attributeClicks agrees with the batch interval join on in-order " +
      "arrival (the events_attribution twin's join semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val viewRows = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:07:00")),
      (2L, t("2024-01-01 11:00:00")), (3L, t("2024-01-01 12:00:00")))
    val clickRows = Seq(
      (1L, t("2024-01-01 10:05:00")),  // matches BOTH of user 1's views? no: first only (10:07 > 10:05)
      (1L, t("2024-01-01 10:09:00")),  // within 10 min of both user-1 views
      (2L, t("2024-01-01 11:09:59")),  // inside window edge
      (2L, t("2024-01-01 11:10:01")),  // just outside
      (4L, t("2024-01-01 12:00:00")))  // no view
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = SessionStreamJob.attributeClicks(
      views.toDF().toDF("user_id", "view_ts"),
      clicks.toDF().toDF("user_id", "click_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_parity_out").start()
    try {
      views.addData(viewRows: _*); clicks.addData(clickRows: _*)
      q.processAllAvailable()
      // advance both watermarks so every in-window pair is emitted
      views.addData((9L, t("2024-01-02 00:00:00")))
      clicks.addData((9L, t("2024-01-02 00:00:01")))
      q.processAllAvailable()
      val streamed = spark.table("attrib_parity_out")
        .filter(col("user_id") =!= 9L)
        .select("user_id", "view_ts", "click_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      val batch = viewRows.toDF("user_id", "view_ts").as("v")
        .join(clickRows.toDF("user_id", "click_ts").as("c"),
          expr("""v.user_id = c.user_id AND c.click_ts >= v.view_ts
                 | AND c.click_ts <= v.view_ts + interval 10 minutes""".stripMargin))
        .select(col("v.user_id"), col("view_ts"), col("click_ts")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(streamed == batch,
        s"stream/batch divergence: stream=$streamed batch=$batch")
      assert(batch.size == 4, s"fixture should produce 4 attributed pairs, got $batch")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark emits each key once within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val deduped = SessionStreamJob.dedupWithinWatermark(
      stream.toDF(), col("ts"), Seq("user_id"), delay = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      stream.addData(
        Ev(t("2024-01-01 10:00:00"), 1, 1.0),
        Ev(t("2024-01-01 10:05:00"), 1, 2.0), // dup key within horizon
        Ev(t("2024-01-01 10:10:00"), 2, 3.0))
      q.processAllAvailable()
      val users = spark.table("dedup_out").select("user_id").as[Long].collect().sorted
      assert(users.toSeq == Seq(1L, 2L), s"expected one row per key, got $users")
    } finally q.stop()
  }
}
