package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{KeyedEvent, StatefulSessionJob}

/** flatMapGroupsWithState sessionization: in-batch gap splits emit
  * immediately; the trailing open session closes via event-time timeout
  * when the watermark advances; results agree with the declarative
  * session_window formulation's semantics.
  */
class StatefulSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("in-batch gap closes a session immediately; timeout closes the tail") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KeyedEvent]
    val sessions = StatefulSessionJob.sessionize(
      stream.toDS(), gapMs = 3600 * 1000L) // 1h gap
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("fmgws_out").start()
    try {
      stream.addData(
        KeyedEvent(1, t("2024-01-01 10:00:00"), 1.0),
        KeyedEvent(1, t("2024-01-01 10:30:00"), 2.0), // same session
        KeyedEvent(1, t("2024-01-01 13:00:00"), 4.0)) // gap > 1h → new session
      q.processAllAvailable()
      val afterBatch1 = spark.table("fmgws_out")
        .select("key", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(afterBatch1.contains((1L, 2L, 3.0)),
        s"in-batch closed session missing: $afterBatch1")

      // advance the watermark far past 13:00 + gap → timeout fires
      stream.addData(KeyedEvent(2, t("2024-01-02 00:00:00"), 9.0))
      q.processAllAvailable()
      stream.addData(KeyedEvent(2, t("2024-01-03 00:00:00"), 9.0))
      q.processAllAvailable()
      val rows = spark.table("fmgws_out")
        .select("key", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 1L, 4.0)), s"timeout-closed session missing: $rows")
    } finally q.stop()
  }

  test("events split across micro-batches merge into one session") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KeyedEvent]
    val sessions = StatefulSessionJob.sessionize(
      stream.toDS(), gapMs = 3600 * 1000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("fmgws_merge").start()
    try {
      stream.addData(KeyedEvent(7, t("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      stream.addData(KeyedEvent(7, t("2024-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      stream.addData(KeyedEvent(8, t("2024-01-05 00:00:00"), 0.0))
      q.processAllAvailable()
      stream.addData(KeyedEvent(8, t("2024-01-06 00:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("fmgws_merge")
        .select("key", "session_start", "session_end", "n_events", "sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
        .filter(_._1 == 7L)
      assert(rows.toSet == Set(
        (7L, t("2024-01-01 10:00:00"), t("2024-01-01 10:20:00"), 2L, 3.0)),
        s"cross-batch merge failed: ${rows.toList}")
    } finally q.stop()
  }
}
