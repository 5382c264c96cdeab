package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{KeyedEvent, TwsSessionJob}

/** transformWithState sessionization: same laws as the
  * flatMapGroupsWithState job (StatefulSessionSpec) — in-batch gap
  * splits emit immediately, cross-batch events merge, timers close the
  * tail — plus the stale-timer discipline the new API requires.
  */
class TwsSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("in-batch gap closes immediately; a timer closes the tail; " +
      "cross-batch events merge; stale timers are harmless") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[KeyedEvent]
      val q = TwsSessionJob.sessionize(stream.toDS(), gapMs = 3600 * 1000L)
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_out").start()
      try {
        stream.addData(
          KeyedEvent(1, t("2024-01-01 10:00:00"), 1.0),
          KeyedEvent(1, t("2024-01-01 10:30:00"), 2.0), // same session
          KeyedEvent(1, t("2024-01-01 13:00:00"), 4.0)) // gap > 1h -> split
        q.processAllAvailable()
        val afterBatch1 = spark.table("tws_out")
          .select("key", "n_events", "sum_value").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(afterBatch1.contains((1L, 2L, 3.0)),
          s"in-batch closed session missing: $afterBatch1")

        // extend the open session across a batch boundary — the timer
        // registered for 13:00 becomes stale and must NOT close it
        stream.addData(KeyedEvent(1, t("2024-01-01 13:30:00"), 5.0))
        q.processAllAvailable()
        // advance the watermark far past 13:30 + gap -> tail closes once
        stream.addData(KeyedEvent(2, t("2024-01-02 00:00:00"), 9.0))
        q.processAllAvailable()
        stream.addData(KeyedEvent(2, t("2024-01-03 00:00:00"), 9.0))
        q.processAllAvailable()
        val rows = spark.table("tws_out")
          .select("key", "n_events", "sum_value").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        // the 13:00+13:30 pair must close ONCE as a merged 2-event
        // session summing 9.0 (4.0 + 5.0)
        val tail = rows.filter(r => r._1 == 1L && r._3 == 9.0)
        assert(tail.toSeq == Seq((1L, 2L, 9.0)),
          s"cross-batch merged tail wrong or duplicated: ${rows.toList}")
      } finally q.stop()
    }
  }

  test("fixture parity: transformWithState sessions equal the " +
      "flatMapGroupsWithState job's on the events table") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import org.apache.spark.sql.functions.col
      val gapMs = graft.operators.EventOps.SessionGapMicros / 1000
      val evDf = Tables.events(spark, TestSpark.sfDir)
      val raw = evDf
        .select(col("user_id"), Tables.eventMicros(evDf).as("us"),
          col("value")).collect()
        .map(r => KeyedEvent(r.getLong(0),
          new Timestamp(r.getLong(1) / 1000L), r.getDouble(2)))
      val stream = MemoryStream[KeyedEvent]
      val q = TwsSessionJob.sessionize(stream.toDS(), gapMs)
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_fixture").start()
      try {
        stream.addData(raw.toIndexedSeq: _*)
        q.processAllAvailable()
        stream.addData(KeyedEvent(-1L, t("2030-01-01 00:00:00"), 0.0))
        q.processAllAvailable()
        stream.addData(KeyedEvent(-2L, t("2031-01-01 00:00:00"), 0.0))
        q.processAllAvailable()
        val tws = spark.table("tws_fixture")
          .filter(col("key") >= 0L).collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
            r.getTimestamp(2).getTime, r.getLong(3))).toSet
        // the old-API job is itself DuckDB-oracle-checked
        // (events_sessionize_stateful), so set-equality here chains the
        // new API to the same oracle
        val old = graft.operators.EventOps
          .eventsSessionizeStateful(spark, TestSpark.sfDir).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        assert(tws.size == old.size,
          s"session count mismatch: tws ${tws.size} vs fmgws ${old.size}")
        assert(tws == old, {
          val d1 = tws -- old; val d2 = old -- tws
          s"diverged: tws-only ${d1.take(3)}, fmgws-only ${d2.take(3)}"
        })
      } finally q.stop()
    }
  }
}
