package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{KeyedEvent, TwsQuotaJob}

/** Watermark-finalized admission quotas (TwsQuotaJob): a bucket's report
  * emits exactly once, counts accumulate across micro-batches, the cap
  * throttles the excess, and the report set is independent of how the
  * stream is carved into batches.
  */
class TwsQuotaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val HourMs = 3600 * 1000L

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

  test("counts accumulate across batches, the bucket finalizes exactly " +
      "once past the watermark, and the cap throttles the excess") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[KeyedEvent]
      val q = TwsQuotaJob.quota(stream.toDS(), HourMs, cap = 2)
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_quota_out").start()
      try {
        stream.addData(
          KeyedEvent(1, t("2024-01-01 10:00:00"), 0.0),
          KeyedEvent(1, t("2024-01-01 10:10:00"), 0.0),
          KeyedEvent(1, t("2024-01-01 10:20:00"), 0.0))
        q.processAllAvailable()
        assert(spark.table("tws_quota_out").isEmpty,
          "bucket reported before its end passed the watermark")

        // 4th event lands in the same (still-open) bucket
        stream.addData(KeyedEvent(1, t("2024-01-01 10:40:00"), 0.0))
        q.processAllAvailable()
        // advance the watermark past 11:00, then run one more batch so
        // the timer fires with it
        stream.addData(KeyedEvent(2, t("2024-01-01 12:30:00"), 0.0))
        q.processAllAvailable()
        stream.addData(KeyedEvent(2, t("2024-01-01 13:30:00"), 0.0))
        q.processAllAvailable()
        val rows = spark.table("tws_quota_out").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        val hour10 = rows.filter(r => r._1 == 1L)
        assert(hour10.toSeq ==
          Seq((1L, t("2024-01-01 10:00:00").getTime, 4L, 2L, 2L)),
          s"hour-10 report wrong or duplicated: ${rows.toList}")
      } finally q.stop()
    }
  }

  test("report set is independent of micro-batch carving") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // event-time order: a row-at-a-time carving advances the watermark
      // after every row, so an out-of-order row would be legitimately
      // DROPPED as late — carving independence is a guarantee for
      // in-horizon arrivals, not a repeal of watermark semantics
      val events = Seq(
        KeyedEvent(1, t("2024-01-01 10:00:00"), 0.0),
        KeyedEvent(2, t("2024-01-01 10:05:00"), 0.0),
        KeyedEvent(1, t("2024-01-01 10:20:00"), 0.0),
        KeyedEvent(1, t("2024-01-01 10:40:00"), 0.0),
        KeyedEvent(1, t("2024-01-01 11:30:00"), 0.0),
        KeyedEvent(2, t("2024-01-01 12:15:00"), 0.0))
      val flush1 = KeyedEvent(99, t("2024-01-02 00:00:00"), 0.0)
      val flush2 = KeyedEvent(99, t("2024-01-03 00:00:00"), 0.0)

      def drive(name: String, carving: Seq[Seq[KeyedEvent]]): Set[(Long, Long, Long, Long, Long)] = {
        val stream = MemoryStream[KeyedEvent]
        val q = TwsQuotaJob.quota(stream.toDS(), HourMs, cap = 2)
          .writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        try {
          (carving :+ Seq(flush1) :+ Seq(flush2)).foreach { wave =>
            stream.addData(wave: _*)
            q.processAllAvailable()
          }
        } finally q.stop()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
          .filter(_._1 != 99L).toSet
      }

      val oneShot = drive("quota_carve_a", Seq(events))
      val rowAtATime = drive("quota_carve_b", events.map(Seq(_)))
      assert(oneShot == rowAtATime,
        s"carving changed the reports:\n$oneShot\nvs\n$rowAtATime")
      // and the content is right: key 1 hour 10 throttles 1 of 3
      assert(oneShot.contains(
        (1L, t("2024-01-01 10:00:00").getTime, 3L, 2L, 1L)))
      assert(oneShot.contains(
        (2L, t("2024-01-01 10:00:00").getTime, 1L, 1L, 0L)))
    }
  }
}
