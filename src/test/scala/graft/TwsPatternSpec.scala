package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{TwsPatternJob, TypedEvent}

/** Ring-buffer laws for the ListState pattern detector: the lookback
  * boundary is exact (an antecedent exactly N back triggers, N+1 back
  * does not) and the ring persists across micro-batches.
  */
class TwsPatternSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(i: Int) = new Timestamp(1700000000000L + i * 60000L)

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

  test("lookback boundary is exact and the ring survives batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[TypedEvent]
      val q = TwsPatternJob.detect(stream.toDS(), "purchase", "signup", 5)
        .writeStream.outputMode("append")
        .format("memory").queryName("twsp_out").start()
      try {
        // key 1: signup exactly 5 events back -> HIT
        stream.addData(
          TypedEvent(1, t(0), "signup"),
          TypedEvent(1, t(1), "view"), TypedEvent(1, t(2), "view"),
          TypedEvent(1, t(3), "view"), TypedEvent(1, t(4), "view"),
          TypedEvent(1, t(5), "purchase"))
        // key 2: signup 6 events back -> NO hit
        stream.addData(
          TypedEvent(2, t(0), "signup"),
          TypedEvent(2, t(1), "view"), TypedEvent(2, t(2), "view"),
          TypedEvent(2, t(3), "view"), TypedEvent(2, t(4), "view"),
          TypedEvent(2, t(5), "view"),
          TypedEvent(2, t(6), "purchase"))
        q.processAllAvailable()
        // key 3: signup in batch A, purchase in batch B within 5 -> HIT
        stream.addData(TypedEvent(3, t(0), "signup"),
          TypedEvent(3, t(1), "view"))
        q.processAllAvailable()
        stream.addData(TypedEvent(3, t(2), "purchase"))
        q.processAllAvailable()
        val hits = spark.table("twsp_out").collect()
          .map(r => r.getLong(0)).toSeq.sorted
        assert(hits == Seq(1L, 3L),
          s"expected hits for keys 1 and 3 only, got $hits")
      } finally q.stop()
    }
  }
}
