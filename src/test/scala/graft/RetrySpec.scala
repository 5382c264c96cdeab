package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Retry

/** Connect-time retry contract (reference wait_for_kafka_connection,
  * weather_stream.py:33-91 / weather_processor.py:28-77): N transient
  * failures then success; abort with a chained cause after the retry
  * budget; the configured delay between attempts.
  */
class RetrySpec extends AnyFunSuite {

  test("succeeds after N transient failures, sleeping the delay between attempts") {
    var attempts = 0
    val sleeps = scala.collection.mutable.Buffer[Long]()
    val out = Retry.connect("t", retries = 10, delayMs = 2000, sleep = sleeps += _) {
      attempts += 1
      if (attempts <= 3) throw new RuntimeException(s"transient $attempts")
      "connected"
    }
    assert(out == "connected")
    assert(attempts == 4)
    assert(sleeps.toSeq == Seq(2000L, 2000L, 2000L))
  }

  test("aborts loudly after the retry budget, chaining the last cause") {
    var attempts = 0
    val e = intercept[IllegalStateException] {
      Retry.connect("t", retries = 10, delayMs = 1, sleep = _ => ()) {
        attempts += 1
        throw new RuntimeException(s"down $attempts")
      }
    }
    assert(attempts == 10, "reference makes exactly 10 attempts")
    assert(e.getMessage.contains("after 10 attempts"))
    assert(e.getCause.getMessage == "down 10")
  }

  test("first-attempt success never sleeps") {
    var slept = false
    val out = Retry.connect("t", sleep = _ => slept = true)(42)
    assert(out == 42 && !slept)
  }

  test("fatal errors propagate immediately (no retry loop on OOM-class throws)") {
    var attempts = 0
    intercept[OutOfMemoryError] {
      Retry.connect("t", sleep = _ => ()) {
        attempts += 1
        throw new OutOfMemoryError("fatal")
      }
    }
    assert(attempts == 1)
  }
}
