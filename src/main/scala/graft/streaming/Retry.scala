package graft.streaming

import scala.util.control.NonFatal

/** Connect-time retry, mirroring the reference's two
  * `wait_for_kafka_connection` loops (weather_stream.py:33-91 producer
  * side, weather_processor.py:28-77 consumer side): up to `retries`
  * attempts with a `delayMs` pause between them, then a loud failure.
  * Spark's own source/sink machinery retries steady-state I/O; this
  * wrapper reproduces the reference's observable *connect-time* behavior
  * (x10, 2 s) around stream construction and start-up.
  */
object Retry {

  /** Run `op`, retrying on non-fatal failure. `sleep` is injectable so
    * specs assert the delay schedule without waiting real time. Throws
    * after `retries` failed attempts (the reference raises after its
    * 10th), chaining the last cause.
    */
  def connect[T](name: String, retries: Int = 10, delayMs: Long = 2000L,
      sleep: Long => Unit = Thread.sleep)(op: => T): T = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return op
      catch {
        case NonFatal(e) if attempt < retries =>
          System.err.println(s"[$name] connect attempt $attempt/$retries " +
            s"failed: ${e.getMessage}; retrying in $delayMs ms")
          sleep(delayMs)
        case NonFatal(e) =>
          throw new IllegalStateException(
            s"[$name] failed to connect after $retries attempts", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
