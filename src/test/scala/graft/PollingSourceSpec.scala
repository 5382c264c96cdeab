package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{PollingSource, WeatherStreamJob}

/** S1 polling source end-to-end: fake-fetch poller -> staged files ->
  * file streaming scan -> producer math in-engine -> consumer aggregate.
  * The fake fetch exercises the reference's edge cases: a minutely entry
  * with missing precipitation (P5 default-0), a location whose payload
  * has no minutely block (the weather_stream.py:124 guard), and a failed
  * fetch (skip-and-continue).
  */
class PollingSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def oneCall(lat: Double, lon: Double, dts: Seq[(Long, Option[Double])]): String = {
    val minutely = dts.map { case (dt, p) =>
      p.map(v => s"""{"dt": $dt, "precipitation": $v}""")
        .getOrElse(s"""{"dt": $dt}""")
    }.mkString("[", ",", "]")
    s"""{"lat": $lat, "lon": $lon, "minutely": $minutely}"""
  }

  test("poller stages atomic files; producer messages match the wire contract") {
    val staging = Files.createTempDirectory("graft_poll").toString
    val fetch: (Double, Double) => Option[String] = {
      case (52.0, 5.1) => Some(oneCall(52.0, 5.1,
        Seq(1736532000L -> Some(0.25), 1736532060L -> None, 1736532120L -> Some(0.5))))
      case (41.1, -8.6) => Some("""{"lat": 41.1, "lon": -8.6}""") // no minutely
      case _ => None                                               // failed fetch
    }
    val src = new PollingSource(staging,
      Seq((52.0, 5.1), (41.1, -8.6), (0.0, 0.0)), fetch)
    src.pollOnce()
    src.pollOnce()

    // staged: 2 rounds x 2 successful fetches (the failed one skipped)
    val staged = spark.read.schema(PollingSource.oneCallSchema).json(staging)
    assert(staged.count() == 4)

    val msgs = PollingSource.producerMessages(staged).collect().map(_.getString(0))
    // the no-minutely payload is guarded out; 2 rounds x 1 message
    assert(msgs.length == 2)
    // missing precipitation defaulted to 0: 0.25 + 0 + 0.5; numeric ts token
    assert(msgs.toSet == Set(
      """{"timestamp":1736532000,"total_precipitation":0.75,"location":{"lat":52.0,"lon":5.1}}"""))
  }

  test("restart from checkpoint: offsets and aggregation state recover " +
      "(the documented deviation from the reference's no-checkpoint replay)") {
    val staging = Files.createTempDirectory("graft_poll_recov").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_recov").toString
    val out = Files.createTempDirectory("graft_out_recov").toString
    val fetch: (Double, Double) => Option[String] =
      (lat, lon) => Some(oneCall(lat, lon, Seq(1736532000L -> Some(1.0))))
    val src = new PollingSource(staging, Seq((52.0, 5.1)), fetch)
    import org.apache.spark.sql.streaming.Trigger

    def runOnce(): Unit = {
      val agg = WeatherStreamJob.aggregate(
        PollingSource.producerMessages(PollingSource.readStaged(spark, staging)))
      val q = WeatherStreamJob.start(agg, ckpt, Trigger.ProcessingTime(0))(
        WeatherStreamJob.parquetSink(out))
      try { q.processAllAvailable() } finally q.stop()
    }

    src.pollOnce()
    runOnce()
    // restarted POLLER instance too: its sequence must resume after the
    // files already staged, not overwrite poll-0.json (which the
    // checkpointed file source would silently never re-read)
    val src2 = new PollingSource(staging, Seq((52.0, 5.1)), fetch)
    src2.pollOnce()
    runOnce() // fresh query instance, same checkpoint
    val sunk = spark.read.parquet(out)
      .collect().map(_.getAs[Double]("hourly_precipitation")).toSeq.sorted
    // the restarted query read ONLY the new file (offsets recovered) yet
    // emitted the ACCUMULATED sum (state recovered): first run appended
    // 1.0, second appended 2.0 — a state-less restart would append 1.0
    // again instead
    assert(sunk == Seq(1.0, 2.0), s"unexpected sink contents $sunk")
  }

  test("maxFilesPerTrigger drains a staged backlog in bounded micro-batches") {
    val staging = Files.createTempDirectory("graft_poll_bp").toString
    val fetch: (Double, Double) => Option[String] =
      (lat, lon) => Some(oneCall(lat, lon, Seq(1736532000L -> Some(1.0))))
    val src = new PollingSource(staging, Seq((52.0, 5.1)), fetch)
    (1 to 4).foreach(_ => src.pollOnce()) // backlog before the query starts
    val agg = WeatherStreamJob.aggregate(PollingSource.producerMessages(
      PollingSource.readStaged(spark, staging, maxFilesPerTrigger = Some(1))))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("bp_out").start()
    try {
      q.processAllAvailable()
      // 4 files drained one per batch: the key re-emits 4 times with the
      // running sum 1.0 .. 4.0 (one emission per micro-batch)
      val sums = spark.table("bp_out").collect()
        .map(_.getAs[Double]("hourly_precipitation")).toSeq.sorted
      assert(sums == Seq(1.0, 2.0, 3.0, 4.0), s"expected 4 bounded batches, got $sums")
    } finally q.stop()
  }

  test("httpFetch drives pollOnce through a real HTTP round-trip " +
      "(status check, skip-on-5xx, query params)") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/onecall", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val query = ex.getRequestURI.getQuery
        seen.add(query)
        // lat=13 simulates an upstream outage -> raise_for_status analog
        val (code, body) =
          if (query.contains("lat=13.0")) (500, "upstream error")
          else {
            val lat = query.split("&").find(_.startsWith("lat=")).get.drop(4)
            val lon = query.split("&").find(_.startsWith("lon=")).get.drop(4)
            (200, oneCall(lat.toDouble, lon.toDouble, Seq(1736532000L -> Some(0.5))))
          }
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/onecall"
      val staging = Files.createTempDirectory("graft_poll_http").toString
      val fetch = PollingSource.httpFetch(base, apiKey = "test-key", timeoutMs = 5000)
      val src = new PollingSource(staging, Seq((52.0, 5.1), (13.0, 9.9)), fetch)
      src.pollOnce()
      // both locations were requested with the reference's URL shape
      assert(seen.size == 2)
      seen.forEach { q =>
        assert(q.contains("exclude=hourly,daily,current") &&
          q.contains("units=metric") && q.contains("appid=test-key"), q)
      }
      // the 500 location was skipped; the 200 payload staged verbatim
      val staged = spark.read.schema(PollingSource.oneCallSchema).json(staging)
      val rows = staged.collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Double]("lat") == 52.0)
      val msgs = PollingSource.producerMessages(staged).collect().map(_.getString(0))
      assert(msgs.toSeq == Seq(
        """{"timestamp":1736532000,"total_precipitation":0.5,"location":{"lat":52.0,"lon":5.1}}"""))
    } finally server.stop(0)
  }

  test("streaming: staged polls flow through producer + consumer plans") {
    val staging = Files.createTempDirectory("graft_poll_stream").toString
    var round = 0
    val fetch: (Double, Double) => Option[String] = { case (lat, lon) =>
      Some(oneCall(lat, lon, Seq(1736532000L -> Some(1.0 + round))))
    }
    val src = new PollingSource(staging, Seq((52.0, 5.1)), fetch)

    val agg = WeatherStreamJob.aggregate(
      PollingSource.producerMessages(PollingSource.readStaged(spark, staging)))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("polled_updates").start()
    try {
      src.pollOnce(); round = 1
      q.processAllAvailable()
      src.pollOnce()
      q.processAllAvailable()
      val rows = spark.table("polled_updates").collect()
        .map(r => r.getAs[Double]("hourly_precipitation")).toSet
      // update mode: first batch emits 1.0, second re-emits accumulated 3.0
      assert(rows == Set(1.0, 3.0), s"unexpected emissions $rows")
    } finally q.stop()
  }
}
