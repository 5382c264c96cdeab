package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 — the HTTP polling source (weather_stream.py:94-151), built as
  * SURVEY.md §2.1 option (c): a driver-side poller thread calls `fetch`
  * for each configured location every `intervalMs` (reference
  * CALL_INTERVAL = 60 s, weather_stream.py:26) and stages each poll round
  * as one new JSON-lines file; a file streaming scan over the staging
  * directory feeds the engine, with `Trigger.ProcessingTime("60 seconds")`
  * matching the producer cadence downstream.
  *
  * `fetch(lat, lon)` abstracts the HTTP GET (requests.get off-thread at
  * weather_stream.py:120): production supplies a java.net.http client;
  * this container has no network, so tests inject a deterministic fake.
  * A failed fetch (None) is skipped — the reference logs and keeps
  * polling (weather_stream.py:146-151). Raw One Call payloads land
  * unmodified: the producer math (A1/P5-P7/P9) runs IN the engine over
  * the staged documents via [[PollingSource.producerMessages]], so the
  * whole producer+consumer pipeline is one Spark plan.
  *
  * Scale note: the poller is inherently a driver-side singleton (the
  * reference's design point is 2 locations / 60 s); the engine-side scan
  * and everything downstream is partition-parallel. A large location set
  * would shard locations across multiple pollers writing to the same
  * staging directory — the file source unions them for free.
  */
class PollingSource(
    stagingDir: String,
    locations: Seq[(Double, Double)],
    fetch: (Double, Double) => Option[String],
    intervalMs: Long = 60000L) {

  // Resume the file sequence after the max already staged: a restarted
  // poller must never reuse a name the checkpointed file source has
  // already recorded (an ATOMIC_MOVE onto poll-0.json would be silently
  // ignored by the source forever).
  private val seq = new AtomicLong(PollingSource.nextSeq(stagingDir))
  private val exec = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-polling-source"); t.setDaemon(true); t
  }

  /** One poll round: fetch every location, stage one file. The write is
    * tmp-then-atomic-rename so the streaming file source never observes a
    * partially written file.
    */
  def pollOnce(): Unit = {
    val docs = locations.flatMap { case (lat, lon) => fetch(lat, lon) }
    if (docs.nonEmpty) {
      val n = seq.getAndIncrement()
      Files.createDirectories(Paths.get(stagingDir))
      val tmp = Paths.get(stagingDir, s".poll-$n.json.tmp")
      val dst = Paths.get(stagingDir, s"poll-$n.json")
      Files.write(tmp, docs.mkString("\n").getBytes(UTF_8))
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Begin polling at the configured cadence (first round immediately,
    * mirroring the reference's poll-then-sleep loop,
    * weather_stream.py:157-159). The round body is exception-guarded:
    * `scheduleAtFixedRate` permanently cancels the task on an uncaught
    * throw, so a single transient fetch/IO failure must not end
    * ingestion — log-and-keep-polling, like the reference
    * (weather_stream.py:146-151).
    */
  def start(): Unit =
    exec.scheduleAtFixedRate(() =>
      try pollOnce()
      catch { case scala.util.control.NonFatal(e) =>
        // fatal errors (OOM, linkage) must propagate and stop the task;
        // an interrupt from stop() ends the executor quietly
        System.err.println(s"[polling-source] poll round failed, continuing: $e")
      },
      0, intervalMs, TimeUnit.MILLISECONDS)

  def stop(): Unit = exec.shutdownNow()
}

object PollingSource {

  /** One Call 3.0 poll URL (weather_stream.py:29-30): minutely only —
    * hourly/daily/current excluded — metric units, key as query param.
    * The key is URL-encoded: a reserved char ('&', '=', '+') in a raw
    * interpolation would silently truncate the query string and turn
    * every poll into a skipped 401.
    */
  def buildUrl(baseUrl: String, apiKey: String, lat: Double, lon: Double): String = {
    val key = java.net.URLEncoder.encode(apiKey, UTF_8)
    s"$baseUrl?lat=$lat&lon=$lon&exclude=hourly,daily,current&units=metric&appid=$key"
  }

  /** Production HTTP fetch (weather_stream.py:120-121): a blocking GET of
    * the poll URL per location. Status handling is the
    * `raise_for_status` + `except RequestException` analog
    * (weather_stream.py:121,146-151): non-2xx and transport errors both
    * resolve to None, so the poller logs, skips the location, and keeps
    * polling. The reference's `requests.get` has no timeout (a hung
    * socket stalls its loop forever); here both connect and request
    * carry `timeoutMs` — documented hardening, not a semantic change.
    */
  def httpFetch(baseUrl: String, apiKey: String,
      timeoutMs: Long = 30000L): (Double, Double) => Option[String] = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    (lat, lon) =>
      try {
        val req = HttpRequest
          .newBuilder(java.net.URI.create(buildUrl(baseUrl, apiKey, lat, lon)))
          .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() >= 200 && resp.statusCode() < 300) Some(resp.body())
        else {
          System.err.println(
            s"[polling-source] HTTP ${resp.statusCode()} for ($lat, $lon) — skipping")
          None
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[polling-source] fetch failed for ($lat, $lon): $e")
          None
      }
  }

  /** First unused staging sequence number: one past the max already on
    * disk (restart safety), 0 for a fresh directory.
    */
  private[streaming] def nextSeq(stagingDir: String): Long = {
    val dir = Paths.get(stagingDir)
    if (!Files.isDirectory(dir)) 0L
    else {
      val stream = Files.list(dir)
      try {
        val pat = "poll-(\\d+)\\.json".r
        var max = -1L
        stream.forEach { p =>
          pat.findFirstMatchIn(p.getFileName.toString)
            .foreach(m => max = math.max(max, m.group(1).toLong))
        }
        max + 1
      } finally stream.close()
    }
  }

  /** The One Call 3.0 document shape the producer consumes — `minutely`
    * only; the poll URL excludes hourly/daily/current
    * (weather_stream.py:29-30).
    */
  val oneCallSchema: StructType = StructType(Seq(
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("minutely", ArrayType(StructType(Seq(
      StructField("dt", LongType),
      StructField("precipitation", DoubleType)))))))

  /** Streaming scan over the staged payloads. `maxFilesPerTrigger`
    * bounds each micro-batch after downtime (backpressure: a poller that
    * ran while the query was down leaves a backlog; without the cap the
    * first batch swallows it whole).
    */
  def readStaged(spark: SparkSession, stagingDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(oneCallSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(stagingDir)
  }

  /** Producer math in-engine (weather_stream.py:124-138): skip documents
    * without `minutely` (the :124 guard), fold the minutely array with
    * missing precipitation defaulting to 0 (A1/P5), round to 5 decimals
    * (P7), timestamp = first entry's dt (P6), then serialize to the exact
    * Kafka message shape (P9) — the numeric `timestamp` token that the
    * consumer schema later coerces to StringType.
    */
  def producerMessages(staged: DataFrame): DataFrame =
    staged.filter(col("minutely").isNotNull && size(col("minutely")) > 0)
      .select(to_json(struct(
        element_at(col("minutely"), 1).getField("dt").as("timestamp"),
        round(aggregate(col("minutely"), lit(0.0d),
          (acc, m) => acc + coalesce(m.getField("precipitation"), lit(0.0d))), 5)
          .as("total_precipitation"),
        struct(col("lat"), col("lon")).as("location"))).as("value"))
}
