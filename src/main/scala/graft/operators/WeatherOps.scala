package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Parity operators for the reference pipeline.
  *
  * The reference consumer (weather_processor.py:108-141) is:
  * Kafka value bytes -> CAST AS STRING (P1, weather_processor.py:128)
  * -> from_json with a declared StructType (P2, weather_processor.py:129,
  * schema at 108-124; `timestamp` deliberately StringType although the wire
  * token is a JSON number) -> flatten nested struct (P3,
  * weather_processor.py:130-135) -> groupBy(timestamp, lat, lon)
  * .agg(sum(total_precipitation)) (A2, weather_processor.py:139-141)
  * -> per-batch null-rejection filter (P4, weather_processor.py:230-235)
  * -> epoch-string -> wall-clock timestamp at the sink (P8,
  * weather_processor.py:245).
  *
  * The reference producer (weather_stream.py:124-138) computes, per
  * location per poll: sum of the 61-entry `minutely` array with missing
  * precipitation defaulting to 0 (A1/P5, weather_stream.py:126-128),
  * rounded to 5 decimals (P7), timestamp = first minutely entry's `dt`
  * (P6, weather_stream.py:129), serialized to JSON (P9,
  * weather_stream.py:131-138).
  *
  * Every stage is a pure `DataFrame => DataFrame`, usable identically under
  * batch and Structured Streaming (graft.streaming.WeatherStreamJob). At
  * scale the aggregation is a hash-partitioned shuffle on the grouping keys
  * with map-side partial aggregation — Catalyst plans partial+final
  * HashAggregate automatically; nothing here materializes on the driver.
  */
object WeatherOps {

  /** Consumer's declared message schema (weather_processor.py:108-124).
    * `timestamp` is StringType on purpose: Spark's permissive JSON parser
    * stringifies the numeric wire token, matching the reference.
    */
  val locationSchema: StructType = StructType(Seq(
    StructField("lat", DoubleType),
    StructField("lon", DoubleType)))

  val messageSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("total_precipitation", DoubleType),
    StructField("location", locationSchema)))

  /** P1 — Kafka value bytes -> UTF-8 string (weather_processor.py:128). */
  def castValueAsString(df: DataFrame): DataFrame =
    df.selectExpr("CAST(value AS STRING) AS value")

  /** P2 — JSON deserialization against the declared schema; malformed
    * documents become all-NULL structs (permissive mode), matching
    * weather_processor.py:129.
    */
  def parseJson(df: DataFrame): DataFrame =
    df.select(from_json(col("value"), messageSchema).alias("data"))

  /** P3 — two-level struct flattening (weather_processor.py:130-135). */
  def flatten(df: DataFrame): DataFrame = df.select(
    col("data.timestamp").as("timestamp"),
    col("data.total_precipitation").as("total_precipitation"),
    col("data.location.lat").as("lat"),
    col("data.location.lon").as("lon"))

  /** A2 — the core stateful aggregation (weather_processor.py:139-141). */
  def hourlyAgg(df: DataFrame): DataFrame =
    df.groupBy(col("timestamp"), col("lat"), col("lon"))
      .agg(sum(col("total_precipitation")).as("hourly_precipitation"))

  /** P4 — conjunctive null rejection (weather_processor.py:230-235). */
  def rejectNulls(df: DataFrame): DataFrame = df.filter(
    col("timestamp").isNotNull && col("hourly_precipitation").isNotNull &&
      col("lat").isNotNull && col("lon").isNotNull)

  /** P8 — epoch-seconds string -> wall clock (weather_processor.py:245).
    * The reference uses the container's local TZ; we pin UTC (documented
    * deviation). Emitted as a formatted string so the DuckDB oracle compares
    * byte-identical values.
    */
  def withEventTime(df: DataFrame): DataFrame = df.withColumn(
    "event_time", from_unixtime(col("timestamp").cast("long")))

  /** The full consumer plan fragment, batch- and stream-compatible. */
  val consumerPipeline: DataFrame => DataFrame =
    (castValueAsString _)
      .andThen(parseJson)
      .andThen(flatten)
      .andThen(hourlyAgg)
      .andThen(rejectNulls)
      .andThen(withEventTime)

  // ---------------------------------------------------------------------
  // Oracle-checkable batch twins over the `events` fixture. The events
  // table stands in for the weather topic (FIXTURES.md §2): ts -> message
  // timestamp, value -> total_precipitation, user_id -> a synthetic
  // location grid.
  // ---------------------------------------------------------------------

  /** Synthesize reference-shaped Kafka message values
    * (weather_stream.py:131-138) from the events table: JSON with a
    * *numeric* timestamp token that the consumer schema coerces to string.
    */
  def kafkaShapedMessages(events: DataFrame): DataFrame = {
    val spreadEvents = TextOps.spread(events)
    spreadEvents.select(
    to_json(struct(
      // schema-dispatched epoch seconds (fixture has shipped as both
      // nanos-as-Long and timestamp[us]); integer arithmetic only
      Tables.eventSeconds(spreadEvents).as("timestamp"),
      col("value").as("total_precipitation"),
      struct(
        (col("user_id") % 90).cast("double").as("lat"),
        (col("user_id") % 180).cast("double").as("lon")).as("location")
    )).as("value"))
  }

  /** Full P1->P2->P3->A2->P4->P8 chain over synthesized messages —
    * the flagship parity query.
    */
  def weatherPipeline(spark: SparkSession, dir: String): DataFrame = {
    val msgs = kafkaShapedMessages(Tables.events(spark, dir))
    consumerPipeline(msgs)
      .withColumn("hourly_precipitation", round(col("hourly_precipitation"), 5))
      .orderBy(col("timestamp"), col("lat"), col("lon"))
  }

  val weatherPipelineOracle: String =
    """WITH msgs AS (
      |  SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS BIGINT) AS ets,
      |         CAST(user_id % 90 AS DOUBLE) AS lat,
      |         CAST(user_id % 180 AS DOUBLE) AS lon,
      |         value AS total_precipitation
      |  FROM events)
      |SELECT CAST(ets AS VARCHAR) AS timestamp, lat, lon,
      |       round(SUM(total_precipitation), 5) AS hourly_precipitation,
      |       strftime(make_timestamp(ets * 1000000), '%Y-%m-%d %H:%M:%S') AS event_time
      |FROM msgs
      |GROUP BY ets, lat, lon
      |ORDER BY timestamp, lat, lon""".stripMargin

  /** Producer-side fold (A1/P5/P6/P7, weather_stream.py:124-138): per
    * "location" (user), sort observations into a minutely-like array, sum
    * with `aggregate` (the array fold mirrors the reference's Python
    * generator sum), timestamp = first entry's dt, round to 5 decimals.
    * `sort_array` makes the double-sum order deterministic so the oracle
    * hash-matches.
    */
  def minutelySum(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        Tables.eventMicros(ev).as("dt"),
        col("value").as("precipitation")))).as("minutely"))
      .select(
        col("user_id"),
        element_at(col("minutely"), 1).getField("dt").as("first_dt"),
        round(aggregate(col("minutely"), lit(0.0d),
          (acc, m) => acc + coalesce(m.getField("precipitation"), lit(0.0d))), 5)
          .as("total_precipitation"),
        size(col("minutely")).cast("long").as("n_minutes"))
      .orderBy(col("user_id"))
  }

  val minutelySumOracle: String =
    """SELECT user_id,
      |       MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_dt,
      |       round(SUM(value), 5) AS total_precipitation,
      |       CAST(COUNT(*) AS BIGINT) AS n_minutes
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** P9 — JSON serialization round-trip (to_json . from_json = id on the
    * message schema): serialize, re-parse, flatten, and verify fields
    * survive. Exercised as a query so the oracle checks the projection.
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val msgs = kafkaShapedMessages(Tables.events(spark, dir))
    flatten(parseJson(castValueAsString(msgs)))
      .groupBy(col("lat"), col("lon"))
      .agg(count(lit(1)).as("n_msgs"),
        round(sum(col("total_precipitation")), 5).as("sum_precip"),
        min(col("timestamp")).as("min_ts"),
        max(col("timestamp")).as("max_ts"))
      .orderBy(col("lat"), col("lon"))
  }

  val jsonRoundtripOracle: String =
    """SELECT CAST(user_id % 90 AS DOUBLE) AS lat,
      |       CAST(user_id % 180 AS DOUBLE) AS lon,
      |       CAST(COUNT(*) AS BIGINT) AS n_msgs,
      |       round(SUM(value), 5) AS sum_precip,
      |       MIN(CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS VARCHAR)) AS min_ts,
      |       MAX(CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS VARCHAR)) AS max_ts
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // S1 end to end: the one reference PIPELINE (poll -> stage -> producer
  // math -> Kafka-shaped message -> consumer agg) as a single
  // oracle-checked query.
  // ---------------------------------------------------------------------

  /** Reference-style configured location list (weather_stream.py polls a
    * fixed set from config — locations are configuration, not data).
    */
  private val PollLocations: Seq[(Double, Double)] =
    (0L until 5L).map(r => (r.toDouble, 2.0 * r))
  private val PollCycles = 3
  private val PollBaseDt = 1700000000L

  /** Deterministic One Call 3.0 payload for location (lat, lon) at poll
    * cycle c — the "HTTP response" of the fake fetch. 61 minutely
    * entries (the real API's shape), dt stepping 60 s, precipitation a
    * closed-form integer-mod series both engines can recompute exactly.
    */
  private def oneCallPayload(lat: Double, lon: Double, c: Int): String = {
    val r = lat.toLong
    val entries = (0 until 61).map { k =>
      val dt = PollBaseDt + c * 3600L + k * 60L
      val precip = ((r * 31 + c * 7 + k) % 100) / 10.0
      s"""{"dt":$dt,"precipitation":$precip}"""
    }
    s"""{"lat":$lat,"lon":$lon,"minutely":[${entries.mkString(",")}]}"""
  }

  private val polledPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The whole S1 pipeline, oracle-driven end to end: a real
    * [[graft.streaming.PollingSource]] stages [[PollCycles]] poll rounds
    * of synthesized One Call JSON (tmp-then-atomic-rename files, with a
    * poller RESTART between the last two rounds so the resume-after-max
    * sequence naming is on the checked path), then ONE Spark plan reads
    * the staged files and runs producer math (A1/P5-P7/P9) into the
    * consumer chain (P1-P4/A2/P8). The DuckDB oracle recomputes every
    * payload from the same closed-form series without ever seeing the
    * staged files — a dropped poll file, a reused sequence name, or any
    * producer/consumer math drift changes the result.
    *
    * The poller is a driver-side singleton by design (the reference's
    * design point is a hardcoded location list polled every 60 s); the
    * staged-file scan and everything downstream is partition-parallel.
    */
  def weatherE2ePoll(spark: SparkSession, dir: String): DataFrame = {
    val key = DedupOps.stageKey(spark, "e2e-poll", dir, "events")
    var staging = polledPaths.get(key)
    if (staging == null) {
      polledPaths.synchronized {
        staging = polledPaths.get(key)
        if (staging == null) {
          val p = java.nio.file.Files.createTempDirectory("graft-e2e-poll-")
            .toString
          val cycle = new java.util.concurrent.atomic.AtomicInteger(0)
          def fetch(lat: Double, lon: Double): Option[String] =
            Some(oneCallPayload(lat, lon, cycle.get()))
          val poller = new graft.streaming.PollingSource(
            p, PollLocations, fetch, intervalMs = Long.MaxValue)
          (0 until PollCycles - 1).foreach { c =>
            cycle.set(c); poller.pollOnce()
          }
          poller.stop()
          // restart: a fresh poller must resume numbering past the
          // staged max, never clobber an existing poll file
          val resumed = new graft.streaming.PollingSource(
            p, PollLocations, fetch, intervalMs = Long.MaxValue)
          cycle.set(PollCycles - 1)
          resumed.pollOnce()
          resumed.stop()
          polledPaths.put(key, p)
          staging = p
        }
      }
    }
    val staged = spark.read
      .schema(graft.streaming.PollingSource.oneCallSchema).json(staging)
    val out =
      consumerPipeline(graft.streaming.PollingSource.producerMessages(staged))
        .withColumn("hourly_precipitation", round(col("hourly_precipitation"), 5))
        .orderBy(col("timestamp"), col("lat"), col("lon"))
    // plan-tripwire coverage (VERDICT r14 #4): there is no streaming
    // query here — the poller stages files and ONE batch plan consumes
    // them — so fingerprint that consumer plan through the STREAMING
    // normalizer (the scan location is a run-scoped temp dir, which it
    // scrubs; the initial plan is otherwise deterministic). Best-effort
    // like every telemetry hook: a fingerprint failure never fails the
    // query.
    try graft.streaming.DriveTelemetry.recordPlan("weather_e2e_poll",
      graft.tools.PlanFingerprint.fingerprintStreaming(
        out.queryExecution.executedPlan))
    catch { case e: Exception =>
      System.err.println(s"[drive] weather_e2e_poll plan fp failed: ${e.getMessage}") }
    out
  }

  val weatherE2ePollOracle: String =
    s"""WITH locs AS (SELECT unnest(range(0, 5)) AS r),
       |cycles AS (SELECT unnest(range(0, $PollCycles)) AS c),
       |mins AS (SELECT unnest(range(0, 61)) AS k),
       |grid AS (
       |  SELECT l.r, cy.c, m.k,
       |         CAST(((l.r*31 + cy.c*7 + m.k) % 100) AS DOUBLE)/10.0 AS precip
       |  FROM locs l, cycles cy, mins m),
       |msgs AS (
       |  SELECT CAST($PollBaseDt + c*3600 AS VARCHAR) AS timestamp,
       |         CAST(r AS DOUBLE) AS lat, CAST(2*r AS DOUBLE) AS lon,
       |         round(SUM(precip), 5) AS total_precipitation
       |  FROM grid GROUP BY r, c)
       |SELECT timestamp, lat, lon,
       |       round(SUM(total_precipitation), 5) AS hourly_precipitation,
       |       strftime(make_timestamp(CAST(timestamp AS BIGINT) * 1000000),
       |                '%Y-%m-%d %H:%M:%S') AS event_time
       |FROM msgs
       |GROUP BY timestamp, lat, lon
       |ORDER BY timestamp, lat, lon""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "weather_pipeline" -> (weatherPipeline _),
    "weather_minutely_sum" -> (minutelySum _),
    "weather_json_roundtrip" -> (jsonRoundtrip _),
    "weather_e2e_poll" -> (weatherE2ePoll _))

  def oracles: Map[String, String] = Map(
    "weather_pipeline" -> weatherPipelineOracle,
    "weather_minutely_sum" -> minutelySumOracle,
    "weather_json_roundtrip" -> jsonRoundtripOracle,
    "weather_e2e_poll" -> weatherE2ePollOracle)
}
