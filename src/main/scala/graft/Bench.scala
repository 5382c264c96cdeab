package graft
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

object Bench {

  private case class Detail(queries: Map[String, Double],
      batchCounts: Map[String, Long], sf: String)

  /** Parse a bench detail JSON with a real JSON reader (json4s ships on
    * the Spark classpath) — the r8/r9 regex scrape silently dropped
    * entries and could never hold nested maps. `batch_counts` is absent
    * in baselines predating the streaming channel — empty map, and
    * BenchFlags falls back to raw times for those drives.
    */
  private def parseDetail(txt: String): Detail = {
    def num(v: JValue): Option[Double] = v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JLong(l) => Some(l.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
    val j = JsonMethods.parse(txt)
    def numMap(field: String): Map[String, Double] = j \ field match {
      case JObject(fs) => fs.flatMap { case (k, v) => num(v).map(k -> _) }.toMap
      case _ => Map.empty[String, Double]
    }
    val sf = j \ "sf" match { case JString(s) => s; case _ => "" }
    Detail(numMap("queries"),
      numMap("batch_counts").map { case (k, v) => k -> v.toLong }, sf)
  }

  /** The regression baseline, by preference order (the chosen source is
    * recorded in the detail output as `baseline_source`, so a noisy
    * comparison is attributable):
    *
    *  1. `HEAD:bench_baseline.json` — a DEDICATED committed baseline
    *     file, refreshed deliberately at round close. Structural: no
    *     dependence on commit-subject conventions or log depth (the r10
    *     subject-substring search silently fell back to the working file
    *     once the round commit aged past its 40-commit window).
    *  2. The committed bench_detail.json at the most recent round commit
    *     (legacy subject search), if the baseline file predates a round.
    *  3. The working detail file — last resort only; any local dev run
    *     overwrites it (the r8/r9 cried-wolf source).
    */
  private def baselineText(repoDir: String,
      workingFile: String): Option[(String, String)] = {
    def git(args: String*): Option[String] = try {
      val p = new ProcessBuilder(
        (Seq("git", "-C", repoDir) ++ args): _*).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Exception => None }
    val fromBaselineFile = git("show", "HEAD:bench_baseline.json")
      .map(_ -> "HEAD:bench_baseline.json")
    def fromRound = (for {
      log <- git("log", "-n", "40", "--format=%H%x09%s", "--",
        "bench_detail.json")
      hit <- log.linesIterator.map(_.split('\t')).collectFirst {
        case Array(h, s) if s.contains("verdict/advice/correctness/bench") => h
      }
      txt <- git("show", s"$hit:bench_detail.json")
    } yield txt).map(_ -> "round-commit bench_detail.json")
    def fromWorking = (try {
      Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(workingFile)),
        java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Exception => None }).map(_ -> "working bench_detail.json")
    fromBaselineFile.orElse(fromRound).orElse(fromWorking)
  }

  /** The committed plan-fingerprint baseline (`HEAD:plan_manifest.json`,
    * written by graft.tools.PlanManifest at round close). Returns the
    * per-query fingerprints and the sf it was recorded at — a manifest
    * from another scale factor is not comparable (AQE replans on stats).
    */
  private def planBaseline(repoDir: String): Option[(Map[String, String], String)] =
    try {
      val p = new ProcessBuilder("git", "-C", repoDir, "show",
        "HEAD:plan_manifest.json").start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      if (p.waitFor() != 0) None else {
        val j = JsonMethods.parse(out)
        val sf = j \ "sf" match { case JString(s) => s; case _ => "" }
        val plans = j \ "plans" match {
          case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
          case _ => Map.empty[String, String]
        }
        Some(plans -> sf)
      }
    } catch { case _: Exception => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query shuffle-bytes-written meter: task metrics summed by a
    // listener, read as a settled delta around each query. Shuffle bytes
    // are (near-)deterministic for a fixed plan, so a >1.2x move is a
    // PLAN regression even when wall time hides inside host noise.
    val shuffleAcc = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleAcc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    // listener events post asynchronously; wait (outside the timed span)
    // until the counter is quiet so the delta attributes to the right
    // query. The public API offers no deterministic bus drain
    // (listenerBus.waitUntilEmpty is private[spark]), so this polls —
    // with a 2 s budget (the old 400 ms could be exhausted on a loaded
    // host, bleeding one query's tail events into the next delta) and an
    // exhaustion counter emitted in the detail output, so a noisy
    // shuffle comparison is identifiable instead of silent.
    val settleTimeouts = new java.util.concurrent.atomic.AtomicLong
    def settledShuffle(): Long = {
      var prev = shuffleAcc.get(); var stable = 0; var waited = 0
      while (stable < 3 && waited < 2000) {
        Thread.sleep(5); waited += 5
        val cur = shuffleAcc.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      // a timeout is only the UNSETTLED exit — reaching stable == 3 on
      // the final poll as waited hits the budget is a clean settle, and
      // counting it would overstate the exhaustion telemetry
      if (stable < 3) settleTimeouts.incrementAndGet()
      prev
    }
    // Warm-up (untimed): prime parquet file indexes/footers and JIT the
    // common codegen paths so the first timed query doesn't absorb
    // session start-up cost.
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
      SparkEntry.queries.get("q_broadcast_join")
        .foreach(fn => fn(spark, sfDir).count())
      SparkEntry.queries.get("q_window_rank")
        .foreach(fn => fn(spark, sfDir).count())
    } catch { case _: Throwable => () }
    // Fixed calibration probe (VERDICT r13 #2): a scale-INDEPENDENT ~1 s
    // workload — a CPU-bound codegen aggregate over spark.range plus a
    // fixed-5-row parquet scan (region has 5 rows at every SF, so its
    // cost is session/footer overhead, not data). Emitted as calib_sec;
    // tools/scaling_report.py divides cross-SF growth by the two files'
    // calib ratio, and cross-round/cross-host totals compare through it
    // (README "Comparing bench rounds"). min-of-3 after a JIT warm run,
    // matching the query timings' de-noising.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 60000000L, 1L, 8)
        .selectExpr("sum(id * 3 + (id % 7)) AS s").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      (System.nanoTime() - t0) / 1e9
    }
    val calibSec = try { calibOnce(); Seq.fill(3)(calibOnce()).min }
      catch { case _: Throwable => -1.0 }
    // Two passes, report the per-query minimum: this VM shows heavy
    // run-to-run noise (host CPU steal / IO stalls), and min-of-2 is the
    // standard de-noised steady-state estimate.
    // pass 2 additionally fingerprints each batch query's INITIAL plan
    // (outside the timed span, execution-free — final-AQE plans proved
    // run-varying near the broadcast threshold; see
    // PlanFingerprint.fingerprint's doc) — the same thing
    // tools.PlanManifest records. Streaming drives fingerprint through
    // DriveTelemetry instead (their result frames read run-scoped sink
    // dirs).
    val planFps = scala.collection.mutable.Map.empty[String, String]
    val batchCounts = scala.collection.mutable.Map.empty[String, Long]
    def onePass(fingerprint: Boolean = false): Map[String, (Double, Long)] =
      SparkEntry.queries.map { case (name, fn) =>
        // drop caches left by the previous query so timings are independent
        spark.catalog.clearCache()
        val isStream = SparkEntry.streamingQueries.contains(name)
        // streaming telemetry is keyed by driveWaves' own drive names
        // (sfz_srol_42503), not SparkEntry names — attribute by the log
        // WINDOW around this query's invocation (drives run inside fn)
        val planMark = graft.streaming.DriveTelemetry.planLogSize
        val batchMark = graft.streaming.DriveTelemetry.batchLogSize
        val sBefore = settledShuffle()
        val t0 = System.nanoTime()
        // a broken query must surface as -1, never as a plausible timing
        // — and Spark analyzes EAGERLY at DataFrame construction, so the
        // build sits inside the try with the action (ADVICE r13 #1: an
        // AnalysisException at build time must not crash the whole run)
        val dfOpt = try {
          val df = fn(spark, sfDir); df.count(); Some(df)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); None }
        val sec = if (dfOpt.isDefined) (System.nanoTime() - t0) / 1e9 else -1.0
        // shuffle delta snapshots immediately after the timed action so
        // the meter attributes cleanly to this query (fingerprinting
        // below is execution-free since the initial-plan pin, so nothing
        // after this point runs tasks for a batch query)
        val sDelta = math.max(0L, settledShuffle() - sBefore)
        if (isStream && dfOpt.isDefined) {
          val b = graft.streaming.DriveTelemetry.batchesSince(batchMark)
          if (b > 0) batchCounts(name) = b
          graft.streaming.DriveTelemetry.combinedFp(
            graft.streaming.DriveTelemetry.planLogSince(planMark).map(_._2))
            .foreach(planFps(name) = _)
        }
        if (fingerprint && !isStream)
          dfOpt.foreach { df =>
            // INITIAL-plan fingerprint by design — final-AQE plans
            // proved run-varying (see PlanFingerprint.fingerprint doc)
            try planFps(name) = graft.tools.PlanFingerprint.fingerprint(df)
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name fingerprint failed: ${e.getMessage}")
            }
          }
        name -> (sec, sDelta)
      }
    // The per-query map outgrew what log capture reliably holds (r5's
    // record kept 78/181 entries), so the FULL record goes to a file —
    // bench_detail.json next to the working dir, overridable — and the
    // stdout line stays a compact summary that can never be cut mid-map.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "/root/repo/bench_detail.json")
    val repoDir = Option(java.nio.file.Paths.get(detailPath).getParent)
      .map(_.toString).getOrElse("/root/repo")
    // Baseline guard on the recorded sf: comparing an sf0.1 round against
    // a leftover sf0.01 dev run would flag every query as a fake 10x
    // regression.
    val (prevDetail, baselineSource) =
      baselineText(repoDir, detailPath) match {
        case Some((txt, src)) => parseDetail(txt) match {
          case d if d.sf == sfDir => (d, src)
          case d =>
            (Detail(Map.empty, Map.empty, ""), s"$src (sf mismatch: ${d.sf})")
        }
        case None => (Detail(Map.empty, Map.empty, ""), "none")
      }
    val prevQueries = prevDetail.queries

    val p1 = onePass(); val p2 = onePass(fingerprint = true)
    // time: min of the passes (de-noised); shuffle bytes: max (a pass
    // whose listener missed a tail event can only under-count)
    val results = p1.map { case (k, (v, _)) => k -> math.min(v, p2(k)._1) }
    val shuffles = p1.map { case (k, (_, b)) => k -> math.max(b, p2(k)._2) }
    // locale-safe rounding: no String.format, whose decimal separator varies
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${r3(v)}""" }
      .mkString("{", ",", "}")
    val sbJson = shuffles.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    // per-drive peak state-store rows (DriveTelemetry, recorded by
    // driveWaves) — the bounded-state claim as a number; last pass wins
    val peaksJson = graft.streaming.DriveTelemetry.peaks.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    // the authoritative streaming-drive name list, for downstream
    // classifiers (tools/scaling_report.py) — name-substring guessing
    // misfiled the fuzz drives
    val streamNames = SparkEntry.streamingQueries.toSeq.sorted
      .map(n => s""""$n"""").mkString("[", ",", "]")
    // Failure-honest headline: -1.0 sentinels are EXCLUDED from the sum
    // (summing them made r6's 26-failure run look faster than r5) and
    // surfaced as n_failed — a broken query can only make the report
    // worse, never better.
    val failed = results.count(_._2 < 0)
    val total = results.values.filter(_ >= 0).sum
    // Round-over-round comparability: the oracle-driven streaming drives
    // are wall-clock dominated by micro-batch/trigger machinery, so
    // adding one reads as a fake batch regression. Split the headline.
    val isStream = (k: String) => SparkEntry.streamingQueries.contains(k)
    val batchSec = results.collect {
      case (k, v) if v >= 0 && !isStream(k) => v }.sum
    val streamSec = results.collect {
      case (k, v) if v >= 0 && isStream(k) => v }.sum
    // Self-reported regressions vs the last ROUND's committed detail:
    // two channels (TIME host-calibrated per query class, PLAN
    // fingerprint diff vs the committed manifest), computed by the pure
    // graft.tools.BenchFlags (its Scaladoc carries the full rules;
    // BenchFlagsSpec replays the r12/r13 driver false-flag shapes
    // against it). Streaming drives get their own noise scalar and are
    // normalized by recorded micro-batch count (VERDICT r13 #1).
    val (prevPlans, planBaselineSource) = planBaseline(repoDir) match {
      case Some((plans, sf)) if sf == sfDir =>
        (plans, "HEAD:plan_manifest.json")
      case Some((_, sf)) =>
        (Map.empty[String, String], s"HEAD:plan_manifest.json (sf mismatch: $sf)")
      case None => (Map.empty[String, String], "none")
    }
    val flags = graft.tools.BenchFlags.compute(results, prevQueries,
      SparkEntry.streamingQueries, batchCounts.toMap, prevDetail.batchCounts,
      planFps.toMap, prevPlans)
    // each time flag names its plan status: a "plan":"same" flag on a
    // loaded host is noise by construction (same plan + same data), so
    // the reader can triage without re-running anything
    val timeRegs = flags.timeFlags.map { f =>
      s""""${f.name}":{"prev":${r3(f.prev)},"now":${r3(f.now)},"plan":"${f.planNote}"}"""
    }
    val planRegs = flags.planFlags.map { f =>
      s""""${f.name}#plan":{"prev":"${f.prev}","now":"${f.now}"}"""
    }
    val regressions = (timeRegs ++ planRegs).mkString("{", ",", "}")
    val fpJson = planFps.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val bcJson = batchCounts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    // raw (uncalibrated) flag counts + noise_alert: a calibration scalar
    // masking a uniform regression must itself be a visible signal
    // (ADVICE r13 #4) — a reader sees scalar >1.3 on a quiet host and
    // investigates instead of trusting zero flags
    val summary = s""""sf":"$sfDir","n_queries":${results.size},"n_failed":$failed,"batch_sec":${r3(batchSec)},"streaming_sec":${r3(streamSec)},"regressions":$regressions,"baseline_source":"$baselineSource","plan_baseline_source":"$planBaselineSource","host_noise_scalar":${r3(flags.batchScalar)},"stream_noise_scalar":${r3(flags.streamScalar)},"raw_time_flags":{"batch":${flags.rawBatchTimeFlags},"streaming":${flags.rawStreamTimeFlags}},"noise_alert":${flags.noiseAlert},"calib_sec":${r3(calibSec)},"shuffle_settle_timeouts":${settleTimeouts.get()},"total_sec":${r3(total)}"""
    val detail = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"shuffle_bytes":$sbJson,"plan_fp":$fpJson,"state_peaks":$peaksJson,"batch_counts":$bcJson,"streaming_queries":$streamNames,$summary}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    // stderr carries the per-query map too, as a second capture channel
    System.err.println(s"[bench-detail] $detail")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec",$summary,"detail":"$detailPath"}""")
    spark.stop()
  }
}
