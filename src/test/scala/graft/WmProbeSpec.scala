package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's exact late-row boundary semantics for (a) streaming
  * windowed aggregation and (b) transformWithState, with boundary-exact
  * rows driven through tiny file-source wave streams. The streaming-fuzz
  * oracles ([[graft.fuzz.StreamFuzz]]) encode exactly these rules — if a
  * Spark upgrade changes any of them, THIS suite names the rule that
  * moved before the fuzz seeds go red en masse.
  *
  * Pinned rules (Spark 4.1, SPARK-40925 two-watermark policy):
  *  1. Late filtering in batch N uses the PREVIOUS batch's watermark
  *     L(N) = E(N-1); eviction/timers use the current E(N).
  *  2. Windowed aggregation drops a (row, window) pair iff
  *     window_end <= L — a row below the watermark still counts into a
  *     window straddling it.
  *  3. transformWithState drops a row iff eventTime <= L (inclusive).
  *  4. Within a batch, input rows are processed before event-time
  *     timers fire.
  */
class WmProbeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def drive(rows: Seq[(String, Long, Long)], name: String,
      nWaves: Long, rocks: Boolean = false)(
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(s"wmprobe_$name").toString
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val prev = Seq("spark.sql.shuffle.partitions",
      "spark.sql.streaming.noDataMicroBatches.enabled",
      "spark.sql.streaming.stateStore.providerClass")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    if (rocks) spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val df = rows.toDF("etype", "ms", "wave")
      df.repartition(1).write.partitionBy("wave").parquet(s"$root/stage")
      val src = spark.readStream.schema("etype STRING, ms LONG")
        .parquet(srcDir)
      val q = transform(src).writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation", s"$root/ckpt").start()
      try {
        (0L until nWaves).foreach { w =>
          val wd = new java.io.File(s"$root/stage/wave=$w")
          Option(wd.listFiles).getOrElse(Array.empty[java.io.File])
            .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
              case (f, k) => java.nio.file.Files.move(f.toPath,
                java.nio.file.Paths.get(s"$srcDir/w${w}_$k.parquet"))
            }
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).collect().toSeq
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("windowed agg: late filter lags one batch and is window-end based") {
    // delay 0; wave2's late wm = watermark DURING wave1 = 20000 (wave0's
    // max), NOT 30000 (wave1's max) — rule 1. Of wave2's rows:
    //   x t=19999 win [19000,20000): end 20000 <= 20000 -> DROPPED
    //   w t=18999 win [18000,19000): end below           -> DROPPED
    //   y t=20000 win [20000,21000): end 21000 > 20000   -> KEPT even
    //     though its own t == wm (rule 2: window-based, not row-based)
    //   z t=20001 same window                            -> KEPT
    val rows = Seq(
      ("adv", 20000L, 0L), ("adv2", 30000L, 1L),
      ("x", 19999L, 2L), ("y", 20000L, 2L), ("z", 20001L, 2L),
      ("w", 18999L, 2L),
      ("s1", 60000L, 3L), ("s2", 90000L, 4L))
    val out = drive(rows, "probe_agg", 5) { src =>
      src.select(col("etype"), timestamp_millis(col("ms")).as("t"))
        .withWatermark("t", "0 seconds")
        .groupBy(window(col("t"), "1 second"), col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(col("etype"), unix_millis(col("window.start")).as("ws"),
          col("n"))
    }
    val emitted = out.map(_.getString(0)).toSet
    assert(emitted == Set("adv", "adv2", "y", "z"),
      s"late-filter rule moved: emitted $emitted")
  }

  test("transformWithState: late filter lags one batch, row-based, " +
      "inclusive boundary") {
    // wave2's late wm = 20000: key1 t=19999 dropped, key2 t=20000
    // dropped (INCLUSIVE boundary), key3 t=20001 kept — rule 3.
    val rows = Seq(
      ("100", 20000L, 0L), ("101", 30000L, 1L),
      ("1", 19999L, 2L), ("2", 20000L, 2L), ("3", 20001L, 2L),
      ("-1", 60000L, 3L), ("-2", 90000L, 4L))
    val out = drive(rows, "probe_tws", 5, rocks = true) { src =>
      import spark.implicits._
      graft.streaming.TwsQuotaJob.quota(
        src.select(col("etype").cast("long").as("key"),
          timestamp_millis(col("ms")).as("eventTs"),
          lit(0.0).as("value")).as[graft.streaming.KeyedEvent],
        bucketMs = 1000L, cap = 10L, delay = "0 seconds").toDF()
    }
    val keys = out.map(_.getLong(0)).toSet
    assert(keys == Set(3L, 100L, 101L),
      s"tws late-filter rule moved: reported keys $keys")
  }

  test("streaming dropDuplicates (event-time in key): late filter lags " +
      "one batch, row-based, inclusive; exactly-once across batches and " +
      "at the eviction boundary") {
    // wave2's late wm = E(1) = 20000 (wave0's max). Of wave2's rows:
    //   x t=19999 -> DROPPED (late);  y t=20000 -> DROPPED (INCLUSIVE
    //   boundary, row-based — unlike windowed agg, which would keep a
    //   boundary row whose window straddles the wm)
    //   z t=20001 -> KEPT
    //   d t=25000 -> duplicate of wave1's d: suppressed by dedup state
    //   e t=20000 -> its wave0 twin's state was evicted when E reached
    //     20000, but the late filter (t <= L, same bound) rejects the
    //     retry first — the inclusive row filter is exactly what makes
    //     re-emission after eviction impossible, so the finalized output
    //     is a pure function of the kept rows (Family E's oracle shape)
    val rows = Seq(
      ("adv", 20000L, 0L), ("e", 20000L, 0L),
      ("adv2", 30000L, 1L), ("d", 25000L, 1L),
      ("x", 19999L, 2L), ("y", 20000L, 2L), ("z", 20001L, 2L),
      ("d", 25000L, 2L), ("e", 20000L, 2L),
      ("s1", 60000L, 3L), ("s2", 90000L, 4L))
    val out = drive(rows, "probe_dedup", 5) { src =>
      src.select(col("etype"), timestamp_millis(col("ms")).as("t"))
        .withWatermark("t", "0 seconds")
        .dropDuplicates("etype", "t")
        .select(col("etype"), unix_millis(col("t")).as("ms"))
    }
    val counts = out.groupBy(_.getString(0))
      .map { case (k, v) => k -> v.size }
    assert(counts == Map("adv" -> 1, "e" -> 1, "adv2" -> 1, "d" -> 1,
        "z" -> 1, "s1" -> 1, "s2" -> 1),
      s"dedup late-filter rule moved: $counts")
  }

  test("dropDuplicatesWithinWatermark: TTL state (expiry = first-seen " +
      "event time + delay, never refreshed by duplicates), re-emission " +
      "iff L(w) >= expiry (inclusive eviction), inclusive late drop") {
    // delay 10s. Wave maxes: 21000, 40000, ..., so L(2) = 21000-10000 =
    // 11000 and L(3) = 40000-10000 = 30000 (late wm lags one batch,
    // rule 1). Functional re-emission rule under test: a retry in batch
    // w emits iff the state stored at its last emission (expiry =
    // that emission's event time + delay) has been evicted by the end
    // of batch w-1 — and eviction is INCLUSIVE (batch n removes
    // expiry <= E(n)), so the functional rule is L(w) >= expiry
    // (E(w-1) = L(w)). Both probe discoveries below are encoded in the
    // Family F oracle verbatim.
    //   k0 t=0 at wave0: the inclusive late filter applies against the
    //      INITIAL watermark 0 too (t <= 0 dropped in batch 0, leaving
    //      no state) — a first-probe discovery; re-emits fresh at wave3
    //   k1 exp 20000: wave2 L=11000 -> suppressed; wave3 L=30000 -> emit
    //   k2 exp 11000: wave2 L=11000 -> BOUNDARY: evicted at end of
    //      batch 1 (11000 <= E(1)=11000, inclusive) -> RE-EMITS at
    //      wave2 (new exp 36000), then wave3 L=30000 < 36000 ->
    //      suppressed. A strict eviction would instead give
    //      {1000, 46000} — the probe's first run showed {1000, 26000},
    //      pinning inclusive.
    //   k4 exp 11000, duplicate at wave1 t=25000: the dup is processed
    //      BEFORE batch 1's end-of-batch eviction sweep (state still
    //      present -> suppressed, pinning eviction-after-processing),
    //      and does NOT refresh the expiry -> evicted end of batch 1,
    //      wave3 re-emits (a refresh to 35000 would suppress)
    //   x 10999 / y 11000 at wave2: late, t <= L inclusive -> dropped,
    //      and a dropped-late row leaves NO state -> both re-emit fresh
    //      at wave3; z 11001 kept
    val rows = Seq(
      ("adv", 21000L, 0L), ("k0", 0L, 0L), ("k1", 10000L, 0L),
      ("k2", 1000L, 0L), ("k4", 1000L, 0L),
      ("adv2", 40000L, 1L), ("k4", 25000L, 1L),
      ("k1", 26000L, 2L), ("k2", 26000L, 2L),
      ("x", 10999L, 2L), ("y", 11000L, 2L), ("z", 11001L, 2L),
      ("k1", 46000L, 3L), ("k2", 46000L, 3L), ("k4", 50000L, 3L),
      ("x", 50001L, 3L), ("y", 50002L, 3L), ("k0", 50003L, 3L),
      ("s1", 90000L, 4L), ("s2", 120000L, 5L))
    val out = drive(rows, "probe_dedup_wm", 6) { src =>
      src.select(col("etype"), timestamp_millis(col("ms")).as("t"))
        .withWatermark("t", "10 seconds")
        .dropDuplicatesWithinWatermark("etype")
        .select(col("etype"), unix_millis(col("t")).as("ms"))
    }
    val got = out.groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val want = Map(
      "adv" -> Set(21000L), "adv2" -> Set(40000L),
      "k0" -> Set(50003L),
      "k1" -> Set(10000L, 46000L), "k2" -> Set(1000L, 26000L),
      "k4" -> Set(1000L, 50000L),
      "x" -> Set(50001L), "y" -> Set(50002L), "z" -> Set(11001L),
      "s1" -> Set(90000L), "s2" -> Set(120000L))
    assert(got == want, s"dedup-within-wm rule moved: $got")
  }

  test("session-window agg: late filter lags one batch; boundary and " +
      "cross-batch merge semantics") {
    // delay 15000ms; wave2's late wm = E(wave1) = 20000 - 15000 = 5000.
    // gap 1000. Rows in wave2:
    //   c1 t=3999  end 4999 <= 5000 -> dropped under end-based rule
    //   c2 t=4000  end 5000 == lwm  -> boundary discriminator
    //   c3 t=4500  end 5500 > 5000 but t < lwm -> kept iff window-based
    //   m  t=10500 merges with wave0's m t=10000 (within gap) iff kept
    //     state merging works across batches
    val rows = Seq(
      ("adv", 20000L, 0L), ("m", 10000L, 0L),
      // gap-boundary pins: q's rows sit exactly gap apart (MERGE — the
      // boundary is inclusive), p's one ms further (split)
      ("q", 6000L, 0L), ("q", 7000L, 0L),
      ("p", 8000L, 0L), ("p", 9001L, 0L),
      ("adv2", 40000L, 1L),
      ("c1", 3999L, 2L), ("c2", 4000L, 2L), ("c3", 4500L, 2L),
      ("m", 10500L, 2L),
      ("s1", 90000L, 3L), ("s2", 140000L, 4L))
    val out = drive(rows, "probe_sess", 5) { src =>
      src.select(col("etype"), timestamp_millis(col("ms")).as("t"))
        .withWatermark("t", "15 seconds")
        .groupBy(session_window(col("t"), "1 second"), col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(col("etype"),
          unix_millis(col("session_window.start")).as("ss"),
          unix_millis(col("session_window.end")).as("se"), col("n"))
    }
    val byKey = out.groupBy(_.getString(0))
    // pinned: c1 (end < lwm) and c2 (end == lwm) dropped — the filter is
    // per-row-session END based and INCLUSIVE; c3 kept even though its
    // own t < lwm (window-based, like the sliding-window agg)
    val emitted = out.map(_.getString(0)).toSet
    assert(emitted == Set("adv", "adv2", "c3", "m", "q", "p"),
      s"session late-filter rule moved: emitted $emitted")
    // gap boundary: exactly-gap-apart rows MERGE (the merge test is
    // diff <= gap, INCLUSIVE — pinned empirically); gap+1 splits
    assert(byKey("q").length == 1 && byKey("q").head.getLong(3) == 2L,
      s"exact-gap merge rule moved: ${byKey("q")}")
    assert(byKey("p").length == 2, s"gap+1 split rule moved: ${byKey("p")}")
    // merge must produce ONE session for m covering both rows
    val m = byKey.getOrElse("m", Seq.empty)
    assert(m.length == 1 && m.head.getLong(3) == 2L &&
      m.head.getLong(1) == 10000L && m.head.getLong(2) == 11500L,
      s"cross-batch session merge moved: $m")
  }

  test("session-window agg: eviction boundary and post-emission re-open") {
    // delay 0, gap 1000. A's session [1000,2000) pends until E reaches
    // 2000 (wave2's batch, E = max-through-wave1 = 2000): emitted there
    // iff the eviction test is end <= E (inclusive). Wave3 then delivers
    // A t=1500 — kept (ms+gap=2500 > L(3)=2000) and BELOW the emitted
    // end: if A emitted at wave2, output is TWO overlapping sessions;
    // if eviction were strict (<), they'd merge into one.
    val rows = Seq(
      ("A", 1000L, 0L),
      ("B", 2000L, 1L),
      ("B2", 50000L, 2L),
      ("A", 1500L, 3L),
      ("s1", 90000L, 4L), ("s2", 130000L, 5L))
    val out = drive(rows, "probe_sess_evict", 6) { src =>
      src.select(col("etype"), timestamp_millis(col("ms")).as("t"))
        .withWatermark("t", "0 seconds")
        .groupBy(session_window(col("t"), "1 second"), col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(col("etype"),
          unix_millis(col("session_window.start")).as("ss"),
          unix_millis(col("session_window.end")).as("se"), col("n"))
    }
    val a = out.filter(_.getString(0) == "A")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    info(s"EVICT OUT: $a")
    assert(a == Seq((1000L, 2000L, 1L), (1500L, 2500L, 1L)),
      s"session eviction boundary moved (expected inclusive end<=E, " +
        s"overlapping outputs): $a")
  }

  test("interval join -> dedup composition: duplicate pairs across " +
      "batches dedup exactly once through join state (family U's " +
      "load-bearing rule)") {
    // delay 15000, window 1000, dedup on (user, click_ts). wave0's
    // pair (A, 10500) emits; wave1's vA@10200 is admitted (L = 0) and
    // re-joins the SAME click still in join state — a cross-batch
    // duplicate pair the downstream dedup state must suppress. A second
    // click in the same ms never exists, so one output row per click
    // pins it. The bucketed-key variant collapses two DIFFERENT clicks
    // (10500, 10900) of one bucket (1000) to a single row.
    val rows = Seq(
      ("vA", 10000L, 0L), ("cA", 10500L, 0L), ("cA", 10900L, 0L),
      ("vA", 10200L, 1L),
      ("vZ", 60000L, 2L), ("cZ", 60000L, 2L),
      ("vS", 90000L, 3L), ("cS", 90000L, 3L),
      ("vS2", 140000L, 4L), ("cS2", 140000L, 4L))
    def joined(src: org.apache.spark.sql.DataFrame) = {
      val tagged = src.select(
        substring(col("etype"), 1, 1).as("side"),
        substring(col("etype"), 2, 10).as("user"),
        timestamp_millis(col("ms")).as("t"))
      val views = tagged.filter(col("side") === "v")
        .select(col("user"), col("t").as("view_ts"))
        .withWatermark("view_ts", "15 seconds")
      val clicks = tagged.filter(col("side") === "c")
        .select(col("user").as("cuser"), col("t").as("click_ts"))
        .withWatermark("click_ts", "15 seconds")
      views.join(clicks,
        expr("user = cuser AND click_ts >= view_ts AND " +
          "click_ts <= view_ts + interval 1000 millisecond"), "inner")
    }
    val raw = drive(rows, "probe_jd_raw", 5) { src =>
      joined(src).dropDuplicates("user", "click_ts")
        .select(col("user"), unix_millis(col("click_ts")).as("cms"))
    }
    val rawA = raw.filter(_.getString(0) == "A").map(_.getLong(1)).sorted
    assert(rawA == Seq(10500L, 10900L),
      s"cross-batch duplicate pair not deduped exactly once: $rawA")
    val bucketed = drive(rows, "probe_jd_bkt", 5) { src =>
      joined(src)
        .withColumn("cbt", expr("(unix_millis(click_ts) div 1000) * 1000"))
        .dropDuplicates("user", "cbt")
        .select(col("user"), col("cbt"))
    }
    val bktA = bucketed.filter(_.getString(0) == "A").map(_.getLong(1)).sorted
    assert(bktA == Seq(10000L),
      s"bucketed-key dedup after join moved: $bktA")
  }

  test("dedup -> session_window composition: exactly-once dedup feeds " +
      "the merging session; dedup's ROW filter subsumes session-end " +
      "lateness (family T's load-bearing rules)") {
    // delay 15000, bucket 1000, gap 1000. Rows:
    //   wave0: adv t=40000; k 10000 + 10250 (SAME bucket -> dedup
    //     admits one; the session must count the bucket ONCE)
    //   wave1: k 10500 (bucket 10000 AGAIN, later batch -> dedup state
    //     drops it); k 11000 (next bucket, exactly gap apart -> MERGES);
    //     adv2 60000
    //   wave2: L = E(wave1) = 40000 - 15000 = 25000.
    //     x 25400 -> bucket 25000 <= L: dedup DROPS it even though its
    //       session end 26000 > L would have passed the session's
    //       end-based filter — the composition's row-based gate governs
    //     y 26100 -> bucket 26000 > L: kept (boundary neighbor)
    val rows = Seq(
      ("adv", 40000L, 0L), ("k", 10000L, 0L), ("k", 10250L, 0L),
      ("k", 10500L, 1L), ("k", 11000L, 1L), ("adv2", 60000L, 1L),
      ("x", 25400L, 2L), ("y", 26100L, 2L),
      ("s1", 90000L, 3L), ("s2", 140000L, 4L))
    val out = drive(rows, "probe_dsess", 5) { src =>
      src.select(col("etype"),
          timestamp_millis(expr("(ms div 1000) * 1000")).as("bt"))
        .withWatermark("bt", "15 seconds")
        .dropDuplicates("etype", "bt")
        .groupBy(session_window(col("bt"), "1 second"), col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(col("etype"),
          unix_millis(col("session_window.start")).as("ss"),
          unix_millis(col("session_window.end")).as("se"), col("n"))
    }
    val real = out.filter(r => !r.getString(0).startsWith("s"))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    assert(real == Seq(
      ("adv", 40000L, 41000L, 1L), ("adv2", 60000L, 61000L, 1L),
      ("k", 10000L, 12000L, 2L), ("y", 26000L, 27000L, 1L)),
      s"dedup->session composition rules moved: $real")
  }

  test("stream-stream interval join: per-side late-input drop rules") {
    // One source split into views (etype 'v<user>') and clicks ('c<user>'),
    // inner-joined on user with c.ts in [v.ts, v.ts+1000]. delay 0;
    // wave2's lagged wm L = 20000. Cases (user: v.ts/c.ts):
    //   u1 18999/18999  u2 19000/19999  u3 19500/20000
    //   u4 20000/20500  u5 20001/20900  u6 15000/15500
    // Which pairs emerge pins whether each side drops on its own ts vs
    // a condition-derived state watermark.
    val rows = Seq(
      ("v0", 20000L, 0L), ("c0", 20000L, 0L),
      ("v0", 30000L, 1L), ("c0", 30000L, 1L),
      ("v1", 18999L, 2L), ("c1", 18999L, 2L),
      ("v2", 19000L, 2L), ("c2", 19999L, 2L),
      ("v3", 19500L, 2L), ("c3", 20000L, 2L),
      ("v4", 20000L, 2L), ("c4", 20500L, 2L),
      ("v5", 20001L, 2L), ("c5", 20900L, 2L),
      ("v6", 15000L, 2L), ("c6", 15500L, 2L),
      ("v9", 60000L, 3L), ("c9", 60000L, 3L),
      ("v8", 90000L, 4L), ("c8", 90000L, 4L))
    val out = drive(rows, "probe_join", 5) { src =>
      val tagged = src.select(
        substring(col("etype"), 1, 1).as("side"),
        substring(col("etype"), 2, 10).as("user"),
        timestamp_millis(col("ms")).as("t"))
      val views = tagged.filter(col("side") === "v")
        .select(col("user"), col("t").as("view_ts"))
        .withWatermark("view_ts", "0 seconds")
      val clicks = tagged.filter(col("side") === "c")
        .select(col("user").as("cuser"), col("t").as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      views.join(clicks,
        expr("user = cuser AND click_ts >= view_ts AND " +
          "click_ts <= view_ts + interval 1 second"))
        .select(col("user"), unix_millis(col("view_ts")).as("vms"),
          unix_millis(col("click_ts")).as("cms"))
    }
    // pinned: both sides drop late input on their OWN event time with the
    // lagged watermark, inclusive (ts <= L) — u4's view at ts == L was
    // dropped even though its join horizon extended past L; only u5
    // (both sides strictly above L) paired. Sentinel/advance pairs (0,
    // 9, 8) self-join at equal ts.
    val users = out.map(_.getString(0)).toSet
    assert(users == Set("0", "5", "8", "9"),
      s"join late-input rule moved: $users")
  }

  test("stream-stream join: global watermark is the MIN across sides") {
    // wave0 advances views to 20000 but clicks only to 10000 -> the
    // query's watermark is min = 10000. Wave2's lagged L is therefore
    // 10000: a view at 15000 is kept (paired with click 15200) even
    // though the VIEW-side watermark alone (20000) would drop it.
    val rows = Seq(
      ("v0", 20000L, 0L), ("c0", 10000L, 0L),
      ("v0", 30000L, 1L), ("c0", 30000L, 1L),
      ("v1", 15000L, 2L), ("c1", 15200L, 2L),
      ("v9", 60000L, 3L), ("c9", 60000L, 3L),
      ("v8", 90000L, 4L), ("c8", 90000L, 4L))
    val out = drive(rows, "probe_join_min", 5) { src =>
      val tagged = src.select(
        substring(col("etype"), 1, 1).as("side"),
        substring(col("etype"), 2, 10).as("user"),
        timestamp_millis(col("ms")).as("t"))
      val views = tagged.filter(col("side") === "v")
        .select(col("user"), col("t").as("view_ts"))
        .withWatermark("view_ts", "0 seconds")
      val clicks = tagged.filter(col("side") === "c")
        .select(col("user").as("cuser"), col("t").as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      views.join(clicks,
        expr("user = cuser AND click_ts >= view_ts AND " +
          "click_ts <= view_ts + interval 1 second"))
        .select(col("user"), unix_millis(col("view_ts")).as("vms"),
          unix_millis(col("click_ts")).as("cms"))
    }
    val users = out.map(_.getString(0)).toSet
    assert(users.contains("1"),
      s"min-watermark policy moved: u1 dropped, emitted $users")
  }

  test("stream-stream LEFT OUTER join: late filter and null-extension") {
    // delay 0; wave2 has L=20000 (lagged), E=30000 (current). Rows
    // between the two discriminate which watermark the outer join's
    // late-input filter uses: u1 pair at 25000/25100, u2 view 25200
    // with no click (unmatched candidate), u3 view 19999 (below L).
    val rows = Seq(
      ("v0", 20000L, 0L), ("c0", 20000L, 0L),
      ("v0", 30000L, 1L), ("c0", 30000L, 1L),
      ("v1", 25000L, 2L), ("c1", 25100L, 2L),
      ("v2", 25200L, 2L),
      ("v3", 19999L, 2L),
      ("v9", 60000L, 3L), ("c9", 60000L, 3L),
      ("v8", 90000L, 4L), ("c8", 90000L, 4L))
    val out = drive(rows, "probe_join_outer", 5) { src =>
      val tagged = src.select(
        substring(col("etype"), 1, 1).as("side"),
        substring(col("etype"), 2, 10).as("user"),
        timestamp_millis(col("ms")).as("t"))
      val views = tagged.filter(col("side") === "v")
        .select(col("user"), col("t").as("view_ts"))
        .withWatermark("view_ts", "0 seconds")
      val clicks = tagged.filter(col("side") === "c")
        .select(col("user").as("cuser"), col("t").as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      views.join(clicks,
        expr("user = cuser AND click_ts >= view_ts AND " +
          "click_ts <= view_ts + interval 1 second"), "left_outer")
        .select(col("user"), unix_millis(col("view_ts")).as("vms"),
          unix_millis(col("click_ts")).as("cms"))
    }
    info(s"OUTER ROWS: ${out.sortBy(_.getString(0)).mkString("; ")}")
    // Family D's left_outer oracle rests on exactly these rules — assert
    // them so a Spark upgrade changing null-extension is NAMED here:
    val byUser = out.groupBy(_.getString(0))
    val u1 = byUser.getOrElse("1", Seq.empty)
    assert(u1.map(r => (r.getLong(1), r.getLong(2))) == Seq((25000L, 25100L)),
      s"u1 must pair exactly once: $u1")
    val u2 = byUser.getOrElse("2", Seq.empty)
    assert(u2.length == 1 && u2.head.getLong(1) == 25200L &&
      u2.head.isNullAt(2),
      s"unmatched view must null-extend EXACTLY once at eviction: $u2")
    assert(!byUser.contains("3"),
      s"late view (own ts <= lagged L) must be filtered: ${byUser.get("3")}")
    Seq("9", "8").foreach { u =>
      val s = byUser.getOrElse(u, Seq.empty)
      assert(s.length == 1 && !s.head.isNullAt(2),
        s"sentinel pair u$u must self-join matched, not null-extend: $s")
    }
  }

  test("chained stateful ops: downstream agg evicts on the join's " +
      "PROPAGATED watermark (E - joinW), not the global E") {
    // The family-H oracle treats the finalized output as the pure
    // tumbling rollup of the join's kept pairs; its proof rests on the
    // downstream agg seeing the join's OUTPUT watermark wm_out = E -
    // joinW (view state evicts at v.ts < E - joinW, and the simulated
    // propagation takes the min over sides). Discriminating timeline
    // (joinW 5 s, aggW 10 s, delay 0): the pair (1000, 2000) lands in
    // window [0, 10000); after wave 1 the global E is 12000 >= 10000 —
    // an agg keyed on the GLOBAL watermark would emit the window at
    // wave 2 — but wm_out = 7000 keeps it in state until E reaches
    // 15000 (wave 4, driven by wave 3's 16000 maxima). Advance rows use
    // side-distinct keys so they never pair.
    import spark.implicits._
    val rows = Seq(
      ("v:k1", 1000L, 0L), ("c:k1", 2000L, 0L),
      ("v:a1", 12000L, 1L), ("c:b1", 12000L, 1L),
      ("v:a2", 13000L, 2L), ("c:b2", 13000L, 2L),
      ("v:a3", 16000L, 3L), ("c:b3", 16000L, 3L),
      ("v:a4", 30000L, 4L), ("c:b4", 30000L, 4L))
    val root = java.nio.file.Files.createTempDirectory("wmprobe_chain")
      .toString
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val prev = Seq("spark.sql.shuffle.partitions",
      "spark.sql.streaming.noDataMicroBatches.enabled")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      rows.toDF("etype", "ms", "wave")
        .repartition(1).write.partitionBy("wave").parquet(s"$root/stage")
      val src = spark.readStream.schema("etype STRING, ms LONG")
        .parquet(srcDir)
      val tagged = src.select(
        substring(col("etype"), 1, 1).as("side"),
        substring(col("etype"), 3, 10).as("user"),
        timestamp_millis(col("ms")).as("t"))
      val views = tagged.filter(col("side") === "v")
        .select(col("user"), col("t").as("view_ts"))
        .withWatermark("view_ts", "0 seconds")
      val clicks = tagged.filter(col("side") === "c")
        .select(col("user").as("cuser"), col("t").as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      val out = views.join(clicks,
        expr("user = cuser AND click_ts >= view_ts AND " +
          "click_ts <= view_ts + interval 5 seconds"))
        .groupBy(window(col("click_ts"), "10 seconds"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(unix_millis(col("window.start")).as("ws"), col("n_pairs"))
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("probe_chain")
        .option("checkpointLocation", s"$root/ckpt").start()
      val sinkAfterWave = try {
        (0L until 5L).map { w =>
          val wd = new java.io.File(s"$root/stage/wave=$w")
          Option(wd.listFiles).getOrElse(Array.empty[java.io.File])
            .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
              case (f, k) => java.nio.file.Files.move(f.toPath,
                java.nio.file.Paths.get(s"$srcDir/w${w}_$k.parquet"))
            }
          q.processAllAvailable()
          spark.table("probe_chain").count()
        }
      } finally q.stop()
      info(s"sink rows after each wave: ${sinkAfterWave.mkString(", ")}")
      assert(sinkAfterWave(2) == 0L,
        "window [0,10000) emitted while global E (12000) passed its end " +
          "but the propagated wm_out (7000) had not — the agg is NOT " +
          "evicting on the join's output watermark anymore")
      assert(sinkAfterWave(4) == 1L,
        s"window [0,10000) must emit once wm_out >= 10000 (wave 4): " +
          s"${sinkAfterWave.mkString(", ")}")
      val fin = spark.table("probe_chain").collect()
      assert(fin.length == 1 && fin.head.getLong(0) == 0L &&
        fin.head.getLong(1) == 1L,
        s"finalized chain output moved: ${fin.mkString("; ")}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("union of two watermark nodes with DIFFERENT delays: global " +
      "watermark is the min AFTER each node subtracts its own delay") {
    // Family I's oracle rests on L = min(maxV - delayV, maxC - delayC),
    // not min(maxV, maxC) - <either delay>. Geometry: v-branch delay 0,
    // c-branch delay 10 s; wave 0 advances v to 40000 and c to 30000.
    // Candidate policies give wave-2 lagged L:
    //   min-after-subtraction: min(40000-0, 30000-10000) = 20000
    //   min-of-maxes minus min-delay: 30000 - 0      = 30000
    //   min-of-maxes minus its own (c) delay: 20000  (same here) —
    // so a second discriminator: wave 1 advances c to 60000 (c-node wm
    // 50000) while v stays 40000; wave 3's L = min(40000, 50000) =
    // 40000 under the pinned policy, 40000 - ? under the others. Rows:
    //   wave 2: x at 20000 (window [20000,21000): end 21000 > 20000 ->
    //     KEPT under min-after-subtraction; DROPPED if L were 30000)
    //   wave 3: y at 40000 (window end 41000 > 40000 -> KEPT; a policy
    //     using c's 50000 would DROP it)
    val rows = Seq(
      ("v0", 40000L, 0L), ("c0", 30000L, 0L),
      ("v1", 40000L, 1L), ("c1", 60000L, 1L),
      ("x", 20000L, 2L),
      ("y", 40000L, 3L),
      ("v9", 200000L, 4L), ("c9", 200000L, 4L),
      ("v8", 400000L, 5L), ("c8", 400000L, 5L))
    val out = drive(rows, "probe_union_delays", 6) { src =>
      val v = src.filter(col("etype").startsWith("v") ||
          col("etype").isin("x", "y"))
        .select(col("etype"), timestamp_millis(col("ms")).as("t"))
        .withWatermark("t", "0 seconds")
      val c = src.filter(col("etype").startsWith("c"))
        .select(col("etype"), timestamp_millis(col("ms")).as("t"))
        .withWatermark("t", "10 seconds")
      v.unionByName(c)
        .groupBy(window(col("t"), "1 second"), col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(col("etype"), unix_millis(col("window.start")).as("ws"),
          col("n"))
    }
    val emitted = out.map(_.getString(0)).toSet
    assert(emitted.contains("x"),
      s"x (t=20000, wave-2 L must be min(40000-0, 30000-10000)=20000) " +
        s"was dropped — the per-node-delay min policy moved: $emitted")
    assert(emitted.contains("y"),
      s"y (t=40000, wave-3 L must be min(40000, 50000)=40000, " +
        s"window-end 41000 > L) was dropped: $emitted")
  }

  test("transformWithState with eventTimeColumnName: a late-but-kept row " +
      "can be re-emitted with its own time (validation bound is the " +
      "lagged filter watermark, not the current eviction watermark)") {
    // Family L's load-bearing rule: the admit processor echoes the kept
    // row's OWN event time into the re-declared output column. A kept
    // row's time satisfies ms > L(k) = E(k-1), but can sit BELOW the
    // current eviction watermark E(k) — if Spark validated emitted times
    // against E(k), the echo would kill the query. Probe: delay 60000,
    // wave0 max 100000 => during wave1, E(1) = 40000 and L(1) = 0; the
    // wave-1 row at ms=30000 is kept (30000 > 0) yet below E(1). The
    // query must SURVIVE and emit it.
    val rows = Seq(
      ("7", 100000L, 0L),
      ("8", 30000L, 1L),
      ("-1", 300000L, 2L), ("-2", 500000L, 3L))
    val out = drive(rows, "probe_tws_etcol", 4, rocks = true) { src =>
      import spark.implicits._
      graft.streaming.TwsAdmitJob.admitFirst(
        src.select(col("etype").cast("long").as("key"),
          timestamp_millis(col("ms")).as("eventTs"),
          lit(0.0).as("value")).as[graft.streaming.KeyedEvent],
        bucketMs = 1000L, delay = "60000 milliseconds").toDF()
        .select(col("key"), unix_millis(col("viewTs")).as("ms"))
    }
    val byKey = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey.get(8L).contains(30000L),
      s"output event-time validation rule moved (kept-below-E echo): $byKey")
    assert(byKey.get(7L).contains(100000L), s"echo lost the wave-0 row: $byKey")
  }

  test("transformWithState output watermark feeds a downstream " +
      "stream-stream join: pairs form for clicks above the lagged bound " +
      "and the finalized inner output equals the kept-rows batch join") {
    // The reverse composition of the chained-ops probe: TWS (admit
    // first-per-bucket, echoing event time) INTO an interval join.
    // delay 0, joinW 10000. Waves: v@20000 arrives wave0; c@25000 wave1
    // (in-window); wave2 carries c@21000 — late bound L(2) = E(1) =
    // 20000, so the click is KEPT (21000 > 20000) and must still find
    // the view in state (view evicts only at view_ts < E - joinW).
    // Wave3 carries c@19000 <= L(3)=25000 — DROPPED despite being
    // in-window. Finalized pairs: (20000,25000) and (20000,21000).
    val rows = Seq(
      ("v", 20000L, 0L),
      ("c", 25000L, 1L),
      ("c", 21000L, 2L),
      ("c", 19000L, 3L),
      ("sv", 300000L, 4L), ("sc", 300000L, 4L),
      ("sv2", 500000L, 5L), ("sc2", 500000L, 5L))
    val out = drive(rows, "probe_tws_join", 6, rocks = true) { src =>
      import spark.implicits._
      val views = graft.streaming.TwsAdmitJob.admitFirst(
        src.filter(col("etype").startsWith("v") || col("etype").startsWith("sv"))
          .select(lit(1L).as("key"),
            timestamp_millis(col("ms")).as("eventTs"),
            lit(0.0).as("value")).as[graft.streaming.KeyedEvent],
        bucketMs = 1000L, delay = "0 seconds").toDF()
        .select(col("key").as("vuser"), col("viewTs").as("view_ts"))
      val clicks = src
        .filter(col("etype").startsWith("c") || col("etype").startsWith("sc"))
        .select(lit(1L).as("cuser"), timestamp_millis(col("ms")).as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      views.join(clicks,
          expr("vuser = cuser AND click_ts >= view_ts AND " +
            "click_ts <= view_ts + interval 10000 millisecond"), "inner")
        .select(unix_millis(col("view_ts")).as("vms"),
          unix_millis(col("click_ts")).as("cms"))
    }
    val pairs = out.map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 < 200000L).sorted
    assert(pairs == Seq((20000L, 21000L), (20000L, 25000L)),
      s"tws->join propagation rule moved: $pairs")
  }

  test("streaming dedup chained into a windowed agg: the agg accumulates " +
      "across batches through the dedup, a late duplicate is dropped " +
      "before it can re-feed, and emitted windows stay emitted") {
    // Family M's load-bearing composition rules, end to end: dedup
    // passes rows through with the event-time column UNTOUCHED, so the
    // downstream agg runs on the same global watermark. bucket 1000,
    // window 2000, delay 0.
    //   wave0: (100, 20000)            -> dedup emits; window [20000,22000)
    //   wave1: (101, 30000)            -> raises the max
    //   wave2: L(2)=20000. (1, 20001) buckets to 20000 <= L -> dropped
    //     (inclusive, BEFORE the dedup state is consulted); (2, 21000)
    //     kept -> dedup emits into the SAME [20000,22000) window, which
    //     must accumulate n=2 across batches; (100, 20000) retry also
    //     dropped late -> no double count
    //   waves 3/4: sentinels flush. Expect (20000, n=2, sum=102) and
    //   (30000, n=1, sum=101).
    val rows = Seq(
      ("100", 20000L, 0L),
      ("101", 30000L, 1L),
      ("1", 20001L, 2L), ("2", 21000L, 2L), ("100", 20000L, 2L),
      ("-1", 60000L, 3L), ("-2", 90000L, 4L))
    val out = drive(rows, "probe_dedup_agg", 5) { src =>
      src.select(col("etype").cast("long").as("key"),
          timestamp_millis(expr("(ms div 1000L) * 1000L")).as("bt"))
        .withWatermark("bt", "0 seconds")
        .dropDuplicates("key", "bt")
        .groupBy(window(col("bt"), "2000 milliseconds"))
        .agg(count(lit(1)).as("n"), sum(col("key")).as("sum_keys"))
        .select(unix_millis(col("window.start")).as("ws"),
          col("n"), col("sum_keys"))
    }
    val real = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 < 40000L).sorted
    assert(real == Seq((20000L, 2L, 102L), (30000L, 1L, 101L)),
      s"dedup->agg composition rule moved: $real")
  }

  test("stream-stream join output watermark drives a SECOND join's late " +
      "filter: a purchase older than the global watermark but within w1 " +
      "of it is kept and matched, INCLUDING at exactly E - w1") {
    // Family N's load-bearing propagation rule: join2's single input
    // watermark is min(wm_out(join1), wm(purchase node)) = E - w1, so
    // the purchase-side late bound is SHIFTED by join1's view-state
    // range — and, like every late filter, it lags one batch behind the
    // eviction value (the fuzz oracles' two-batch-lagged CTE: the bound
    // in batch N is E(N-2) - w1). delay 0, w1 = w2 = 10000.
    //   wave0: v/c/p @20000 -> E(0) = 20000
    //   wave1: v/c @40000, v/c/p @50000 -> E(1) = 50000
    //   wave2: v@45000 (spacer batch; pairs with the stored c@50000)
    //   wave3: late bound for purchases = E(1) - w1 = 40000.
    //     p@45000 KEPT (45000 > 40000, though it is below the global
    //     E(1) = 50000 — the naive unshifted bound would drop it) and
    //     matched to the stored pair (40000, 40000);
    //     p@40000 == the shifted bound -> KEPT: unlike the inclusive
    //     source-side late filters (drop at ms <= L), the PROPAGATED
    //     bound drops strictly below E - w1 (Spark's join state-
    //     watermark subtraction is exclusive at the boundary);
    //     p@29000 < 40000 -> DROPPED (its (20000, 20000) pair is also
    //     long evicted)
    //   waves 4/5: sentinel triples flush
    val rows = Seq(
      ("v", 20000L, 0L), ("c", 20000L, 0L), ("p", 20000L, 0L),
      ("v", 40000L, 1L), ("c", 40000L, 1L),
      ("v", 50000L, 1L), ("c", 50000L, 1L), ("p", 50000L, 1L),
      ("v", 45000L, 2L),
      ("p", 45000L, 3L), ("p", 40000L, 3L), ("p", 29000L, 3L),
      ("sv", 300000L, 4L), ("sc", 300000L, 4L), ("sp", 300000L, 4L),
      ("sv2", 500000L, 5L), ("sc2", 500000L, 5L), ("sp2", 500000L, 5L))
    val out = drive(rows, "probe_join_join", 6) { src =>
      val views = src.filter(col("etype").isin("v", "sv", "sv2"))
        .select(lit(1L).as("vuser"), timestamp_millis(col("ms")).as("view_ts"))
        .withWatermark("view_ts", "0 seconds")
      val clicks = src.filter(col("etype").isin("c", "sc", "sc2"))
        .select(lit(1L).as("cuser"), timestamp_millis(col("ms")).as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      val purchases = src.filter(col("etype").isin("p", "sp", "sp2"))
        .select(lit(1L).as("puser"),
          timestamp_millis(col("ms")).as("purchase_ts"))
        .withWatermark("purchase_ts", "0 seconds")
      views.join(clicks,
          expr("vuser = cuser AND click_ts >= view_ts AND " +
            "click_ts <= view_ts + interval 10000 millisecond"), "inner")
        .select(col("vuser"), unix_millis(col("view_ts")).as("vms"),
          col("click_ts"))
        .join(purchases,
          expr("vuser = puser AND purchase_ts >= click_ts AND " +
            "purchase_ts <= click_ts + interval 10000 millisecond"), "inner")
        .select(col("vms"), unix_millis(col("click_ts")).as("cms"),
          unix_millis(col("purchase_ts")).as("pms"))
    }
    val real = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 < 200000L).sorted
    assert(real == Seq(
      (20000L, 20000L, 20000L),
      (40000L, 40000L, 40000L),
      (40000L, 40000L, 45000L),
      (40000L, 40000L, 50000L),
      (40000L, 50000L, 50000L),
      (45000L, 50000L, 50000L),
      (50000L, 50000L, 50000L)),
      s"join->join propagation rule moved: $real")
  }

  test("streaming dedup chained into a stream-stream join: the deduped " +
      "view joins across batches, a suppressed duplicate never double-" +
      "emits pairs, and a late-but-kept click still finds the deduped " +
      "view in join state") {
    // Family O's load-bearing composition rules: dedup passes the
    // event-time column through UNTOUCHED (no watermark subtraction on
    // the way into the join, unlike a join's own w1 shift), duplicate
    // suppression happens BEFORE the join (one pair per kept click, not
    // per view retry), and the join's state/late bounds are the plain
    // family-D rules on the bucketed time. bucket 1000, w 10000,
    // delay 0.
    //   wave0: v@20500 (bucket 20000), c@20500 -> pair (20000, 20500);
    //          E(0) = 20000 (min over floored-view/raw-click maxes)
    //   wave1: v@20700 (same bucket — DUPLICATE, suppressed: no new
    //          pair), c@29000 -> pair (20000, 29000) from the STORED
    //          deduped view; v@40000 + c@40000 -> pair (40000, 40000),
    //          E(1) = 40000
    //   wave2: late click c@25000: bound = E(0) = 20000 -> KEPT, must
    //          still match the stored view (eviction at bt < E - w =
    //          30000 runs AFTER the batch's matching) -> (20000, 25000);
    //          view retry v@20900 buckets to 20000 <= L -> dropped late
    //          (inclusive), no re-emission
    //   wave3: late click c@24000: bound = E(1) = 40000 -> dropped
    //   waves 4/5: sentinel pairs flush
    val rows = Seq(
      ("v", 20500L, 0L), ("c", 20500L, 0L),
      ("v", 20700L, 1L), ("c", 29000L, 1L),
      ("v", 40000L, 1L), ("c", 40000L, 1L),
      ("c", 25000L, 2L), ("v", 20900L, 2L),
      ("c", 24000L, 3L),
      ("sv", 300000L, 4L), ("sc", 300000L, 4L),
      ("sv2", 500000L, 5L), ("sc2", 500000L, 5L))
    val out = drive(rows, "probe_dedup_join", 6) { src =>
      val views = src.filter(col("etype").isin("v", "sv", "sv2"))
        .select(lit(1L).as("vuser"),
          timestamp_millis(expr("(ms div 1000L) * 1000L")).as("view_bt"))
        .withWatermark("view_bt", "0 seconds")
        .dropDuplicates("vuser", "view_bt")
      val clicks = src.filter(col("etype").isin("c", "sc", "sc2"))
        .select(lit(1L).as("cuser"), timestamp_millis(col("ms")).as("click_ts"))
        .withWatermark("click_ts", "0 seconds")
      views.join(clicks,
          expr("vuser = cuser AND click_ts >= view_bt AND " +
            "click_ts <= view_bt + interval 10000 millisecond"), "inner")
        .select(unix_millis(col("view_bt")).as("vms"),
          unix_millis(col("click_ts")).as("cms"))
    }
    val real = out.map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 < 200000L).sorted
    assert(real == Seq(
      (20000L, 20500L),
      (20000L, 25000L),
      (20000L, 29000L),
      (40000L, 40000L)),
      s"dedup->join composition rule moved: $real")
  }

  test("two windowed aggregations joined on (window, key): both sides " +
      "finalize a shared window in the SAME batch and the join emits " +
      "the pair exactly once; cross-batch accumulation lands before " +
      "finalize; a partner-less window emits nothing") {
    // Family P's load-bearing composition rules: the two agg operators
    // evict with the ONE global watermark (min across sides, maxes
    // through batch k-1), so a window W present on both sides emits on
    // both in the SAME batch — the first with E(k) >= W.end — and the
    // pair meets in the join inside a single micro-batch (neither row
    // can be evicted from join state before its partner arrives). Each
    // side's late filter lags one batch further (the oracles' lag2
    // CTE), so a row far below the CURRENT watermark still lands in a
    // not-yet-finalized window. width 10000, delay 0.
    //   wave0: v@15000, v@16000, c@15500          (window [10000,20000))
    //   wave1: c@16500 accumulates into W's click state (L(1) = E(0) =
    //          0); v/c@35000 arrive; E(1) = min of the BATCH-0 maxes =
    //          15500 < 20000 -> W stays open on both sides
    //   wave2: v@14000: late bound L(2) = E(1) = 15500, window end
    //          20000 > 15500 -> KEPT (even though E(2) is already
    //          35000 — the lag-2 rule, THROUGH the composition);
    //          eviction then runs with E(2) = 35000 >= 20000 -> BOTH
    //          sides emit W in THIS batch with cross-batch counts and
    //          the join pairs them exactly once: (10000, v_n=3, c_n=2)
    //   wave3: v@45000 ([40000,50000), never clicked) and c@55000
    //          ([50000,60000), never viewed); E(3) = 35000 < 40000
    //   wave4: sentinels raise E(4) to min(45000, 55000) = 45000 ->
    //          [30000,40000) finalizes both sides -> pair (30000, 1, 1)
    //   wave5: second sentinels flush the rest: the two partner-less
    //          windows finalize and must produce NOTHING via the inner
    //          join; the wave-4 sentinel windows pair at ws=300000 and
    //          are filtered by the assertion bound
    val rows = Seq(
      ("v", 15000L, 0L), ("v", 16000L, 0L), ("c", 15500L, 0L),
      ("c", 16500L, 1L), ("v", 35000L, 1L), ("c", 35000L, 1L),
      ("v", 14000L, 2L),
      ("v", 45000L, 3L), ("c", 55000L, 3L),
      ("sv", 300000L, 4L), ("sc", 300000L, 4L),
      ("sv2", 500000L, 5L), ("sc2", 500000L, 5L))
    val out = drive(rows, "probe_agg_join", 6) { src =>
      val v = src.filter(col("etype").isin("v", "sv", "sv2"))
        .select(lit(1L).as("user_id"), timestamp_millis(col("ms")).as("vt"))
        .withWatermark("vt", "0 seconds")
        .groupBy(window(col("vt"), "10000 milliseconds"), col("user_id"))
        .agg(count(lit(1)).as("v_n"))
      val c = src.filter(col("etype").isin("c", "sc", "sc2"))
        .select(lit(1L).as("user_id"), timestamp_millis(col("ms")).as("ct"))
        .withWatermark("ct", "0 seconds")
        .groupBy(window(col("ct"), "10000 milliseconds"), col("user_id"))
        .agg(count(lit(1)).as("c_n"))
      v.join(c, Seq("window", "user_id"), "inner")
        .select(unix_millis(col("window.start")).as("ws"),
          col("v_n"), col("c_n"))
    }
    val real = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 < 200000L).sorted
    assert(real == Seq((10000L, 3L, 2L), (30000L, 1L, 1L)),
      s"agg x agg -> window-join composition rule moved: $real")
  }

  test("two windowed aggregations LEFT OUTER joined on (window, key): " +
      "a matched window pairs once, an unmatched LEFT window emits " +
      "exactly one null-extended row after eviction, and an unmatched " +
      "RIGHT window emits nothing") {
    // Family Q's null-extension rules on top of family P's
    // co-finalization: an unmatched view-side window W can only be
    // null-extended AFTER the join is sure no click aggregate for W
    // can still arrive — and co-finalization means a click W row (if
    // any) lands in the SAME batch W's view row does, so a null row is
    // never followed by a late pair, and a pair is never doubled by a
    // spurious null row. width 10000, delay 0.
    //   wave0: v@15000, v@16000, c@15500       -> [10000,20000) matched
    //   wave1: v@25000                          -> [20000,30000) view-only
    //          c@33000                          -> [30000,40000) click-only
    //   wave2: v/c@55000 advance E; [10000,20000) and [20000,30000)
    //          and [30000,40000) all finalize upstream as E reaches
    //          their ends across the remaining waves
    //   waves 3/4: sentinels flush everything real
    // Expect: (10000, v_n=2, c_n=1) matched; (20000, 1, null)
    // null-extended exactly once; NO row for 30000 (right side has no
    // left partner); (50000, 1, 1) from the advancing pair.
    val rows = Seq(
      ("v", 15000L, 0L), ("v", 16000L, 0L), ("c", 15500L, 0L),
      ("v", 25000L, 1L), ("c", 33000L, 1L),
      ("v", 55000L, 2L), ("c", 55000L, 2L),
      ("sv", 300000L, 3L), ("sc", 300000L, 3L),
      ("sv2", 500000L, 4L), ("sc2", 500000L, 4L))
    val out = drive(rows, "probe_agg_join_outer", 5) { src =>
      val v = src.filter(col("etype").isin("v", "sv", "sv2"))
        .select(lit(1L).as("user_id"), timestamp_millis(col("ms")).as("vt"))
        .withWatermark("vt", "0 seconds")
        .groupBy(window(col("vt"), "10000 milliseconds"), col("user_id"))
        .agg(count(lit(1)).as("v_n"))
      val c = src.filter(col("etype").isin("c", "sc", "sc2"))
        .select(lit(1L).as("user_id"), timestamp_millis(col("ms")).as("ct"))
        .withWatermark("ct", "0 seconds")
        .groupBy(window(col("ct"), "10000 milliseconds"), col("user_id"))
        .agg(count(lit(1)).as("c_n"))
      v.join(c, Seq("window", "user_id"), "left_outer")
        .select(unix_millis(col("window.start")).as("ws"),
          col("v_n"), col("c_n"))
    }
    val real = out.map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .filter(_._1 < 200000L).sorted
    assert(real == Seq((10000L, 2L, 1L), (20000L, 1L, -1L),
        (50000L, 1L, 1L)),
      s"agg x agg -> LEFT OUTER window-join rule moved: $real")
  }

  test("union of two differently-delayed legs feeding a stream-stream " +
      "join: the slow leg's delay gates the shared late bound, a " +
      "late-but-kept union row still matches an old click in join " +
      "state, and the inclusive drop boundary holds on a union leg") {
    // Family R's load-bearing rules: the unioned input reaches the join
    // as ONE side whose watermark is the min over the leg nodes (each
    // subtracting its own delay — the family I policy), the join's late
    // filter lags one batch (L(k) = E(k-1)) and drops a union row iff
    // ms <= L (inclusive, the family D source-side rule), and matching
    // runs before eviction within a batch. legs: v delay 0, s delay
    // 20000; clicks delay 0; join window 10000.
    //   wave0: v/s/c@30000, c@16000
    //   wave1: v/s/c@60000; E(1) = min(30000-0, 30000-20000, 30000-0)
    //          = 10000
    //   wave2: L(2) = E(1) = 10000. v@15000 and s@12000 both KEPT
    //          (> 10000 — the s leg's 20000 delay holds the global
    //          bound down even for the 0-delay v leg) and both match
    //          the c@16000 STILL IN STATE from wave0; v@10000 == the
    //          bound -> DROPPED (inclusive)
    //   waves 3/4: sentinel triples flush
    val rows = Seq(
      ("v", 30000L, 0L), ("s", 30000L, 0L), ("c", 30000L, 0L),
      ("c", 16000L, 0L),
      ("v", 60000L, 1L), ("s", 60000L, 1L), ("c", 60000L, 1L),
      ("v", 15000L, 2L), ("s", 12000L, 2L), ("v", 10000L, 2L),
      ("sv", 300000L, 3L), ("ss", 300000L, 3L), ("sc", 300000L, 3L),
      ("sv2", 500000L, 4L), ("ss2", 500000L, 4L), ("sc2", 500000L, 4L))
    val out = drive(rows, "probe_union_join", 5) { src =>
      val views = src.filter(col("etype").isin("v", "sv", "sv2"))
        .select(lit("v").as("leg"), lit(1L).as("euser"),
          timestamp_millis(col("ms")).as("et"))
        .withWatermark("et", "0 seconds")
      val signups = src.filter(col("etype").isin("s", "ss", "ss2"))
        .select(lit("s").as("leg"), lit(1L).as("euser"),
          timestamp_millis(col("ms")).as("et"))
        .withWatermark("et", "20000 milliseconds")
      val clicks = src.filter(col("etype").isin("c", "sc", "sc2"))
        .select(lit(1L).as("cuser"), timestamp_millis(col("ms")).as("ct"))
        .withWatermark("ct", "0 seconds")
      views.unionByName(signups).join(clicks,
          expr("euser = cuser AND ct >= et AND " +
            "ct <= et + interval 10000 millisecond"), "inner")
        .select(col("leg"), unix_millis(col("et")).as("ems"),
          unix_millis(col("ct")).as("cms"))
    }
    val real = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 < 200000L).sorted
    assert(real == Seq(
      ("s", 12000L, 16000L), ("s", 30000L, 30000L), ("s", 60000L, 60000L),
      ("v", 15000L, 16000L), ("v", 30000L, 30000L), ("v", 60000L, 60000L)),
      s"union -> join composition rule moved: $real")
  }

  test("tws admission chained into a windowed agg: the coarse window " +
      "accumulates admissions across batches, a suppressed retry never " +
      "double-counts, and a same-batch admission lands in the window " +
      "closing that batch") {
    // Family S's load-bearing composition rules: the admitted row's own
    // time is the agg's event time (no watermark shift through tws), a
    // bucket-suppressed retry produces NO aggregate contribution, and
    // input rows are processed before the agg's eviction — an admission
    // arriving in the window's closing batch is counted into the
    // closing report. bucket 1000, aggW 2000, delay 0.
    //   wave0: key 100 @20500 -> admitted; coarse window [20000,22000)
    //   wave1: key 101 @30000 -> admitted; E(1) = 20500
    //   wave2: L(2) = E(1) = 20500. key 1 @21000 kept -> bucket 21000
    //          admitted into the SAME coarse window; key 100 @20900
    //          kept by the late filter BUT bucket 20000 already
    //          admitted -> suppressed, no double count; key 2 @20400
    //          <= L -> tws-dropped. E(2) = 30000 closes [20000,22000)
    //          THIS batch with both admissions: (20000, n=2, sum=101)
    //   waves 3/4: sentinels flush [30000,32000) -> (30000, 1, 101)
    val rows = Seq(
      ("100", 20500L, 0L),
      ("101", 30000L, 1L),
      ("1", 21000L, 2L), ("100", 20900L, 2L), ("2", 20400L, 2L),
      ("-1", 60000L, 3L), ("-2", 90000L, 4L))
    val out = drive(rows, "probe_tws_agg", 5, rocks = true) { src =>
      import spark.implicits._
      graft.streaming.TwsAdmitJob.admitFirst(
        src.select(col("etype").cast("long").as("key"),
          timestamp_millis(col("ms")).as("eventTs"),
          lit(0.0).as("value")).as[graft.streaming.KeyedEvent],
        bucketMs = 1000L, delay = "0 seconds").toDF()
        .groupBy(window(col("viewTs"), "2000 milliseconds"))
        .agg(count(lit(1)).as("n"), sum(col("key")).as("sum_keys"))
        .select(unix_millis(col("window.start")).as("ws"),
          col("n"), col("sum_keys"))
    }
    val real = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 < 40000L).sorted
    assert(real == Seq((20000L, 2L, 101L), (30000L, 1L, 101L)),
      s"tws -> agg composition rule moved: $real")
  }

  test("session_window -> tumbling rollup: window_time is end - 1us and " +
      "an emitted session is never late downstream (family V's totality)") {
    // gap 2 min, rollup 10 min, delay 10 s.
    //  - u7's burst {0, 60000} merges to session [0, 180000); its second
    //    session [480000, 600000) ends EXACTLY on the tumble boundary, so
    //    window_time = 600000ms - 1us puts it in tumble [0, 600000) —
    //    w_start 0 holds BOTH sessions (rule 1: w2s = ((end-1) div W)*W).
    //  - u5's wave-0 session [0, 120000) is emitted in batch 2, where the
    //    CURRENT watermark (~9.99M) is far past its tumble end 600000; the
    //    downstream late filter uses the lag-2 (previous-batch) bound, so
    //    the session must still land (rule 2) — with a lag-1 filter the
    //    w_start=0 row would vanish. This is the lag chain that makes the
    //    family-V oracle a plain GROUP BY over finalized sessions: first
    //    emission at est gives end > runmax(est-2) - delay, and
    //    w2_end >= end always.
    val rows = Seq(
      ("7", 0L, 0L), ("7", 60000L, 0L), ("5", 0L, 0L),
      ("7", 480000L, 1L), ("5", 10000000L, 1L),
      ("7", 1200000L, 2L), ("5", 20000000L, 2L),
      ("-1", 100000000L, 3L), ("-2", 200000000L, 4L))
    val out = drive(rows, "probe_sess_rollup", 5) { src =>
      src.select(col("etype").cast("long").as("key"),
          timestamp_millis(col("ms")).as("bt"))
        .withWatermark("bt", "10000 milliseconds")
        .groupBy(session_window(col("bt"), "120000 milliseconds"),
          col("key"))
        .agg(count(lit(1)).as("n_rows"))
        .groupBy(window(window_time(col("session_window")),
          "600000 milliseconds"), col("key"))
        .agg(sum(col("n_rows")).as("s_rows"), count(lit(1)).as("n_sess"))
        .select(col("key"), unix_millis(col("window.start")).as("w_start"),
          col("s_rows"), col("n_sess"))
    }
    val real = out.filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(real == Seq(
      (5L, 0L, 1L, 1L), (5L, 9600000L, 1L, 1L), (5L, 19800000L, 1L, 1L),
      (7L, 0L, 3L, 2L), (7L, 1200000L, 1L, 1L)),
      s"session->rollup composition rules moved: $real")
  }

  test("transformWithState: input rows are processed before timers fire") {
    // wave2 both delivers a kept row for key 5's bucket [1000,2000) AND
    // advances wm past the bucket's pending timer. Input-first => ONE
    // report with n=2; timer-first would split it — rule 4.
    val rows = Seq(
      ("5", 1000L, 0L), ("6", 50000L, 1L),
      ("5", 1500L, 2L),
      ("-1", 90000L, 3L), ("-2", 130000L, 4L))
    val out = drive(rows, "probe_tws_order", 5, rocks = true) { src =>
      import spark.implicits._
      graft.streaming.TwsQuotaJob.quota(
        src.select(col("etype").cast("long").as("key"),
          timestamp_millis(col("ms")).as("eventTs"),
          lit(0.0).as("value")).as[graft.streaming.KeyedEvent],
        bucketMs = 1000L, cap = 10L, delay = "0 seconds").toDF()
    }
    val k5 = out.filter(_.getLong(0) == 5L)
    assert(k5.length == 1 && k5.head.getLong(2) == 2L,
      s"input-vs-timer ordering moved: key-5 reports $k5")
  }
}
