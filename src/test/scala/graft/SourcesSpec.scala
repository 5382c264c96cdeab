package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SourceOps
import graft.sources.JsonLinesSource

/** The custom DataSource V2 connector's contracts: schema inference,
  * exact byte-range split ownership (no dropped / duplicated lines at any
  * split size), filter pushdown + column pruning reaching the scan, and
  * PERMISSIVE degradation on dirty records.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeLines(lines: Seq[String]): Path = {
    val dir = Files.createTempDirectory("jsonl_spec")
    Files.write(dir.resolve("part-000.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    dir
  }

  private val rows = (0 until 97).map(i =>
    s"""{"id":$i,"name":"doc$i","score":${i * 0.5},"live":${i % 2 == 0}}""")

  test("schema inference: integral->long, fractional->double, bool, string") {
    val dir = writeLines(rows)
    val schema = new JsonLinesSource().inferSchema(
      new CaseInsensitiveStringMap(java.util.Map.of("path", dir.toString)))
    assert(schema === StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("live", BooleanType))))
  }

  test("byte-range splits own every line exactly once, at any split size") {
    val dir = writeLines(rows)
    val whole = spark.read.format("graft-jsonl").load(dir.toString)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(whole.toSeq === (0L until 97L), "single-split read is the baseline")
    // tiny splits: line boundaries land mid-split everywhere
    for (split <- Seq(7, 64, 1000)) {
      val got = spark.read.format("graft-jsonl")
        .option("split.bytes", split).load(dir.toString)
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === (0L until 97L),
        s"split.bytes=$split dropped or duplicated lines")
    }
  }

  test("pushed filters and pruned columns appear in the scan; result is exact") {
    val dir = writeLines(rows)
    val df = spark.read.format("graft-jsonl").load(dir.toString)
      .filter("id >= 10 AND live = true").select("name")
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,10)"),
      s"filter not pushed into graft-jsonl scan:\n$plan")
    // pruning: the full-row fields the query never uses are absent from
    // the advertised ReadSchema (filters may still read them pre-projection)
    assert(plan.contains("ReadSchema: struct<name:string>"),
      s"projection not pruned in scan description:\n$plan")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ===
      (10 until 97 by 2).map(i => s"doc$i").sorted)
  }

  test("ScanBuilder contract: supported filters accepted, the rest returned") {
    val schema = SourceOps.documentsSchema
    val dir = writeLines(rows)
    val table = new JsonLinesSource().getTable(schema, Array.empty,
      java.util.Map.of("path", dir.toString))
    val sb = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
    val supported: Array[Filter] =
      Array(EqualTo("lang", "en"), GreaterThan("n_chars", 100L), IsNotNull("doc_id"))
    val unsupported: Array[Filter] =
      Array(StringContains("text", "spark"), EqualTo("missing_col", 1))
    val rest = sb.pushFilters(supported ++ unsupported)
    assert(rest.toSet === unsupported.toSet, "unsupported filters must stay with Spark")
    assert(sb.pushedFilters().toSet === supported.toSet)
  }

  test("PERMISSIVE degradation: malformed lines skipped, wrong types null") {
    val dir = writeLines(Seq(
      """{"id":1,"name":"ok","score":1.5,"live":true}""",
      """not json at all""",
      """{"id":"not-a-number","name":"typed","score":2.5,"live":false}""",
      "",
      """{"id":4,"name":null,"score":3.5,"live":true}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("live", BooleanType)))
    val got = spark.read.format("graft-jsonl").schema(schema)
      .load(dir.toString).collect().sortBy(r => Option(r.get(2)).map(_.toString).getOrElse(""))
    assert(got.length === 3, "malformed/blank lines must be skipped, typed rows kept")
    assert(got(0).getDouble(2) === 1.5 && got(0).getLong(0) === 1L)
    assert(got(1).isNullAt(0) && got(1).getString(1) === "typed",
      "wrong-typed field degrades to null, row survives")
    assert(got(2).isNullAt(1) && got(2).getLong(0) === 4L)
  }

  test("micro-batch streaming: each staged file read exactly once, " +
      "appends picked up, filter applied") {
    val dir = Files.createTempDirectory("jsonl_stream")
    def stage(name: String, lines: Seq[String]): Unit = {
      // tmp-then-atomic-rename, the immutability contract the stream requires
      val tmp = dir.resolve(s".$name.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    stage("batch-0.jsonl", (0 until 10).map(i => s"""{"id":$i,"name":"d$i"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val q = spark.readStream.format("graft-jsonl").schema(schema)
      .option("split.bytes", 64).load(dir.toString)
      .filter("id >= 2")
      .writeStream.format("memory").queryName("jsonl_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("jsonl_stream_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_stream").count() === 8)
      stage("batch-1.jsonl", (10 until 15).map(i => s"""{"id":$i,"name":"d$i"}"""))
      q.processAllAvailable()
      val ids = spark.table("jsonl_stream").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === (2L until 15L), "second batch must add ONLY the new file")
    } finally q.stop()
  }

  test("streaming file log recovers across restart with identical splits") {
    val dir = Files.createTempDirectory("jsonl_recover")
    Files.write(dir.resolve("a.jsonl"),
      (0 until 20).map(i => s"""{"id":$i}""").mkString("\n").getBytes(StandardCharsets.UTF_8))
    val ckpt = Files.createTempDirectory("jsonl_recover_ckpt").toString
    val schema = StructType(Seq(StructField("id", LongType)))
    def mkStream() = new graft.sources.JsonLinesSource()
      .getTable(schema, Array.empty, java.util.Map.of("path", dir.toString))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new CaseInsensitiveStringMap(
        java.util.Map.of("split.bytes", "32")))
      .build().toMicroBatchStream(ckpt)
    val s1 = mkStream()
    val end1 = s1.latestOffset()
    val parts1 = s1.planInputPartitions(s1.initialOffset(), end1)
    // the file grows AFTER discovery: a replayed batch must NOT see the
    // appended bytes — the log snapshotted the length
    Files.write(dir.resolve("a.jsonl"),
      "\n{\"id\":99}".getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.APPEND)
    val s2 = mkStream() // fresh instance, same checkpoint = restart
    val parts2 = s2.planInputPartitions(
      s2.deserializeOffset("0"), s2.deserializeOffset(end1.json()))
    assert(parts1.toSeq === parts2.toSeq,
      "replayed batch must re-plan byte-identical splits from the recovered log")
  }

  test("write path: round-trip, overwrite replaces, no temp files leak") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl_write").resolve("out").toString
    val df = (0 until 50).map(i => (i.toLong, s"row$i", i * 1.5, i % 3 == 0))
      .toDF("id", "name", "score", "live").repartition(4)
    df.write.format("graft-jsonl").mode("append").save(dir)
    val back = spark.read.format("graft-jsonl").load(dir)
    assert(back.schema.fieldNames.sorted.toSeq === Seq("id", "live", "name", "score"))
    assert(back.count() === 50)
    assert(back.selectExpr("sum(id)", "sum(score)").collect()(0).toSeq ===
      df.selectExpr("sum(id)", "sum(score)").collect()(0).toSeq)
    // overwrite with different content: old files must be gone
    val df2 = (100 until 110).map(i => (i.toLong, s"row$i", 0.0, false))
      .toDF("id", "name", "score", "live")
    df2.write.format("graft-jsonl").mode("overwrite").save(dir)
    val after = spark.read.format("graft-jsonl").load(dir)
    assert(after.count() === 10)
    assert(after.agg(org.apache.spark.sql.functions.min("id")).collect()(0).getLong(0) === 100L)
    // two-phase commit leaves no temp litter (checksum .crc siblings from
    // the local filesystem are fine; task temps are not)
    val leftover = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.contains(".tmp-"))
    assert(leftover.isEmpty, s"temp files leaked: ${leftover.mkString(",")}")
  }

  test("write path: JSON escaping round-trips hostile strings") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl_escape").resolve("out").toString
    val hostile = Seq("quote\"backslash\\", "tab\tnewline\n", "unicode é中",
      "{looks:\"like json\"}", "")
    hostile.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .write.format("graft-jsonl").mode("append").save(dir)
    val back = spark.read.format("graft-jsonl").load(dir)
      .collect().sortBy(_.getLong(0)).map(_.getString(1))
    assert(back.toSeq === hostile, "writer escaping must round-trip through the reader")
  }

  test("write abort deletes the task temp file") {
    val dir = Files.createTempDirectory("jsonl_abort").toString
    val schema = StructType(Seq(StructField("id", LongType)))
    val factory = new graft.sources.JsonLinesWriterFactory(dir, schema, "testjob")
    val writer = factory.createWriter(0, 7L)
    writer.write(org.apache.spark.sql.catalyst.InternalRow(1L))
    // task attempt fails -> abort: its temp must vanish, nothing visible
    writer.abort()
    assert(new java.io.File(dir).listFiles().forall(f => !f.getName.contains("tmp")),
      "aborted attempt left its temp file")
    // a second attempt (new taskId) succeeds and commits cleanly
    val retry = factory.createWriter(0, 8L)
    retry.write(org.apache.spark.sql.catalyst.InternalRow(2L))
    val msg = retry.commit()
    new graft.sources.JsonLinesBatchWrite(dir, schema, false)
      .commit(Array(msg))
    val rows = spark.read.format("graft-jsonl")
      .schema(schema).load(dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L),
      "only the committed attempt's rows may be visible")
  }

  test("streaming write end-to-end: MemoryStream epochs land exactly " +
      "once, sink metrics observable, zone sidecar maintained") {
    import spark.implicits._
    val out = Files.createTempDirectory("jsonl_swrite").resolve("out").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "name")
      .writeStream.format("graft-jsonl")
      .option("checkpointLocation",
        Files.createTempDirectory("jsonl_swrite_ckpt").toString)
      .start(out)
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val back = spark.read.format("graft-jsonl").load(out)
      assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sorted
        .toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")),
        "read-back must equal the MemoryStream input, exactly once")
      // exactly-once must be OBSERVABLE: per-epoch commit counters ride
      // StreamingQueryProgress.sink.metrics
      val sinkMetrics = q.recentProgress.flatMap(p =>
        Option(p.sink.metrics).map(_.asInstanceOf[java.util.Map[String, String]]))
        .lastOption.getOrElse(fail("no sink metrics in progress"))
      assert(sinkMetrics.get("epochsCommitted").toLong >= 2,
        s"expected >=2 committed epochs, got $sinkMetrics")
      assert(sinkMetrics.get("filesCommitted").toLong >= 2,
        s"expected committed files counted, got $sinkMetrics")
      // the zone sidecar must cover streaming-written files too (the
      // batch scan can then zone-skip a streamed corpus)
      assert(new java.io.File(out, "_stats.jsonl").exists(),
        "streaming commit must maintain the stats sidecar")
      val pruned = spark.read.format("graft-jsonl")
        .schema(StructType(Seq(StructField("id", LongType),
          StructField("name", StringType))))
        .load(out).filter("id > 100")
      assert(pruned.count() === 0)
    } finally q.stop()
  }

  test("maxFilesPerTrigger paces the custom stream: bounded epochs drain " +
      "the backlog, streaming write commits each exactly once") {
    val in = Files.createTempDirectory("jsonl_mfpt")
    def stage(name: String, ids: Range): Unit = {
      val tmp = in.resolve(s".$name.tmp")
      Files.write(tmp, ids.map(i => s"""{"id":$i}""").mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, in.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    stage("a.jsonl", 0 until 3)
    stage("b.jsonl", 3 until 6)
    stage("c.jsonl", 6 until 9)
    val schema = StructType(Seq(StructField("id", LongType)))
    val base = Files.createTempDirectory("jsonl_mfpt_out")
    val out = base.resolve("out").toString
    val q = spark.readStream.format("graft-jsonl").schema(schema)
      .option("maxFilesPerTrigger", 1).load(in.toString)
      .writeStream.format("graft-jsonl")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .start(out)
    try {
      q.processAllAvailable()
      val ids = spark.read.format("graft-jsonl").schema(schema).load(out)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === (0L until 9L), "paced drain must deliver every row once")
      val sm = q.recentProgress.flatMap(p => Option(p.sink.metrics)
        .map(_.asInstanceOf[java.util.Map[String, String]])).lastOption
        .getOrElse(fail("no sink metrics"))
      assert(sm.get("epochsCommitted").toLong >= 3,
        s"one file per trigger over 3 files must commit >=3 epochs: $sm")
    } finally q.stop()
  }

  test("streaming write replay: re-committing an epoch neither " +
      "duplicates files nor doubles rows; partial-rename crash converges") {
    val dir = Files.createTempDirectory("jsonl_sreplay").toString
    val schema = StructType(Seq(StructField("id", LongType)))
    val sw = new graft.sources.JsonLinesStreamingWrite(dir, schema)
    val factory = new graft.sources.JsonLinesStreamingWriterFactory(dir, schema)
    def writeEpoch(epoch: Long, ids: Seq[Long], taskId: Long) = {
      ids.zipWithIndex.groupBy(_._2 % 2).toSeq.sortBy(_._1).map {
        case (pid, rows) =>
          val w = factory.createWriter(pid, taskId, epoch)
          rows.foreach { case (id, _) =>
            w.write(org.apache.spark.sql.catalyst.InternalRow(id)) }
          w.commit()
      }.toArray
    }
    def visible() = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map(_.getName).sorted.toSeq
    sw.commit(0L, writeEpoch(0L, Seq(1L, 2L, 3L, 4L), taskId = 10L))
    val after1 = visible()
    // REPLAY epoch 0 (restart after crash post-commit): identical data,
    // new task attempts — the ledger must no-op the whole epoch
    sw.commit(0L, writeEpoch(0L, Seq(1L, 2L, 3L, 4L), taskId = 20L))
    assert(visible() === after1, "replayed epoch must not add or rename files")
    val rows = spark.read.format("graft-jsonl").schema(schema).load(dir)
    assert(rows.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L),
      "replayed epoch must not duplicate rows")
    // crash BETWEEN renames and ledger mark: epoch 1's partition 0 is
    // already finalized by a dead attempt; the replayed commit must
    // converge (keep it, finalize partition 1, no duplicates)
    val crashed = writeEpoch(1L, Seq(5L, 6L, 7L, 8L), taskId = 30L)
    val m0 = crashed(0).asInstanceOf[graft.sources.JsonLinesCommitMessage]
    // simulate the dead attempt's rename the way the connector does it
    // (Hadoop rename carries the local-FS .crc sibling along)
    val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    assert(lfs.rename(new org.apache.hadoop.fs.Path(m0.tempPath),
      new org.apache.hadoop.fs.Path(dir, m0.finalName)), "test rename failed")
    val replayed = writeEpoch(1L, Seq(5L, 6L, 7L, 8L), taskId = 40L) ++
      Array(crashed(1)) // partition 1's original message also retried
    sw.commit(1L, replayed)
    val all = spark.read.format("graft-jsonl").schema(schema).load(dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(all === (1L to 8L), s"convergent commit must yield 1..8, got $all")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.contains(".tmp-")),
      "no temp litter after convergent commit")
    // ledger is bounded and carries both epochs
    val led = graft.sources.JsonLinesEpochLog.read(
      org.apache.hadoop.fs.FileSystem.getLocal(
        new org.apache.hadoop.conf.Configuration()),
      new org.apache.hadoop.fs.Path(dir))
    assert(led.toSet === Set(0L, 1L), s"epoch ledger must track commits: $led")
  }

  test("scan metrics surface malformed-line drops and pushdown filtering") {
    val dir = writeLines(Seq(
      """{"id":1,"name":"a"}""",
      """broken line one""",
      """{"id":2,"name":"b"}""",
      """broken line two""",
      """{"id":3,"name":"c"}""",
      """{"id":4,"name":"d"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = spark.read.format("graft-jsonl").schema(schema)
      .load(dir.toString).filter("id >= 3")
    // execute THIS QueryExecution (count() would plan a separate one
    // whose metrics the assertions below never see)
    assert(df.collect().length === 2)
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    // metrics accumulate on the executed plan after the action
    assert(scan.metrics("malformedLines").value === 2,
      s"malformed-line drops must be visible, got ${scan.metrics}")
    assert(scan.metrics("filteredLines").value === 2,
      s"pushed-filter removals must be visible, got ${scan.metrics}")
  }

  test("zone-map stats skip whole files for provably-empty filters") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl_zonemap").resolve("out").toString
    // range partitioning gives the 4 files disjoint id ranges, the
    // layout zone maps reward
    (0 until 400).map(i => (i.toLong, s"row$i")).toDF("id", "name")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("id"))
      .write.format("graft-jsonl").mode("overwrite").save(dir)
    assert(new java.io.File(dir, "_stats.jsonl").exists(), "stats sidecar missing")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    def planned(filters: Array[Filter]): Int = {
      val sb = new graft.sources.JsonLinesSource()
        .getTable(schema, Array.empty, java.util.Map.of("path", dir))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
        .asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      sb.pushFilters(filters)
      sb.asInstanceOf[org.apache.spark.sql.connector.read.ScanBuilder]
        .build().toBatch.planInputPartitions().length
    }
    val all = planned(Array.empty)
    assert(all === 4, s"expected 4 single-split files, got $all")
    // one id -> exactly one file's zone can contain it
    assert(planned(Array(EqualTo("id", 5L))) === 1, "point lookup should prune to 1 file")
    // a range crossing one boundary -> 2 files
    assert(planned(Array(GreaterThanOrEqual("id", 350L))) <= 2,
      "tail range should prune the low files")
    // an impossible predicate -> zero files
    assert(planned(Array(GreaterThan("id", 10000L))) === 0,
      "out-of-domain filter should prune everything")
    // and the pruned read is still exact
    val got = spark.read.format("graft-jsonl").schema(schema).load(dir)
      .filter("id = 5").collect()
    assert(got.map(_.getString(1)).toSeq === Seq("row5"))
    // appends MERGE the sidecar: new file's zone joins the old ones
    Seq((10000L, "late")).toDF("id", "name")
      .write.format("graft-jsonl").mode("append").save(dir)
    assert(planned(Array(EqualTo("id", 10000L))) === 1,
      "append must extend the stats sidecar, not orphan it")
    assert(planned(Array(EqualTo("id", 5L))) === 1,
      "old zones must survive the append merge")
    // fractional literal vs Long zones: a truncating longValue() compare
    // would "prove" id < 0.5 empty for the lo=0 file (0 >= trunc(0.5))
    // and silently drop row 0 — exact BigDecimal compare keeps the file
    assert(planned(Array(LessThan("id", 0.5))) === 1,
      "fractional LessThan must keep the file holding id=0")
    val frac = spark.read.format("graft-jsonl").schema(schema).load(dir)
      .filter("id < 0.5").collect()
    assert(frac.map(_.getLong(0)).toSeq === Seq(0L),
      "row id=0 must survive fractional-literal pruning")
  }

  test("the source_jsonl_pruned oracle query actually skips files: " +
      "zone-map pruning fires on the engine-staged corpus") {
    val df = graft.operators.SourceOps.sourceJsonlPruned(
      spark, TestSpark.sfDir)
    assert(df.collect().length === 40, "doc_id < 40 selects 40 docs")
    // the sort makes AQE wrap the plan: the scan lives inside a
    // materialized query stage, not among executedPlan's direct leaves
    def findScan(p: org.apache.spark.sql.execution.SparkPlan):
        Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Some(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScan(q.plan)
        case other => other.children.view.flatMap(findScan(_)).headOption
      }
    val scan = findScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
    // 8 range-partitioned files, doc_id 0..499: the filter's rows live
    // in the first file only — zone skipping must drop most of the rest
    assert(scan.metrics("skippedFiles").value >= 6,
      s"zone-map skipping did not fire, got ${scan.metrics}")
  }

  test("zone maps key on the full path, never prune a same-named " +
      "external file by another directory's stats") {
    val base = Files.createTempDirectory("jsonl_zonekeys")
    val dirA = Files.createDirectory(base.resolve("a"))
    val dirB = Files.createDirectory(base.resolve("b"))
    def lines(dir: java.nio.file.Path, name: String, ids: Range): Unit =
      Files.write(dir.resolve(name),
        ids.map(i => s"""{"id":$i,"name":"row$i"}""").mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
    // externally-produced same-named files: A carries a stats sidecar,
    // B (same file NAME, different id range) has none
    lines(dirA, "part-000.jsonl", 0 to 9)
    Files.write(dirA.resolve("_stats.jsonl"),
      """{"file":"part-000.jsonl","fields":{"id":{"min":0,"max":9,"nulls":false},"name":{"min":"row0","max":"row9","nulls":false}}}"""
        .getBytes(StandardCharsets.UTF_8))
    lines(dirB, "part-000.jsonl", 100 to 109)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val got = spark.read.format("graft-jsonl").schema(schema)
      .load(dirA.toString, dirB.toString)
      .filter("id = 105").collect()
    assert(got.map(_.getString(1)).toSeq === Seq("row105"),
      "B's file must not be pruned by A's same-named zone entry")
    // and A's own pruning still works across the two-dir read
    val gotA = spark.read.format("graft-jsonl").schema(schema)
      .load(dirA.toString, dirB.toString)
      .filter("id = 5").collect()
    assert(gotA.map(_.getString(1)).toSeq === Seq("row5"))
  }

  test("connector feeds the streaming ingest pipeline: jsonl tail -> " +
      "cleanse -> bounded-state dedup") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val dir = Files.createTempDirectory("jsonl_ingest")
    def stage(name: String, rows: Seq[(Long, String, String, Long)]): Unit = {
      val lines = rows.map { case (id, text, lang, ts) =>
        s"""{"doc_id":$id,"text":"$text","lang":"$lang","ingest_s":$ts}"""
      }
      val tmp = dir.resolve(s".$name.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val good = (1 to 30).map(i => s"word$i").mkString(" ") // high quality
    stage("b0.jsonl", Seq(
      (1L, good, "en", 1000L),
      (2L, "a a a a a a a a a a a a a a a a a a a a", "en", 1001L), // junk
      (3L, good, "en", 1002L))) // duplicate fingerprint of doc 1
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("ingest_s", LongType)))
    val stream = spark.readStream.format("graft-jsonl").schema(schema)
      .load(dir.toString)
      .withColumn("ingest_ts", timestamp_seconds(col("ingest_s")))
      .drop("ingest_s")
    val q = graft.streaming.DocStreamJob.deduped(stream)
      .writeStream.format("memory").queryName("jsonl_ingest")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("jsonl_ingest_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.table("jsonl_ingest").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      // junk rejected by quality, duplicate dropped by fingerprint state
      assert(ids.toSeq === Seq(1L),
        s"expected only doc 1 to survive cleanse+dedup, got ${ids.toSeq}")
      stage("b1.jsonl", Seq((4L, (40 to 70).map(i => s"tok$i").mkString(" "), "de", 1003L)))
      q.processAllAvailable()
      val after = spark.table("jsonl_ingest").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(after.toSeq === Seq(1L, 4L),
        s"appended file must flow through the same pipeline, got ${after.toSeq}")
    } finally q.stop()
  }

  test("end-to-end oracle query: connector result equals parquet ground truth") {
    val df = SourceOps.sourceJsonlScan(spark, TestSpark.sfDir)
    val viaParquet = Tables.documents(spark, TestSpark.sfDir)
      .filter("n_chars >= 200 AND lang IN ('en','de')")
      .selectExpr("doc_id", "lang", "n_chars")
      .collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    val viaJsonl = df.collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    assert(viaJsonl.length > 0, "filter must keep some fixture rows")
    assert(viaJsonl.toSeq === viaParquet.toSeq)
  }

  test("bloom sidecar: deterministic probes, no false negatives, and " +
      "provable absence for unwritten keys") {
    import graft.sources.JsonLinesBloom
    val bits = new Array[Long](JsonLinesBloom.Words)
    (0L until 500L).foreach(v => JsonLinesBloom.add(bits, v))
    val vec = bits.toVector
    // every inserted key must read back as maybe-present (no false
    // negatives — that would wrongly skip a file holding the key)
    (0L until 500L).foreach(v =>
      assert(JsonLinesBloom.mightContain(vec, v).contains(true),
        s"false negative for $v"))
    // values far outside the inserted set: the overwhelming majority
    // must be provably absent (fpp ~1e-5 at this fill)
    val absent = (100000L until 101000L)
      .count(v => JsonLinesBloom.mightContain(vec, v).contains(false))
    assert(absent >= 990, s"only $absent/1000 unwritten keys proved absent")
    // unbloomable shapes prove nothing
    assert(JsonLinesBloom.mightContain(vec, 3.14d).isEmpty)
    assert(JsonLinesBloom.mightContain(vec, true).isEmpty)
    // int/long canonical forms agree (pushed literals vary by planner)
    val sb = new Array[Long](JsonLinesBloom.Words)
    JsonLinesBloom.add(sb, 42L)
    assert(JsonLinesBloom.mightContain(sb.toVector, 42).contains(true))
  }

  test("the source_jsonl_bloom oracle query actually skips files: " +
      "bloom pruning fires where zone min/max is structurally blind") {
    val df = graft.operators.SourceOps.sourceJsonlBloom(
      spark, TestSpark.sfDir)
    assert(df.collect().length === 3, "3 point-lookup docs expected")
    def findScan(p: org.apache.spark.sql.execution.SparkPlan):
        Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Some(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScan(q.plan)
        case other => other.children.view.flatMap(findScan(_)).headOption
      }
    val scan = findScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
    // 8 hash-partitioned files: the 3 probed ids live in at most 3, so
    // blooms must skip at least 5 — zone min/max alone would skip none
    // (every file's doc_id zone spans nearly the whole domain)
    assert(scan.metrics("skippedFiles").value >= 5,
      s"bloom skipping did not fire, got ${scan.metrics}")
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered metadata-only from " +
      "the sidecar; a filtered twin falls back to a real scan") {
    val df = graft.operators.SourceOps.sourceJsonlAgg(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"aggregation was not pushed into the scan:\n$plan")
    assert(plan.contains("metadata-only"),
      s"scan is not the metadata-only shape:\n$plan")
    // values must equal a real scan of the same staged files
    val viaParquet = Tables.documents(spark, TestSpark.sfDir)
      .selectExpr("count(1)", "min(doc_id)", "max(doc_id)",
        "min(n_chars)", "max(n_chars)", "min(lang)", "max(lang)").head()
    assert(df.head() === viaParquet,
      "metadata-only answer diverges from ground truth")
    // negative: a pushed filter must decline the aggregate push (the
    // sidecar cannot answer a filtered count) and still compute
    // correctly through the normal scan
    val staged = graft.operators.SourceOps.stagedZonedJsonl(
      spark, TestSpark.sfDir)
    val filtered = spark.read.format("graft-jsonl")
      .schema(graft.operators.SourceOps.documentsSchema)
      .load(staged)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 40)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(!fplan.contains("metadata-only"),
      s"filtered aggregate must not take the metadata path:\n$fplan")
    assert(filtered.head().getLong(0) === 40L,
      "filtered fallback computed the wrong count")
  }

  test("runtime filtering: a broadcast-join build side prunes connector " +
      "files mid-query (the DSv2 dynamic-pruning hook)") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val staged = graft.operators.SourceOps.stagedZonedJsonl(
      spark, TestSpark.sfDir)
    val fact = spark.read.format("graft-jsonl")
      .schema(graft.operators.SourceOps.documentsSchema).load(staged)
    import spark.implicits._
    // a selective predicate on the build side arms the planner's
    // runtime-filter injection — and it must survive optimization, so
    // the dim comes from parquet (a LocalRelation filter constant-folds
    // away and disarms the rule)
    val dimPath = Files.createTempDirectory("jsonl_rf_dim").toString
    Seq((3L, "a"), (17L, "a"), (9999L, "drop"))
      .toDF("k", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "a")
    val joined = fact.join(broadcast(dim), col("doc_id") === col("k"))
      .select(col("doc_id"), col("tag"))
    val rows = joined.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(3L, 17L))
    def findScan(p: org.apache.spark.sql.execution.SparkPlan):
        Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Some(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScan(q.plan)
        case other => other.children.view.flatMap(findScan(_)).headOption
      }
    val scan = findScan(joined.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.runtimeFilters.nonEmpty,
      s"planner injected no runtime filter:\n" +
        joined.queryExecution.executedPlan)
    // both build keys live in the first of 8 range-partitioned files:
    // the runtime IN-list must zone-skip most of the rest
    assert(scan.metrics("skippedFiles").value >= 6,
      s"runtime file skipping did not fire, got ${scan.metrics}")
  }

  test("limit pushdown: a head-probe stops each reader early and still " +
      "returns correct rows") {
    val staged = graft.operators.SourceOps.stagedZonedJsonl(
      spark, TestSpark.sfDir)
    val df = spark.read.format("graft-jsonl")
      .schema(graft.operators.SourceOps.documentsSchema)
      .load(staged).select("doc_id").limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 7"),
      s"limit was not pushed into the scan:\n$plan")
    val got = df.collect()
    assert(got.length === 7, s"limit returned ${got.length} rows")
    // the rows must be real corpus rows (ids within the staged domain)
    val valid = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => valid.contains(r.getLong(0))))
    // a limit larger than the corpus must not truncate anything
    val all = spark.read.format("graft-jsonl")
      .schema(graft.operators.SourceOps.documentsSchema)
      .load(staged).limit(100000).count()
    assert(all === valid.size.toLong, "over-large limit dropped rows")
  }

  test("partition discovery: a lang predicate prunes whole directories " +
      "before a byte is read; values overlay from the path") {
    import org.apache.spark.sql.functions.col
    val staged = graft.operators.SourceOps.stagedPartitionedJsonl(
      spark, TestSpark.sfDir)
    val df = spark.read.format("graft-jsonl")
      .schema(graft.operators.SourceOps.documentsSchema)
      .option("partition.discovery", "true")
      .load(staged)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("lang"))
    val rows = df.collect()
    val expected = Tables.documents(spark, TestSpark.sfDir)
      .filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(rows.map(_.getLong(0)).sorted.toSeq === expected.toSeq)
    assert(rows.forall(_.getString(1) == "en"))
    def findScan(p: org.apache.spark.sql.execution.SparkPlan):
        Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Some(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScan(q.plan)
        case other => other.children.view.flatMap(findScan(_)).headOption
      }
    val scan = findScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
    // 5 lang dirs x 2 files: the 8 non-en files must be dir-pruned
    assert(scan.metrics("skippedFiles").value >= 8,
      s"partition pruning did not fire, got ${scan.metrics}")
  }

  test("statistics: a connector-written corpus reports an exact row " +
      "count to Catalyst from the sidecar") {
    val staged = graft.operators.SourceOps.stagedZonedJsonl(
      spark, TestSpark.sfDir)
    val df = spark.read.format("graft-jsonl")
      .schema(graft.operators.SourceOps.documentsSchema).load(staged)
    val stats = df.queryExecution.optimizedPlan.stats
    val nDocs = Tables.documents(spark, TestSpark.sfDir).count()
    assert(stats.rowCount.contains(BigInt(nDocs)),
      s"expected exact rowCount $nDocs from sidecar, got ${stats.rowCount}")
  }

  test("a corrupt sidecar line loses only its own entry: the intact " +
      "entry still prunes, the corrupt one's file still scans") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("jsonl_torn_sidecar")
    def jl(name: String, ids: Range): Unit =
      Files.write(dir.resolve(name),
        ids.map(i => s"""{"id":$i}""").mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    jl("a.jsonl", 0 until 10)    // intact sidecar entry, zone [0,9]
    jl("b.jsonl", 100 until 110) // its sidecar line is TORN
    Files.write(dir.resolve("_stats.jsonl"),
      ("""{"file":"a.jsonl","rows":10,"fields":{"id":{"min":0,"max":9,"nulls":false}}}""" + "\n" +
       """{"file":"b.jsonl","rows":10,"fie""" + "\n") // torn mid-write
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val df = spark.read.format("graft-jsonl").schema(schema)
      .load(dir.toString).filter(col("id") >= 100)
    // correctness: b's rows (no trusted zone) must all surface
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ===
      (100L until 110L).toSeq)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan):
        Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Some(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScan(q.plan)
        case other => other.children.view.flatMap(findScan(_)).headOption
      }
    // optimization survives partial corruption: a's intact zone still
    // proves id >= 100 empty, so exactly one file is skipped
    val scan = findScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.metrics("skippedFiles").value === 1L,
      s"intact sidecar entry should still prune, got ${scan.metrics}")
  }
}
