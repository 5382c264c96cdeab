package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MaintenanceOps

/** Compaction rewrites a fragmented parquet directory into few files
  * without a shuffle and without changing the data.
  */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("compact merges a 64-file directory into few files, data unchanged") {
    val frag = Files.createTempDirectory("frag").toString
    val compacted = Files.createTempDirectory("compacted").toString
    val src = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    src.repartition(64).write.mode("overwrite").parquet(frag)
    val before = MaintenanceOps.fileStats(spark, frag).head()
    assert(before.getAs[Long]("n_files") == 64)

    val written = MaintenanceOps.compact(spark, frag, compacted)
    val after = MaintenanceOps.fileStats(spark, compacted).head()
    assert(after.getAs[Long]("n_files") == written.toLong)
    assert(written < 8, s"expected few output files, wrote $written")
    assert(after.getAs[Long]("n_rows") == before.getAs[Long]("n_rows"))
    // content identical, not just counts
    assert(spark.read.parquet(compacted).exceptAll(src).isEmpty)
  }

  test("compact ignores stale _temporary dirs from aborted writes") {
    val dir = Files.createTempDirectory("frag_tmp").toString
    val out = Files.createTempDirectory("compacted_tmp").toString
    spark.range(1000).toDF("id").write.mode("overwrite").parquet(dir)
    // simulate an aborted prior write: a large orphan part file with an
    // ordinary leaf name under _temporary/ — only the directory component
    // marks it as dead
    new java.io.File(s"$dir/_temporary/0").mkdirs()
    val junk = new java.io.FileOutputStream(s"$dir/_temporary/0/part-junk")
    junk.write(new Array[Byte](8 << 20)); junk.close()
    // 8 MB of junk vs ~KB of live data: counting the junk would force
    // multiple output files at a 4 MB target
    val written = MaintenanceOps.compact(spark, dir, out, targetFileBytes = 4L << 20)
    assert(written == 1, s"stale _temporary bytes inflated the file count: $written")
  }

  test("compact splits oversized files via repartition fallback " +
      "(coalesce cannot raise partition count)") {
    val big = Files.createTempDirectory("big").toString
    val split = Files.createTempDirectory("split").toString
    val src = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    src.coalesce(1).write.mode("overwrite").parquet(big)
    // tiny target forces more output files than the single input file
    val written = MaintenanceOps.compact(spark, big, split, targetFileBytes = 16L << 10)
    assert(written > 1, s"expected a split, wrote $written file(s)")
    val after = MaintenanceOps.fileStats(spark, split).head()
    assert(after.getAs[Long]("n_files") == written.toLong)
    assert(spark.read.parquet(split).exceptAll(src).isEmpty)
  }

  test("compact on many small files honors the returned count (unpadded " +
      "scan-partition lower bound: open-cost padding must not fake " +
      "coalesce headroom)") {
    val frag = Files.createTempDirectory("frag_small").toString
    val out = Files.createTempDirectory("sized_small").toString
    // 64 tiny files: real bytes ~1 MB but open-cost padding adds 256 MB,
    // so the r9 padded "lower bound" claimed ~64 scan partitions while
    // the real scan packs everything into 1 — coalesce(n) then capped
    // silently and wrote fewer files than it returned
    spark.range(200000).toDF("id")
      .repartition(64).write.mode("overwrite").parquet(frag)
    val path = new org.apache.hadoop.fs.Path(frag)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inBytes = fs.listStatus(path).filter(_.isFile)
      .filterNot(s => s.getPath.getName.startsWith("_")).map(_.getLen).sum
    // target = a third of the input -> n = 3, far below the padded
    // pseudo-bound but above the true one (1): must take the repartition
    // branch and actually write 3 files
    val written = MaintenanceOps.compact(spark, frag, out,
      targetFileBytes = (inBytes + 2) / 3)
    assert(written == 3, s"expected 3 target-sized files, computed $written")
    val after = MaintenanceOps.fileStats(spark, out).head()
    assert(after.getAs[Long]("n_files") == written.toLong,
      s"returned $written but wrote ${after.getAs[Long]("n_files")} file(s)")
  }

  test("compact output files land near the byte target (on-disk sizing, " +
      "not the optimizer's in-memory estimate)") {
    val frag = Files.createTempDirectory("frag3").toString
    val out = Files.createTempDirectory("sized").toString
    spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .repartition(32).write.mode("overwrite").parquet(frag)
    val path = new org.apache.hadoop.fs.Path(frag)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inBytes = fs.listStatus(path).filter(_.isFile)
      .filterNot(s => s.getPath.getName.startsWith("_")).map(_.getLen).sum
    // target = half the on-disk input (rounded UP so odd totals still
    // give ceil(in/target) = 2) -> expect 2 output files; the old
    // in-memory estimate (several x larger) would have written 4+
    val written = MaintenanceOps.compact(spark, frag, out,
      targetFileBytes = (inBytes + 1) / 2)
    assert(written == 2, s"expected 2 size-targeted files, wrote $written")
  }

  test("compact plans no shuffle (coalesce narrows)") {
    val frag = Files.createTempDirectory("frag2").toString
    spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      .repartition(8).write.mode("overwrite").parquet(frag)
    val plan = spark.read.parquet(frag).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction plan shuffles:\n$plan")
  }

  test("curation layout: lang-partitioned, doc_id-bucketed, read-back " +
      "identical (the production handoff shape)") {
    import org.apache.spark.sql.functions._
    val nBuckets = 4
    val out = Files.createTempDirectory("curated_layout").toString
    MaintenanceOps.writeCurationLayout(spark, TestSpark.sfDirMid, out, nBuckets)

    // declared layout on disk: one lang=... directory per language
    val path = new org.apache.hadoop.fs.Path(out)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val langDirs = fs.listStatus(path).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("lang="))
    assert(langDirs.nonEmpty, "no lang partitions written")
    // each lang dir holds at most nBuckets files (one per bucket task)
    langDirs.foreach { d =>
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/$d"))
        .filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
      assert(files.nonEmpty && files.length <= nBuckets,
        s"$d has ${files.length} files, expected 1..$nBuckets")
    }

    // bucket contract: within every file, hash(doc_id) % nBuckets is
    // CONSTANT (repartition's HashPartitioning is pmod(murmur3, n), the
    // same function as SQL hash()) — the property co-located joins need
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("file"))
      .agg(countDistinct(pmod(hash(col("doc_id")), lit(nBuckets))).as("n_buckets"))
    assert(perFile.filter(col("n_buckets") =!= 1).count() == 0,
      "a file mixes doc_id buckets — layout not bucketed")

    // partition pruning: a lang filter SCANS only that lang's directory
    // (inputFiles is pre-filter, so inspect the scan's selected
    // partitions instead)
    val l0 = langDirs.head.stripPrefix("lang=")
    val prunedDf = spark.read.parquet(out).filter(col("lang") === l0)
    prunedDf.collect()
    val scan = prunedDf.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the pruned plan"))
    val scanned = scan.selectedPartitions.toPartitionArray
      .map(_.urlEncodedPath).toSeq
    assert(scanned.nonEmpty && scanned.forall(_.contains(s"lang=$l0")),
      s"lang=$l0 filter scanned outside its partition: ${scanned.toSeq}")

    // read-back equals the manifest the curation query computes
    val back = spark.read.parquet(out)
      .select("doc_id", "lang", "n_tokens", "quality")
    val direct = graft.operators.TextOps.corpusCuration(spark, TestSpark.sfDirMid)
      .select("doc_id", "lang", "n_tokens", "quality")
    assert(back.exceptAll(direct).isEmpty && direct.exceptAll(back).isEmpty,
      "layout round-trip changed the manifest")
  }

  test("ANN layout: one file per cell directory, probe search equals the " +
      "in-session IVF, static cell reads prune at planning time") {
    import org.apache.spark.sql.functions.col
    import graft.operators.SimilarityOps
    val out = Files.createTempDirectory("ann_layout").toString
    val dir = TestSpark.sfDir
    val nlist = MaintenanceOps.writeAnnLayout(spark, dir, out)

    // layout contract: exactly nlist cell=K directories, one file each
    val cellDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length == nlist,
      s"expected $nlist cell dirs, found ${cellDirs.length}")
    cellDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length == 1,
        s"${d.getName} has ${parts.length} files (want 1 per cell)")
    }

    // the persisted assignment is exactly the in-memory one
    val e = graft.Tables.embeddings(spark, dir)
    val mem = SimilarityOps.assignCells(e, SimilarityOps.seedCodebook(e, nlist))
      .select(col("vec_id"), col("cell").cast("int").as("cell"))
    val disk = spark.read.parquet(out)
      .select(col("vec_id"), col("cell").cast("int").as("cell"))
    assert(disk.exceptAll(mem).isEmpty && mem.exceptAll(disk).isEmpty,
      "persisted cell assignment differs from assignCells")

    // probe search over the layout returns the same top-k as the
    // in-session staged-assignment path (same codebook, same nprobe)
    val cb = SimilarityOps.seedCodebook(e, nlist)
    val queries = e.filter(col("vec_id") < SimilarityOps.NumQueries)
    val fromDisk = MaintenanceOps.probeAnnLayout(spark, out, queries, cb,
      SimilarityOps.nprobeFor(nlist), SimilarityOps.TopK)
    val inMem = SimilarityOps.queries("sim_ivf_topk")(spark, dir)
    assert(fromDisk.exceptAll(inMem).isEmpty && inMem.exceptAll(fromDisk).isEmpty,
      "layout-served IVF differs from the in-session search")

    // static cell list: planning-time partition pruning on the scan
    val pruned = MaintenanceOps.readAnnCells(spark, out, Seq(0, 1))
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"no partition pruning on the cell scan:\n$plan")
    val scanned = pruned.select(
      org.apache.spark.sql.functions.input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty &&
      scanned.forall(f => f.contains("cell=0") || f.contains("cell=1")),
      s"cell filter scanned outside its directories: ${scanned.toSeq}")
  }

  test("applyChanges merges upserts and deletes into the next table " +
      "version, and diffSnapshots over the two versions reports exactly " +
      "the applied change set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val baseDir = Files.createTempDirectory("cdc_base").toString
    val nextDir = Files.createTempDirectory("cdc_next").toString
    Seq((1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "de"))
      .toDF("doc_id", "text", "lang").write.mode("overwrite").parquet(baseDir)
    val changes = Seq(
      (2L, "upsert", "beta v2", "en"),   // update
      (3L, "delete", null: String, null: String),
      (4L, "upsert", "delta", "fr"))     // insert
      .toDF("doc_id", "op", "text", "lang")
    val n = MaintenanceOps.applyChanges(spark, baseDir, changes, nextDir)
    assert(n == 3, s"next version has $n rows, want 3")
    val next = spark.read.parquet(nextDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(next == Map(1L -> "alpha", 2L -> "beta v2", 4L -> "delta"),
      s"unexpected merge result: $next")
    // round-trip: diffing the two versions recovers the change set
    val d = graft.operators.DedupOps.diffSnapshots(
        spark.read.parquet(baseDir), spark.read.parquet(nextDir))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      s"diff does not recover the applied changes: $d")
    // the survivor scan is an anti join, never a cartesian
    val plan = spark.read.parquet(baseDir)
      .join(changes.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("z-order layout narrows per-file min/max spans on BOTH columns; " +
      "a single-column sort leaves the second column unskippable") {
    import org.apache.spark.sql.functions.{avg, col}
    val src = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val zDir = Files.createTempDirectory("zorder").toString
    val sDir = Files.createTempDirectory("sorted").toString
    val nFiles = 16

    MaintenanceOps.writeZOrdered(spark, src, zDir, "l_orderkey", "l_partkey", nFiles)
    // baseline: perfect single-column clustering on l_orderkey
    src.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(sDir)

    def meanSpan(dir: String, c: String): Double =
      MaintenanceOps.fileSpanStats(spark, dir, c)
        .agg(avg(col("span"))).head().getDouble(0)

    val zK = meanSpan(zDir, "l_orderkey"); val zP = meanSpan(zDir, "l_partkey")
    val sK = meanSpan(sDir, "l_orderkey"); val sP = meanSpan(sDir, "l_partkey")
    info(f"z-order spans: orderkey $zK%.2f partkey $zP%.2f; " +
      f"sorted: orderkey $sK%.2f partkey $sP%.2f")
    // the sorted baseline: near-perfect on the sort column, useless on
    // the other (every file spans ~the whole partkey domain)
    assert(sP >= 0.8, f"baseline partkey span $sP%.2f — fixture too clustered to test")
    // z-order: BOTH columns skippable — each file covers a bounded cell
    // of the 2-D domain (4x4 grid at 16 files => ~0.25 ideal; generous
    // bounds absorb bucket-boundary straddle and data skew)
    assert(zK <= 0.6 && zP <= 0.6,
      f"z-order spans not bounded in both dims: orderkey $zK%.2f, partkey $zP%.2f")
    // and it must beat the baseline's unsorted dimension by a wide margin
    assert(zP <= 0.7 * sP,
      f"z-order partkey span $zP%.2f not better than unclustered $sP%.2f")

    // rewrite is a permutation: no rows gained or lost
    val back = spark.read.parquet(zDir)
    assert(back.count() == src.count() &&
      back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "z-order rewrite changed the data")
  }

  test("incremental rollup maintenance equals a from-scratch rebuild " +
      "across adds, removes, and changes") {
    import org.apache.spark.sql.functions._
    val cur = Tables.documents(spark, TestSpark.sfDir)
    // the same deterministic previous-snapshot derivation the
    // corpus_snapshot_diff oracle uses: %7 docs are new since prev,
    // %5 docs changed (prev carried an extra trailing token)
    val prev = cur.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" prevtail")))
          .otherwise(col("text")))
    // change batch of signed row images: adds carry the new text,
    // removes the old; a changed doc contributes one of each
    val nTok = size(split(col("text"), " ")).cast("long")
    val adds = cur.join(prev.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("lang"), nTok.as("n_tokens"), lit("add").as("op"))
    val chgOld = prev.filter(col("doc_id") % 5 === 0)
      .select(col("lang"), nTok.as("n_tokens"), lit("remove").as("op"))
    val chgNew = cur.filter(col("doc_id") % 5 === 0 && col("doc_id") % 7 =!= 0)
      .select(col("lang"), nTok.as("n_tokens"), lit("add").as("op"))
    val changes = adds.unionByName(chgOld).unionByName(chgNew)
    val maintained = MaintenanceOps.maintainRollup(
      MaintenanceOps.buildRollup(prev), changes)
    val rebuilt = MaintenanceOps.buildRollup(cur)
    assert(maintained.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(maintained).isEmpty,
      s"maintained rollup diverged from rebuild:\n" +
        s"maintained ${maintained.collect().toSeq}\n" +
        s"rebuilt ${rebuilt.collect().toSeq}")
    // a batch that empties a key drops the key from the rollup
    import spark.implicits._
    val tiny = Seq(("xx", 1L, 10L)).toDF("lang", "n_docs", "total_tokens")
    val wipe = Seq(("xx", 10L, "remove")).toDF("lang", "n_tokens", "op")
    assert(MaintenanceOps.maintainRollup(tiny, wipe).count() == 0,
      "emptied key not dropped")
  }
}
