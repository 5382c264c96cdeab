package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-based-warehouse maintenance: the small-file problem is the #1
  * operational failure mode of a 100 TB parquet lake (every file is a
  * task + a footer fetch; millions of KB-sized files stall the driver
  * and the scan). These utilities keep table layout healthy; they are
  * operational tools, not queries, so they are ScalaTest-covered rather
  * than oracle-checked.
  */
object MaintenanceOps {

  /** Per-file layout stats for a parquet directory: files, rows per
    * file, skew. Uses `input_file_name` so the stats come from one scan
    * with no extra metadata pass.
    */
  def fileStats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        min(col("n_rows")).as("min_rows_per_file"),
        max(col("n_rows")).as("max_rows_per_file"))

  /** Write the curation manifest in the production handoff layout a
    * training-data pipeline emits at 100 TB: PARTITIONED by lang
    * (directory-level pruning for per-language consumers) and manually
    * BUCKETED by doc_id — `repartition(nBuckets, doc_id)` is the
    * DataFrame form of DISTRIBUTE BY, so every doc_id lands in exactly
    * one task = one file per lang directory. NOTE plain parquet carries
    * no bucketing metadata: readers get the co-located-join benefit only
    * by re-declaring the layout (external-table DDL with bucket spec, or
    * re-hashing on read) — Spark will NOT infer it from the files.
    * Rows are sorted within partitions (lang, doc_id) so each
    * file is internally ordered (run-length-friendly encoding, readers
    * can merge-join). Plain `.parquet` bucketing-by-hand is used instead
    * of `bucketBy` because the latter requires a metastore table; the
    * layout contract (hash(doc_id) % nBuckets constant per file) is
    * asserted in MaintenanceSpec.
    */
  def writeCurationLayout(spark: SparkSession, dir: String, outDir: String,
      nBuckets: Int = 4): Unit =
    TextOps.corpusCuration(spark, dir)
      .repartition(nBuckets, col("doc_id"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.mode("overwrite").partitionBy("lang").parquet(outDir)

  /** Rewrite a parquet directory into ~`targetFileBytes` output files.
    * The file count comes from the ACTUAL on-disk byte total (filesystem
    * listing) — the optimizer's `stats.sizeInBytes` is an in-memory /
    * uncompressed estimate, typically several times the parquet size,
    * which would undershoot the target. `coalesce` narrows partitions
    * without a shuffle (the IO-bound common case: many small files →
    * few); when the target needs MORE partitions than the scan provides
    * (a few huge files that must split), coalesce cannot raise the
    * count, so fall back to `repartition` and pay the one shuffle.
    * Returns the file count written.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20): Int = {
    val df = spark.read.parquet(inDir)
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive: partitioned datasets keep their files in key=value
    // subdirectories, which a flat listing would sum to zero bytes
    var bytes = 0L
    var nFiles = 0L
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val base = fs.makeQualified(path).toString
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val s = it.next()
      // skip EVERY component under the base starting with '_' or '.' —
      // a part file under a stale _temporary/ dir (aborted prior write)
      // has an ordinary leaf name but must not count toward the total
      val rel = s.getPath.toString.stripPrefix(base)
      if (!rel.split('/').exists(c => c.startsWith("_") || c.startsWith("."))) {
        bytes += s.getLen
        nFiles += 1
      }
    }
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes.toDouble).toInt)
    // coalesce(n) cannot RAISE the partition count above the scan's, so it
    // is only safe when n is at or below a LOWER bound on the scan's
    // partition count. Spark's greedy packing closes a partition when the
    // open-cost-PADDED running size plus the next split would exceed
    // maxSplitBytes = min(maxPartitionBytes, max(openCost, bytesPerCore)),
    // so the REAL bytes in any packed partition never exceed maxSplitBytes
    // (padded >= real at the admission check) — the true lower bound on
    // the scan's partition count is the UNPADDED ceil(bytes/maxSplitBytes).
    // Padding the numerator (the r9 bug) turned this into an OVERestimate:
    // one small file "lower-bounded" to 2 partitions, coalesce(2) silently
    // capped at the actual 1, and the returned count lied. bytesPerCore
    // still uses the padded total and minPartitionNum, matching
    // FilePartition.maxSplitBytes exactly.
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    val padded = bytes + nFiles * openCost
    val minPartitionNum = spark.sessionState.conf.filesMinPartitionNum
      .getOrElse(spark.sessionState.conf
        .getConf(org.apache.spark.sql.internal.SQLConf.LEAF_NODE_DEFAULT_PARALLELISM)
        .getOrElse(spark.sparkContext.defaultParallelism))
    val bytesPerCore = padded / math.max(1, minPartitionNum)
    val maxSplitBytes = math.min(maxSplit, math.max(openCost, bytesPerCore))
    val scanPartsLo =
      math.max(1L, (bytes + maxSplitBytes - 1) / math.max(1L, maxSplitBytes))
    val sized = if (n <= scanPartsLo) df.coalesce(n) else df.repartition(n)
    sized.write.mode("overwrite").parquet(outDir)
    n
  }

  /** Persist the IVF vector index as a CELL-PARTITIONED parquet layout —
    * the on-disk form a vector store takes at 100 TB: one directory per
    * codebook cell (`cell=K/`), vectors for a cell grouped into one file
    * (`repartition(col("cell"))` routes each cell to exactly one task,
    * so the dynamic-partition write emits one file per directory, and
    * cells are ~n/nlist rows — file sizes stay uniform as the corpus
    * grows). A probe query then READS only its nprobe directories:
    * the nprobe/nlist scan reduction the in-session IVF search does in
    * memory happens at the file-listing level instead, which is the
    * entire point of persisting an index. Returns nlist.
    */
  def writeAnnLayout(spark: SparkSession, dir: String, outDir: String): Int = {
    val e = graft.Tables.embeddings(spark, dir)
    val nlist = SimilarityOps.nlistFor(e.count())
    SimilarityOps.assignCells(e, SimilarityOps.seedCodebook(e, nlist))
      .select(col("vec_id"), col("embedding"), col("cell"))
      .repartition(col("cell"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(outDir)
    nlist
  }

  /** IVF top-k served FROM the persisted layout: the probe join keys on
    * the PARTITION column, so Spark's dynamic partition pruning can
    * drop unprobed cell directories at runtime (the broadcast probe
    * side carries the nprobe cells); with a pre-computed cell list use
    * [[readAnnCells]] for plan-time static pruning instead. Results are
    * identical to the in-session `sim_ivf_topk` over the same codebook —
    * asserted in MaintenanceSpec.
    */
  def probeAnnLayout(spark: SparkSession, layoutDir: String,
      queries: DataFrame, codebook: DataFrame, nprobe: Int, k: Int): DataFrame =
    SimilarityOps.ivfSearchAssigned(spark.read.parquet(layoutDir),
      queries, codebook, nprobe, k)

  /** Static-pruned scan of an explicit cell list — the "index lookup"
    * client shape: the cell filter is literal, so pruning happens at
    * PLANNING time (PartitionFilters on the scan; only the listed
    * directories are ever touched by the file listing).
    */
  def readAnnCells(spark: SparkSession, layoutDir: String,
      cells: Seq[Int]): DataFrame =
    spark.read.parquet(layoutDir).filter(col("cell").isin(cells: _*))

  // The Morton interleave is the native codegen'd
  // graft.functions.ZInterleave expression — one definition of the bit
  // layout, shared with the events_zorder oracle query; a single
  // generated loop instead of a 16-term expression tree.

  /** Z-ORDER layout rewrite — multi-dimensional clustering for min/max
    * data skipping (the `OPTIMIZE ZORDER BY` primitive of lakehouse
    * table formats): both columns min-max-normalize to 16-bit buckets
    * (the min/max row is a broadcast O(1) side, no driver collect), the
    * Morton interleave of the buckets becomes the sort key, and a range
    * repartition + in-partition sort writes `nFiles` files whose
    * footer min/max statistics are NARROW IN BOTH COLUMNS at once — a
    * single-column sort gives perfect skipping on that column and none
    * on the other; the Z-curve trades to ~sqrt(nFiles) selectivity on
    * EACH. At warehouse scale this is the difference between a
    * two-predicate scan touching every file and touching
    * ~1/sqrt(nFiles) of them per dimension. The range exchange is the
    * one shuffle, same as any global re-sort.
    */
  def writeZOrdered(spark: SparkSession, inDf: DataFrame, outDir: String,
      c1: String, c2: String, nFiles: Int): Unit = {
    graft.functions.ZInterleave.register(spark)
    val mm = inDf.agg(
      min(col(c1)).cast("double").as("min1"), max(col(c1)).cast("double").as("max1"),
      min(col(c2)).cast("double").as("min2"), max(col(c2)).cast("double").as("max2"))
    val bucket = (c: Column, lo: Column, hi: Column) =>
      ((c.cast("double") - lo) / greatest(hi - lo, lit(1e-12)) * 65535.0)
        .cast("long")
    inDf.crossJoin(broadcast(mm))
      .withColumn("zb1", bucket(col(c1), col("min1"), col("max1")))
      .withColumn("zb2", bucket(col(c2), col("min2"), col("max2")))
      .withColumn("z", expr("z_interleave16(zb1, zb2)"))
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z", "zb1", "zb2", "min1", "max1", "min2", "max2")
      .write.mode("overwrite").parquet(outDir)
  }

  /** MERGE-style change application — the batch CDC primitive that
    * complements [[graft.operators.DedupOps.diffSnapshots]] (diff
    * detects, this applies): `changes` carries (key, op, payload...)
    * with op in {upsert, delete}; surviving base rows are found with an
    * ANTI join on the change keys (one key shuffle, no wide full-outer
    * row construction), upserts are unioned in, and the result is
    * written as the next table version. Last-writer-wins within a
    * change batch is the caller's contract (dedupe the batch first if
    * ops can conflict). Returns the new version's row count.
    */
  def applyChanges(spark: SparkSession, baseDir: String, changes: DataFrame,
      outDir: String, key: String = "doc_id"): Long = {
    val base = spark.read.parquet(baseDir)
    val survivors = base.join(
      changes.select(col(key)).distinct(), Seq(key), "left_anti")
    val upserts = changes.filter(col("op") === "upsert")
      .select(base.columns.map(col): _*)
    val next = survivors.unionByName(upserts)
    next.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** Incremental view maintenance for a distributive per-key rollup —
    * the primitive that keeps a 100 TB corpus's summary tables current
    * without rescanning the corpus: given the previous rollup
    * (key, n_docs, total_tokens) and a change batch of signed row
    * images (`op` = add/remove; a changed doc is remove(old image) +
    * add(new image), exactly what [[graft.operators.DedupOps.diffSnapshots]]
    * classifies), the new rollup is prev + the batch's per-key deltas.
    * Cost scales with the CHANGE BATCH, never the corpus: one
    * key-bounded delta aggregation and a full-outer join against a
    * rollup whose row count is the key cardinality (AQE broadcasts it).
    * Keys whose count reaches zero drop out, new keys appear — the
    * full-outer join covers both edges. Works for any distributive
    * aggregate (counts, sums); avg/percentiles need their
    * sum+count/sketch forms.
    */
  def maintainRollup(prev: DataFrame, changes: DataFrame,
      key: String = "lang"): DataFrame = {
    val sign = when(col("op") === "add", lit(1L)).otherwise(lit(-1L))
    val delta = changes.groupBy(col(key))
      .agg(sum(sign).as("d_docs"),
        sum(sign * col("n_tokens")).as("d_tokens"))
    prev.join(delta, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("d_docs"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("total_tokens"), lit(0L))
          + coalesce(col("d_tokens"), lit(0L))).as("total_tokens"))
      .filter(col("n_docs") > 0)
  }

  /** The rollup [[maintainRollup]] maintains, computed from scratch —
    * the parity baseline and the bootstrap for a fresh table.
    */
  def buildRollup(docs: DataFrame, key: String = "lang"): DataFrame =
    docs.select(col(key),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))

  /** Per-file (min, max) spans of a column, as a fraction of the
    * column's global domain — the data-skipping scorecard for a layout:
    * a predicate on the column prunes a file whose span misses it, so
    * the mean span IS the expected fraction of files a point/range
    * query touches.
    */
  def fileSpanStats(spark: SparkSession, dir: String, c: String): DataFrame = {
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))
    val dom = spark.read.parquet(dir)
      .agg(min(col(c)).cast("double").as("dlo"), max(col(c)).cast("double").as("dhi"))
    perFile.crossJoin(broadcast(dom))
      .select(col("file"),
        ((col("hi") - col("lo")) / greatest(col("dhi") - col("dlo"), lit(1e-12)))
          .as("span"))
  }
}
