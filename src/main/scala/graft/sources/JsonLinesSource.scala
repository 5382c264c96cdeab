package graft.sources

import java.util.{Map => JMap, OptionalLong}

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSource V2 batch connector for JSON-Lines files —
  * the `sources/` module's demonstration that the engine can ingest a
  * non-parquet wire format with the three properties a 100 TB scan
  * needs, none of them delegated to the built-in JSON reader:
  *
  *  - '''column pruning''' (`SupportsPushDownRequiredColumns`): only the
  *    projected fields are materialized from each parsed line;
  *  - '''filter pushdown''' (`SupportsPushDownFilters`): comparison /
  *    null-test predicates on top-level columns are evaluated inside the
  *    partition reader BEFORE a row is built, so filtered data never
  *    enters the query engine (the Scan's `description()` advertises the
  *    pushed set for plan assertions);
  *  - '''byte-range split planning''': files are split at
  *    `spark.sql.files.maxPartitionBytes`-sized offsets with the classic
  *    newline-alignment rule (a split owns the lines starting in
  *    (start, end], plus offset 0 for the first split), so a single
  *    100 GB file parallelizes across executors instead of pinning one
  *    task.
  *
  * Also readable as a micro-batch STREAM (`spark.readStream.format
  * ("graft-jsonl")`) over an append-only staging directory — see
  * [[JsonLinesMicroBatchStream]] for the exactly-once file-log contract.
  *
  * Registered as `graft-jsonl` via `DataSourceRegister` (META-INF
  * services). Types supported: BIGINT / DOUBLE / STRING / BOOLEAN at the
  * top level — the shapes the fixture tables need; schema may be
  * user-supplied or inferred from the first line of the lexicographically
  * first file. Malformed lines and wrong-typed fields degrade to nulls
  * (PERMISSIVE semantics), never to a task failure — a 100 TB crawl scan
  * must survive dirty records.
  */
class JsonLinesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonLines.inferSchema(JsonLines.paths(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new JsonLinesTable(schema,
      JsonLines.paths(new CaseInsensitiveStringMap(properties)))
}

private[sources] object JsonLines {
  // Hadoop conf: defaults suffice for local/file: paths; a cluster run
  // inherits fs.* from the session's hadoopConfiguration via the
  // serialized active configuration when readers run in executors.
  def fs(path: Path): FileSystem = FileSystem.get(path.toUri, new Configuration())

  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap { js =>
      val node = new ObjectMapper().readTree(js)
      (0 until node.size()).map(node.get(_).asText())
    }
    val all = single ++ multi
    require(all.nonEmpty, "graft-jsonl: no path specified")
    all
  }

  /** All data files under the given paths, deterministic order. */
  def listFiles(paths: Seq[String]): Seq[FileStatus] =
    paths.flatMap { p =>
      val path = new Path(p)
      val filesys = fs(path)
      val st = filesys.getFileStatus(path)
      if (st.isDirectory)
        filesys.listStatus(path).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
            && !s.getPath.getName.startsWith("."))
      else Seq(st)
    }.sortBy(_.getPath.toString)

  /** Hive-layout recursive listing: walks `name=value` subdirectories
    * (any depth), returning each data file with the partition-column
    * values its path encodes. Non-`k=v` subdirectories are not
    * descended into (same conservatism as Spark's own discovery);
    * underscore/dot entries are invisible as ever.
    */
  def listFilesPartitioned(paths: Seq[String])
      : Seq[(FileStatus, Map[String, String])] = {
    def walk(dir: Path, filesys: FileSystem,
        values: Map[String, String]): Seq[(FileStatus, Map[String, String])] =
      filesys.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Seq.empty
        else if (st.isFile) Seq(st -> values)
        else {
          val eq = name.indexOf('=')
          if (eq <= 0) Seq.empty
          else walk(st.getPath, filesys,
            values + (name.substring(0, eq) -> name.substring(eq + 1)))
        }
      }
    paths.flatMap { p =>
      val path = new Path(p)
      val filesys = fs(path)
      val st = filesys.getFileStatus(path)
      if (st.isDirectory) walk(path, filesys, Map.empty)
      else Seq(st -> Map.empty[String, String])
    }.sortBy(_._1.getPath.toString)
  }

  /** Parse a path-encoded partition value to the schema's JVM shape
    * (the same type surface the reader produces); unparsable -> null,
    * mirroring PERMISSIVE field degradation.
    */
  def partitionValue(dt: DataType, raw: String): Any = try {
    dt match {
      case LongType => raw.toLong
      case DoubleType => raw.toDouble
      case BooleanType => raw.toBoolean
      case _ => raw
    }
  } catch { case _: Exception => null }

  /** Schema inference from the first non-empty line of the first file:
    * integral JSON numbers -> BIGINT, fractional -> DOUBLE, booleans ->
    * BOOLEAN, everything else -> STRING. Field order = first-line order.
    * A missing or empty target infers an EMPTY schema rather than
    * throwing: `DataFrameWriter.save` infers before writing, and a
    * first-ever write must not fail on its own destination (the write
    * path takes its real schema from `LogicalWriteInfo`, never from
    * here).
    */
  def inferSchema(paths: Seq[String]): StructType = {
    val first = try listFiles(paths).headOption catch {
      case _: java.io.FileNotFoundException => None
    }
    first match {
      case None => StructType(Seq.empty)
      case Some(f) => inferFromFile(f)
    }
  }

  private def inferFromFile(first: FileStatus): StructType = {
    val in = fs(first.getPath).open(first.getPath)
    val line = try {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      Iterator.continually(br.readLine()).takeWhile(_ != null)
        .find(_.trim.nonEmpty)
    } finally in.close()
    val node = new ObjectMapper().readTree(line.getOrElse(
      throw new IllegalArgumentException("graft-jsonl: first file is empty")))
    val fields = new ArrayBuffer[StructField]
    val it = node.fieldNames()
    while (it.hasNext) {
      val name = it.next()
      val v = node.get(name)
      val dt =
        if (v.isIntegralNumber) LongType
        else if (v.isNumber) DoubleType
        else if (v.isBoolean) BooleanType
        else StringType
      fields += StructField(name, dt, nullable = true)
    }
    StructType(fields.toSeq)
  }
}

private[sources] class JsonLinesTable(tableSchema: StructType, paths: Seq[String])
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.read.streaming.ReportsSinkMetrics {
  override def name(): String = s"graft-jsonl ${paths.mkString(",")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonLinesScanBuilder(tableSchema, paths, options)

  // cumulative sink-side exactly-once observability: epochs committed and
  // files finalized by THIS table instance's streaming writes, surfaced
  // per micro-batch in StreamingQueryProgress.sink.metrics — so the
  // connector's exactly-once claim is visible in production, not only in
  // tests (a replayed epoch increments neither counter)
  private[sources] val epochsCommitted = new java.util.concurrent.atomic.AtomicLong(0)
  private[sources] val filesCommitted = new java.util.concurrent.atomic.AtomicLong(0)
  override def metrics(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("epochsCommitted", epochsCommitted.get().toString)
    m.put("filesCommitted", filesCommitted.get().toString)
    m
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.size == 1, "graft-jsonl: write target must be a single directory")
    new JsonLinesWriteBuilder(paths.head, info, this)
  }
}

private[sources] class JsonLinesScanBuilder(tableSchema: StructType,
    paths: Seq[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  /** PARTIAL limit pushdown (`isPartiallyPushed` stays true): each
    * partition reader stops parsing after `limit` rows, so a head-probe
    * on a huge corpus reads a few lines per split instead of every
    * split end to end; Spark still applies the global limit above.
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  // metadata-answered aggregation: (output schema, the one result row)
  private var aggResult: Option[(StructType, Array[Any])] = None
  private var aggDescription: String = ""

  /** COMPLETE aggregate pushdown answered from the `_stats.jsonl`
    * sidecar alone — the lakehouse metadata-only query: COUNT(*) from
    * per-file row counts, MIN/MAX from per-file zones, no data file
    * opened. Accepted ONLY when the answer is provably exact:
    * no pushed filters, no grouping, every data file has a sidecar
    * entry with a row count, and every MIN/MAX field is accounted for
    * in every file (a values zone or an all-null flag — a field in
    * neither could be NaN-poisoned or absent, either of which makes
    * the zone unusable). Anything else falls back to a normal scan.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = planAggregation(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    planAggregation(agg) match {
      case Some(res) =>
        aggResult = Some(res)
        aggDescription = agg.aggregateExpressions().mkString("[", ", ", "]")
        true
      case None => false
    }

  private def planAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return None
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        Some(f.fieldNames()(0)).filter(n => tableSchema.fieldNames.contains(n))
      case _ => None
    }
    // shape gate first (cheap), then the sidecar coverage proof
    val shapes: Seq[Either[Unit, (String, Boolean)]] =
      agg.aggregateExpressions().toSeq.map {
        case _: CountStar => Left(())
        case m: Min => fieldOf(m.column()) match {
          case Some(f) => Right((f, true)); case None => return None
        }
        case m: Max => fieldOf(m.column()) match {
          case Some(f) => Right((f, false)); case None => return None
        }
        case _ => return None
      }
    if (shapes.isEmpty) return None
    val zones = try {
      val files = JsonLines.listFiles(paths)
      val byDir = paths.flatMap(p => JsonLinesStats.read(new Path(p)).map {
        case (name, z) =>
          val dir = new Path(p)
          new Path(JsonLines.fs(dir).makeQualified(dir), name).toString -> z
      }).toMap
      val matched = files.map(st => byDir.get(st.getPath.toString))
      if (matched.exists(_.isEmpty)) return None // un-stated file: no proof
      matched.flatten
    } catch { case _: Exception => return None }
    if (zones.exists(_.rows < 0)) return None // legacy sidecar: no counts
    val minMaxFields = shapes.collect { case Right((f, _)) => f }.toSet
    // every file must account for every min/max field, one way or the
    // other; files with rows but an unaccounted field decline the push
    if (!minMaxFields.forall(f => zones.forall(z =>
      z.fields.contains(f) || z.nullFields.contains(f) || z.rows == 0L)))
      return None
    def fold(f: String, takeMin: Boolean): Any = {
      val vals = zones.flatMap(_.fields.get(f))
        .map(v => if (takeMin) v._1 else v._2)
      if (vals.isEmpty) null
      else vals.reduce { (a, b) =>
        val c = (a, b) match {
          case (x: Long, y: Long) => java.lang.Long.compare(x, y)
          case (x: Double, y: Double) => java.lang.Double.compare(x, y)
          case (x: String, y: String) => x.compareTo(y)
          case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
          case _ => return null // mixed shapes: give up on this field
        }
        if ((c <= 0) == takeMin) a else b
      }
    }
    val values = new Array[Any](shapes.length)
    val fields = new ArrayBuffer[StructField]
    shapes.zipWithIndex.foreach {
      case (Left(()), i) =>
        values(i) = zones.map(_.rows).sum
        fields += StructField(s"agg_$i", LongType, nullable = false)
      case (Right((f, takeMin)), i) =>
        values(i) = fold(f, takeMin)
        fields += StructField(s"agg_$i",
          tableSchema(tableSchema.fieldIndex(f)).dataType, nullable = true)
    }
    Some((StructType(fields.toSeq), values))
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the table's field order so row layout is deterministic
    required = StructType(tableSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** Accept the predicate shapes the reader can evaluate on a parsed
    * line; everything else stays with Spark (returned as unsupported).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(JsonLinesFilters.supported(tableSchema, _))
    pushed = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = aggResult match {
    case Some((schema, values)) =>
      new JsonLinesAggScan(schema, values, paths, aggDescription)
    case None =>
      val splitBytes = Option(options.get("split.bytes")).map(_.toLong)
        .getOrElse(128L * 1024 * 1024)
      val maxFilesPerTrigger =
        Option(options.get("maxFilesPerTrigger")).map(_.toInt)
      val discovery = Option(options.get("partition.discovery"))
        .exists(_.toBoolean)
      new JsonLinesScan(tableSchema, required, pushed, paths, splitBytes,
        maxFilesPerTrigger, limit, discovery)
  }
}

/** Metadata-only scan for a completely-pushed aggregation: the single
  * result row was computed at planning time from the `_stats.jsonl`
  * sidecar (row counts + zones) — no data file is opened at execution.
  */
private[sources] class JsonLinesAggScan(outSchema: StructType,
    values: Array[Any], paths: Seq[String], aggDesc: String)
    extends Scan with Batch {
  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-jsonl metadata-only ${paths.mkString(",")}, " +
      s"PushedAggregates: $aggDesc"
  override def planInputPartitions(): Array[InputPartition] =
    Array(JsonLinesAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new JsonLinesAggReaderFactory(outSchema)
}

private[sources] case class JsonLinesAggPartition(values: Array[Any])
    extends InputPartition

private[sources] class JsonLinesAggReaderFactory(outSchema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val values = p.asInstanceOf[JsonLinesAggPartition].values
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(
        values.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        })
      override def close(): Unit = ()
    }
}

private[sources] class JsonLinesScan(tableSchema: StructType,
    required: StructType, pushed: Array[Filter], paths: Seq[String],
    splitBytes: Long, maxFilesPerTrigger: Option[Int] = None,
    limit: Option[Int] = None, discovery: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  // planning-time filters plus any runtime filters Spark injects from a
  // completed broadcast-join build side (the DSv2 dynamic-pruning hook):
  // planInputPartitions consults the COMBINED set, so a runtime IN-list
  // on a zone/bloom-covered column skips whole files mid-query — the
  // file-level analog of dynamic partition pruning
  private var effective: Array[Filter] = pushed

  // only the scan's OUTPUT columns: the planner resolves these against
  // the pruned projection, so advertising a pruned-away column is an
  // analysis error, not a missed optimization
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    val ok = filters.filter(JsonLinesFilters.supported(tableSchema, _))
    if (ok.nonEmpty) effective = effective ++ ok
  }

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-jsonl PushedFilters: [${pushed.mkString(", ")}], " +
      s"RuntimeFilters: [${effective.drop(pushed.length).mkString(", ")}], " +
      limit.map(l => s"PushedLimit: $l, ").getOrElse("") +
      s"ReadSchema: ${required.simpleString}"

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new JsonLinesMicroBatchStream(tableSchema, required, pushed, paths,
      splitBytes, checkpointLocation, maxFilesPerTrigger)

  private var filesSkipped = 0L

  /** Byte-range splits: ceil(len / splitBytes) partitions per file. The
    * reader aligns to line starts, so split boundaries never duplicate
    * or drop a record. Files whose `_stats.jsonl` zone (per-field
    * min/max, written by this connector's writer at job commit) PROVES
    * the pushed filters match nothing are skipped whole — the parquet
    * footer min/max trick for a line format. Files without a stats
    * entry are never skipped (conservative: an external producer's
    * files always scan).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (discovery) return planDiscovered()
    // zone keys are fully-qualified paths: the sidecar stores bare names
    // (relative to its own directory), but with several input dirs a
    // same-named external file in dir A must never be pruned by dir B's
    // stats.
    val zones = if (effective.isEmpty) Map.empty[String, JsonLinesZone]
      else paths.flatMap { p =>
        val dir = new Path(p)
        val qdir = JsonLines.fs(dir).makeQualified(dir)
        JsonLinesStats.read(dir).map { case (name, z) =>
          new Path(qdir, name).toString -> z
        }
      }.toMap
    val (skipped, kept) = JsonLines.listFiles(paths).partition { st =>
      zones.get(st.getPath.toString)
        .exists(z => effective.exists(JsonLinesStats.provesEmpty(_, z)))
    }
    filesSkipped = skipped.size.toLong
    kept.flatMap { st =>
      JsonLinesScan.splitFile(st.getPath.toString, st.getLen, splitBytes)
    }.toArray
  }

  /** Hive-layout planning (`partition.discovery=true`): walk `k=v`
    * subdirectories, prune whole DIRECTORIES whose path-encoded values
    * falsify the partition-column filters (evaluated with the reader's
    * own predicate semantics on typed values), then apply per-file
    * zone/bloom proofs inside the surviving directories. Partition
    * pruning is exact — a directory is dropped only when its values
    * FALSIFY the filter — so correctness never depends on layout.
    */
  private def planDiscovered(): Array[InputPartition] = {
    val files = JsonLines.listFilesPartitioned(paths)
    val partCols = tableSchema.fields
      .filter(f => files.exists(_._2.contains(f.name)))
    val idx = partCols.map(_.name).zipWithIndex.toMap
    val partFilters = effective.filter(_.references.forall(idx.contains))
    val dirs = files.map(_._1.getPath.getParent).distinct
    val zones = if (effective.isEmpty) Map.empty[String, JsonLinesZone]
      else dirs.flatMap { d =>
        val qd = JsonLines.fs(d).makeQualified(d)
        JsonLinesStats.read(d).map { case (n, z) =>
          new Path(qd, n).toString -> z
        }
      }.toMap
    val (skipped, kept) = files.partition { case (st, pv) =>
      val row: Array[Any] = partCols.map(f =>
        pv.get(f.name).map(JsonLines.partitionValue(f.dataType, _)).orNull)
        .toArray
      (partFilters.nonEmpty &&
        !partFilters.forall(JsonLinesFilters.eval(_, idx, row))) ||
      zones.get(st.getPath.toString)
        .exists(z => effective.exists(JsonLinesStats.provesEmpty(_, z)))
    }
    filesSkipped = skipped.size.toLong
    kept.flatMap { case (st, pv) =>
      JsonLinesScan.splitFile(st.getPath.toString, st.getLen, splitBytes)
        .map(_.asInstanceOf[JsonLinesPartition].copy(partValues = pv))
    }.toArray
  }

  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    Array(JsonLinesTaskMetric("skippedFiles", filesSkipped))

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonLinesReaderFactory(tableSchema, required, effective, limit)

  override def estimateStatistics(): Statistics = new Statistics {
    private val files = try JsonLines.listFiles(paths)
      catch { case _: Exception => Seq.empty }
    private val bytes = files.map(_.getLen).sum
    // exact row count from the sidecar when EVERY data file carries
    // one — connector-written corpora always do — so Catalyst's join
    // sizing sees real cardinality, not a bytes-derived guess; any
    // externally-produced file without a count falls back to unknown
    private val rows: Option[Long] = try {
      val counted = paths.flatMap { p =>
        val dir = new Path(p)
        val qdir = JsonLines.fs(dir).makeQualified(dir)
        JsonLinesStats.read(dir).map { case (name, z) =>
          new Path(qdir, name).toString -> z.rows
        }
      }.toMap
      val perFile = files.map(st => counted.get(st.getPath.toString))
      if (files.nonEmpty && perFile.forall(_.exists(_ >= 0)))
        Some(perFile.flatten.sum)
      else None
    } catch { case _: Exception => None }
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong =
      rows.map(OptionalLong.of).getOrElse(OptionalLong.empty())
  }

  /** PERMISSIVE degradation must never be silent: the SQL metrics
    * surface how many lines each scan dropped as malformed and how many
    * rows the pushed filters removed — the difference between "the scan
    * was selective" and "the scan was eating corrupt data" at 100 TB.
    */
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new MalformedLinesMetric, new FilteredLinesMetric,
      new SkippedFilesMetric)
}

private[sources] class SkippedFilesMetric extends CustomSumMetric {
  override def name(): String = "skippedFiles"
  override def description(): String = "files skipped by zone-map stats"
}

private[sources] class MalformedLinesMetric extends CustomSumMetric {
  override def name(): String = "malformedLines"
  override def description(): String = "lines dropped as malformed JSON"
}

private[sources] class FilteredLinesMetric extends CustomSumMetric {
  override def name(): String = "filteredLines"
  override def description(): String = "rows removed by pushed filters"
}

private[sources] case class JsonLinesTaskMetric(name: String, value: Long)
    extends CustomTaskMetric

private[sources] object JsonLinesScan {
  def splitFile(path: String, len: Long, splitBytes: Long): Seq[InputPartition] =
    if (len == 0) Seq.empty
    else (0L until len by splitBytes).map { start =>
      JsonLinesPartition(path, start, math.min(start + splitBytes, len), len)
    }
}

private[sources] case class JsonLinesPartition(path: String, start: Long,
    end: Long, fileLen: Long,
    partValues: Map[String, String] = Map.empty) extends InputPartition

/** Per-file zone: for each field, (min, max) over non-null parsed
  * values plus a had-nulls flag, and (for writer-opted columns) a
  * fixed-size Bloom filter over the file's values. Values are Long /
  * Double / String / Boolean — the connector's type surface.
  */
private[graft] case class JsonLinesZone(
    fields: Map[String, (Any, Any)], nullFields: Set[String],
    blooms: Map[String, Vector[Long]] = Map.empty,
    rows: Long = -1L)

/** Fixed-size per-file Bloom filter for point-lookup file skipping —
  * the complement of the (min, max) zone: zones prune RANGE predicates
  * on clustered layouts, but an equality probe for a key in a
  * hash-scattered layout (every file's zone spans nearly the full
  * domain) scans everything; a 1 KiB Bloom per opted column skips every
  * file that provably lacks the key. Opt-in per column via the writer's
  * `bloom.fields` option — the Delta/Parquet-bloom design — so the
  * sidecar stays O(files) bytes unless a column pays for itself.
  *
  * 8192 bits, 4 probes: ~1e-5 false-positive rate at 1k distinct values
  * per file, and a false positive only costs an unskipped file. Hashing
  * is FNV-1a 64 over the value's decimal/UTF-8 canonical form with a
  * splitmix64-derived second hash (double hashing) — deterministic
  * across JVMs, so a sidecar written anywhere prunes anywhere.
  */
private[graft] object JsonLinesBloom {
  val Bits = 8192
  val Words: Int = Bits / 64
  val Probes = 4

  /** Canonical bytes for hashable values; None = type not bloomable
    * (Double equality probes are float-trap territory, Boolean is
    * pointless) — an absent canonical form NEVER proves anything.
    */
  def canonical(v: Any): Option[Array[Byte]] = v match {
    case l: Long => Some(l.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    case i: Int => Some(i.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    case s: String => Some(s.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    case _ => None
  }

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    h
  }

  private def mix(x: Long): Long = {
    var h = x + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  private def probeBits(bytes: Array[Byte]): Seq[Int] = {
    val h1 = fnv64(bytes)
    val h2 = mix(h1) | 1L
    (0 until Probes).map(i =>
      java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, Bits.toLong).toInt)
  }

  def add(bits: Array[Long], v: Any): Unit = canonical(v).foreach { b =>
    probeBits(b).foreach(p => bits(p >>> 6) |= 1L << (p & 63))
  }

  /** Some(false) = the value is PROVABLY absent from the file;
    * Some(true) = maybe present; None = value shape not bloomable.
    */
  def mightContain(bits: Vector[Long], v: Any): Option[Boolean] =
    canonical(v).map { b =>
      probeBits(b).forall(p => (bits(p >>> 6) & (1L << (p & 63))) != 0L)
    }

  def toBase64(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(Words * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def fromBase64(s: String): Option[Vector[Long]] = try {
    val bytes = java.util.Base64.getDecoder.decode(s)
    if (bytes.length != Words * 8) None
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Some(Vector.fill(Words)(bb.getLong()))
    }
  } catch { case _: Exception => None }
}

/** The `_stats.jsonl` sidecar: one line per data file,
  * `{"file":name,"fields":{f:{"min":…,"max":…,"nulls":bool}}}`.
  * Underscore-prefixed, so readers and the streaming discovery log
  * never see it as data.
  */
private[graft] object JsonLinesStats {
  val FileName = "_stats.jsonl"

  def write(filesys: FileSystem, dir: Path,
      zones: Seq[(String, JsonLinesZone)]): Unit = {
    if (zones.isEmpty) return
    val mapper = new ObjectMapper()
    val sb = new StringBuilder
    zones.foreach { case (file, z) =>
      val node = mapper.createObjectNode()
      node.put("file", file)
      if (z.rows >= 0) node.put("rows", z.rows)
      val fs = node.putObject("fields")
      z.fields.toSeq.sortBy(_._1).foreach { case (f, (lo, hi)) =>
        val fn = fs.putObject(f)
        putVal(fn, "min", lo); putVal(fn, "max", hi)
        fn.put("nulls", z.nullFields.contains(f))
        z.blooms.get(f).foreach(bits =>
          fn.put("bloom", JsonLinesBloom.toBase64(bits.toArray)))
      }
      sb.append(mapper.writeValueAsString(node)).append('\n')
    }
    val tmp = new Path(dir, s".$FileName.tmp")
    val out = filesys.create(tmp, true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, FileName)
    filesys.delete(dst, false)
    if (!filesys.rename(tmp, dst))
      throw new java.io.IOException(s"graft-jsonl: failed to persist $dst")
  }

  private def putVal(n: com.fasterxml.jackson.databind.node.ObjectNode,
      k: String, v: Any): Unit = v match {
    case l: Long => n.put(k, l)
    case d: Double => n.put(k, d)
    case b: Boolean => n.put(k, b)
    case s: String => n.put(k, s)
    case _ => ()
  }

  private def readVal(v: JsonNode): Any =
    if (v.isIntegralNumber) v.asLong()
    else if (v.isNumber) v.asDouble()
    else if (v.isBoolean) v.asBoolean()
    else v.asText()

  /** file-name -> zone map for a data directory; empty when the sidecar
    * is absent or unreadable (stats are an optimization, never a
    * correctness dependency).
    */
  def read(dir: Path): Map[String, JsonLinesZone] = try {
    val filesys = JsonLines.fs(dir)
    val p = new Path(dir, FileName)
    if (!filesys.exists(p)) return Map.empty
    val mapper = new ObjectMapper()
    val in = filesys.open(p)
    try {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      Iterator.continually(br.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty).flatMap { line =>
          // per-LINE tolerance: a torn or corrupt sidecar line loses only
          // its own entry (that file just scans unskipped), never the
          // whole sidecar — stats stay an optimization under partial
          // corruption exactly as under total absence
          try {
            val node = mapper.readTree(line)
            val fields = scala.collection.mutable.Map[String, (Any, Any)]()
            val nulls = scala.collection.mutable.Set[String]()
            val blooms = scala.collection.mutable.Map[String, Vector[Long]]()
            val fs = node.get("fields")
            if (fs != null) {
              val it = fs.fieldNames()
              while (it.hasNext) {
                val f = it.next(); val fn = fs.get(f)
                fields += f -> (readVal(fn.get("min")), readVal(fn.get("max")))
                if (fn.get("nulls").asBoolean()) nulls += f
                val bl = fn.get("bloom")
                if (bl != null && bl.isTextual)
                  JsonLinesBloom.fromBase64(bl.asText()).foreach(blooms += f -> _)
              }
            }
            val rows = Option(node.get("rows"))
              .filter(_.isIntegralNumber).map(_.asLong()).getOrElse(-1L)
            Some(node.get("file").asText() ->
              JsonLinesZone(fields.toMap, nulls.toSet, blooms.toMap, rows))
          } catch { case _: Exception => None }
        }.toMap
    } finally in.close()
  } catch { case _: Exception => Map.empty }

  /** True when the zone PROVES the filter matches no row of the file.
    * Conservative: unknown fields / shapes never prove emptiness.
    */
  def provesEmpty(f: Filter, z: JsonLinesZone): Boolean = {
    def zone(a: String): Option[(Any, Any)] = z.fields.get(a)
    def nonFinite(v: Any): Boolean = v match {
      case d: Double => d.isNaN || d.isInfinite
      case f: Float => f.isNaN || f.isInfinite
      case _ => false
    }
    // Exact numeric compare via BigDecimal: longValue()/doubleValue()
    // coercions truncate (LessThan(a, 5.5) vs a Long zone lo=5 would
    // "prove" the file empty while rows with a=5 match) or lose
    // precision above 2^53. new BigDecimal(double) is the exact binary
    // value, so no literal/zone pair can be mis-ordered.
    def big(v: Number): java.math.BigDecimal = v match {
      case d: java.lang.Double => new java.math.BigDecimal(d.doubleValue())
      case f: java.lang.Float => new java.math.BigDecimal(f.doubleValue())
      case n => new java.math.BigDecimal(n.toString)
    }
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case _ if nonFinite(a) || nonFinite(b) => None // NaN/Inf prove nothing
      case (x: Number, y: Number) => Some(big(x).compareTo(big(y)))
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
      case _ => None
    }
    // a field that appeared ONLY as null has no (min,max) zone but a
    // nulls flag: every comparison against it is false for every row
    def allNull(a: String): Boolean =
      !z.fields.contains(a) && z.nullFields.contains(a)
    // Bloom proof: the writer-opted per-file filter says the probe value
    // was never written to this file. Equality never matches null rows,
    // so the proof holds regardless of the null flag; an absent bloom or
    // an unbloomable value shape proves nothing.
    def bloomAbsent(a: String, v: Any): Boolean =
      z.blooms.get(a).exists(bits =>
        JsonLinesBloom.mightContain(bits, v).contains(false))
    f match {
      case EqualTo(a, v) if bloomAbsent(a, v) => true
      case In(a, vs) if vs.nonEmpty && vs.forall(bloomAbsent(a, _)) => true
      case EqualTo(a, v) => allNull(a) || zone(a).exists { case (lo, hi) =>
        cmp(v, lo).exists(_ < 0) || cmp(v, hi).exists(_ > 0) }
      case GreaterThan(a, v) => allNull(a) || zone(a).exists { case (_, hi) =>
        cmp(hi, v).exists(_ <= 0) }
      case GreaterThanOrEqual(a, v) => allNull(a) || zone(a).exists { case (_, hi) =>
        cmp(hi, v).exists(_ < 0) }
      case LessThan(a, v) => allNull(a) || zone(a).exists { case (lo, _) =>
        cmp(lo, v).exists(_ >= 0) }
      case LessThanOrEqual(a, v) => allNull(a) || zone(a).exists { case (lo, _) =>
        cmp(lo, v).exists(_ > 0) }
      case In(a, vs) => allNull(a) || (vs.nonEmpty && zone(a).exists { case (lo, hi) =>
        vs.forall(v => cmp(v, lo).exists(_ < 0) || cmp(v, hi).exists(_ > 0)) })
      case IsNull(a) =>
        // provably no nulls only if the field has a zone (saw values)
        // and recorded none missing
        z.fields.contains(a) && !z.nullFields.contains(a)
      case IsNotNull(a) => allNull(a)
      case And(l, r) => provesEmpty(l, z) || provesEmpty(r, z)
      case Or(l, r) => provesEmpty(l, z) && provesEmpty(r, z)
      case _ => false
    }
  }
}

/** Streaming offset = how many files of the discovery log have been
  * consumed. The log itself (ordered (length, path) snapshots) carries
  * the actual file identity, so the scalar offset is unambiguous.
  */
private[sources] case class JsonLinesOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Micro-batch streaming over an append-only JSONL directory — the
  * DSv2 twin of the file-source contract [[graft.streaming.PollingSource]]
  * stages for: files are immutable once visible (tmp-then-atomic-rename),
  * and each visible file is read EXACTLY once.
  *
  * Discovery keeps an ordered append-log of (length, path) in the query
  * checkpoint (one numbered log file per discovery round, highest wins —
  * the same recovery shape as Spark's own file source metadata log).
  * Offsets index into that log, and the log snapshots each file's LENGTH
  * at discovery time, so a replayed batch re-plans byte-identical splits
  * even if the filesystem has since grown. Filter pushdown and column
  * pruning apply per micro-batch exactly as in the batch scan — the
  * reader factory is shared.
  */
private[sources] class JsonLinesMicroBatchStream(tableSchema: StructType,
    required: StructType, pushed: Array[Filter], paths: Seq[String],
    splitBytes: Long, checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private val logDir = new Path(checkpointLocation, "graft-jsonl-file-log")
  private val logFs = JsonLines.fs(logDir)

  // ordered discovery log: (length-at-discovery, path)
  private val known = new ArrayBuffer[(Long, String)]()
  private val knownPaths = new scala.collection.mutable.HashSet[String]()

  // recover the log from the latest persisted round
  locally {
    if (logFs.exists(logDir)) {
      val rounds = logFs.listStatus(logDir).toSeq
        .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong)
      if (rounds.nonEmpty) {
        val latest = new Path(logDir, rounds.max.toString)
        val in = logFs.open(latest)
        try {
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
          Iterator.continually(br.readLine()).takeWhile(_ != null)
            .filter(_.nonEmpty).foreach { line =>
              val i = line.indexOf('\t')
              val entry = (line.substring(0, i).toLong, line.substring(i + 1))
              known += entry
              knownPaths += entry._2
            }
        } finally in.close()
      }
    }
  }

  /** List the directory; append unseen files (with their current length)
    * to the log and persist the new snapshot. Listing order is
    * name-sorted for determinism; ARRIVAL order (which discovery round
    * first saw a file) is what fixes a file's position, so producers may
    * use any naming scheme as long as files are immutable once visible.
    */
  private def discover(): Unit = synchronized {
    val fresh = JsonLines.listFiles(paths)
      .filter(st => !knownPaths.contains(st.getPath.toString))
    if (fresh.nonEmpty) {
      fresh.foreach { st =>
        known += ((st.getLen, st.getPath.toString))
        knownPaths += st.getPath.toString
      }
      val tmp = new Path(logDir, s".${known.size}.tmp")
      val dst = new Path(logDir, known.size.toString)
      val out = logFs.create(tmp, true)
      try out.write(known.map { case (len, p) => s"$len\t$p" }
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // the log IS the offset->file mapping committed batches rely on: a
      // silently failed persist would let a restart re-discover these
      // files in a different order than the checkpoint replays
      if (!logFs.rename(tmp, dst))
        throw new java.io.IOException(
          s"graft-jsonl stream: failed to persist file log $dst")
    }
  }

  override def initialOffset(): Offset = JsonLinesOffset(0L)

  override def latestOffset(): Offset = {
    discover()
    JsonLinesOffset(known.size.toLong)
  }

  /** Backpressure (`maxFilesPerTrigger`): a restarted query facing a
    * backlog drains it in bounded epochs instead of swallowing it whole
    * — the admission-control contract Spark's own file source honors.
    * The default limit comes from the reader option; Spark calls the
    * two-arg `latestOffset` with it each trigger.
    */
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    discover()
    val s = start.asInstanceOf[JsonLinesOffset].n
    val capped = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(known.size.toLong, s + m.maxFiles())
      case _ => known.size.toLong
    }
    JsonLinesOffset(capped)
  }

  override def deserializeOffset(json: String): Offset =
    JsonLinesOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[JsonLinesOffset].n.toInt
    val e = end.asInstanceOf[JsonLinesOffset].n.toInt
    known.slice(s, e).flatMap { case (len, p) =>
      JsonLinesScan.splitFile(p, len, splitBytes)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonLinesReaderFactory(tableSchema, required, pushed)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Batch write with the classic two-phase commit: every task writes a
  * DOT-PREFIXED temp file (invisible to the reader's listing filter and
  * to the streaming discovery log), task commit hands the temp path to
  * the driver, and ONLY the driver's job-level `commit` renames temps to
  * their final names — so a job that dies mid-write leaves nothing
  * visible, a speculative duplicate task is discarded by Spark before
  * its message reaches commit, and `abort` just deletes temps. Truncate
  * (SaveMode.Overwrite) removes prior visible files inside the same
  * job commit, after the new temps are all in place.
  */
private[sources] class JsonLinesWriteBuilder(dir: String, info: LogicalWriteInfo,
    table: JsonLinesTable = null)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  // opt-in per-column Bloom sidecars for point-lookup file skipping;
  // validated against the schema so a typo fails the write, not the prune
  private val bloomFields: Set[String] = {
    val req = Option(info.options().get("bloom.fields")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet
    val unknown = req -- info.schema().fieldNames.toSet
    require(unknown.isEmpty,
      s"graft-jsonl bloom.fields not in schema: ${unknown.mkString(", ")}")
    req
  }

  override def build(): Write = new Write {
    override def description(): String = s"graft-jsonl -> $dir"
    override def toBatch: BatchWrite =
      new JsonLinesBatchWrite(dir, info.schema(), doTruncate, bloomFields)
    override def toStreaming: StreamingWrite = {
      require(!doTruncate,
        "graft-jsonl streaming write supports append mode only")
      new JsonLinesStreamingWrite(dir, info.schema(), Option(table),
        bloomFields)
    }
    override def supportedCustomMetrics(): Array[CustomMetric] =
      Array(new WrittenLinesMetric)
  }
}

private[sources] class WrittenLinesMetric extends CustomSumMetric {
  override def name(): String = "writtenLines"
  override def description(): String = "JSON lines serialized by writers"
}

private[graft] case class JsonLinesCommitMessage(tempPath: String,
    finalName: String, zone: JsonLinesZone) extends WriterCommitMessage

private[graft] class JsonLinesBatchWrite(dir: String, schema: StructType,
    doTruncate: Boolean, bloomFields: Set[String] = Set.empty)
    extends BatchWrite {

  // job-unique suffix baked into every final file name: an overwrite of
  // a directory this connector wrote earlier must never rename onto an
  // existing name (Hadoop rename-onto-existing returns false, which
  // would silently drop the partition)
  private val jobId = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonLinesWriterFactory(dir, schema, jobId, bloomFields)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = new Path(dir)
    val filesys = JsonLines.fs(d)
    val previous =
      if (doTruncate && filesys.exists(d))
        filesys.listStatus(d).toSeq.filter(s => s.isFile &&
          !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
          .map(_.getPath)
      else Seq.empty
    // finalize new data first: a crash between the two loops leaves the
    // union visible (never a window with NO data)
    messages.foreach { case JsonLinesCommitMessage(tempPath, finalName, _) =>
      val tmp = new Path(tempPath)
      val dst = new Path(d, finalName)
      if (filesys.exists(tmp) && !filesys.rename(tmp, dst))
        throw new java.io.IOException(
          s"graft-jsonl commit: rename $tmp -> $dst failed")
    }
    previous.foreach(filesys.delete(_, false))
    // zone-map sidecar: overwrite starts fresh (the old files are gone);
    // append merges the previous sidecar so skipping stays complete
    val kept = if (doTruncate) Seq.empty
      else JsonLinesStats.read(d).toSeq
    val fresh = messages.toSeq.map {
      case JsonLinesCommitMessage(_, finalName, zone) => finalName -> zone
    }
    JsonLinesStats.write(filesys, d, kept ++ fresh)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val filesys = JsonLines.fs(new Path(dir))
    messages.foreach {
      case JsonLinesCommitMessage(tempPath, _, _) =>
        filesys.delete(new Path(tempPath), false)
      case _ => ()
    }
  }
}

/** The `_epochs.jsonl` sidecar: one line per committed streaming epoch,
  * bounded to the last [[Keep]] entries (replay after a restart only
  * ever re-runs the TAIL epochs, so an unbounded ledger would be pure
  * growth at 100 TB stream lifetimes). Rewritten tmp-then-atomic-rename
  * — local-FS append is unsupported and non-atomic anyway. Underscore-
  * prefixed: readers and the streaming discovery log never see it as
  * data. A lost/corrupt ledger degrades to the rename-convergence path,
  * never to duplicates.
  */
private[graft] object JsonLinesEpochLog {
  val FileName = "_epochs.jsonl"
  val Keep = 128

  def read(filesys: FileSystem, dir: Path): Seq[Long] = try {
    val p = new Path(dir, FileName)
    if (!filesys.exists(p)) return Seq.empty
    val mapper = new ObjectMapper()
    val in = filesys.open(p)
    try {
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8))
      Iterator.continually(br.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty)
        .map(l => mapper.readTree(l).get("epoch").asLong()).toSeq
    } finally in.close()
  } catch { case _: Exception => Seq.empty }

  def mark(filesys: FileSystem, dir: Path, epochId: Long): Unit = {
    val entries = (read(filesys, dir) :+ epochId).takeRight(Keep)
    val tmp = new Path(dir, s".$FileName.tmp")
    val out = filesys.create(tmp, true)
    try out.write(entries.map(e => s"""{"epoch":$e}""").mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(dir, FileName)
    filesys.delete(dst, false)
    if (!filesys.rename(tmp, dst))
      throw new java.io.IOException(s"graft-jsonl: failed to persist $dst")
  }
}

/** Micro-batch streaming write: per-epoch two-phase commit with replay
  * idempotence, so `writeStream.format("graft-jsonl")` is exactly-once
  * WITHOUT foreachBatch. Mechanics:
  *
  *  - tasks write dot-prefixed temps (invisible to readers), exactly as
  *    in batch; final names are DETERMINISTIC per (epochId, partitionId);
  *  - epoch commit first consults the [[JsonLinesEpochLog]] ledger — a
  *    fully-committed replayed epoch deletes its temps and changes
  *    nothing;
  *  - otherwise temps rename to their final names, where a destination
  *    that already exists (crash between renames and the ledger mark)
  *    means a prior attempt finalized that partition: the temp is
  *    dropped and the replay CONVERGES on the same file set (Structured
  *    Streaming replays an epoch with the same offset range, so the
  *    regenerated content is identical);
  *  - the zone-map sidecar merge is keyed by final name (re-merging the
  *    same names is idempotent), and the ledger mark lands last.
  *
  * Committed-epoch/file counters feed the owning table's
  * `ReportsSinkMetrics`, so exactly-once behavior is observable in
  * `StreamingQueryProgress.sink.metrics` per micro-batch.
  */
private[graft] class JsonLinesStreamingWrite(dir: String, schema: StructType,
    table: Option[JsonLinesTable] = None,
    bloomFields: Set[String] = Set.empty) extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new JsonLinesStreamingWriterFactory(dir, schema, bloomFields)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val d = new Path(dir)
    val filesys = JsonLines.fs(d)
    filesys.mkdirs(d)
    if (JsonLinesEpochLog.read(filesys, d).contains(epochId)) {
      messages.foreach {
        case JsonLinesCommitMessage(t, _, _) => filesys.delete(new Path(t), false)
        case _ => ()
      }
      return
    }
    var finalized = 0L
    messages.foreach {
      case JsonLinesCommitMessage(tempPath, finalName, _) =>
        val tmp = new Path(tempPath)
        val dst = new Path(d, finalName)
        if (filesys.exists(dst)) filesys.delete(tmp, false)
        else if (filesys.exists(tmp)) {
          if (!filesys.rename(tmp, dst))
            throw new java.io.IOException(
              s"graft-jsonl epoch commit: rename $tmp -> $dst failed")
          finalized += 1
        }
      case _ => ()
    }
    val fresh = messages.collect {
      case JsonLinesCommitMessage(_, n, z) => n -> z
    }.toMap
    JsonLinesStats.write(filesys, d,
      (JsonLinesStats.read(d) ++ fresh).toSeq.sortBy(_._1))
    JsonLinesEpochLog.mark(filesys, d, epochId)
    table.foreach { t =>
      t.epochsCommitted.incrementAndGet()
      t.filesCommitted.addAndGet(finalized)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val filesys = JsonLines.fs(new Path(dir))
    messages.foreach {
      case JsonLinesCommitMessage(tempPath, _, _) =>
        filesys.delete(new Path(tempPath), false)
      case _ => ()
    }
  }
}

private[graft] class JsonLinesWriterFactory(dir: String, schema: StructType,
    jobId: String, bloomFields: Set[String] = Set.empty)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonLinesDataWriter(dir, schema,
      f".tmp-part-$partitionId%05d-$jobId-attempt-$taskId.jsonl",
      f"part-$partitionId%05d-$jobId.jsonl", bloomFields)
}

/** Streaming writers name files DETERMINISTICALLY by (epochId,
  * partitionId) — the opposite of the batch writer's job-unique names —
  * so a replayed epoch regenerates the SAME final names and the epoch
  * commit can converge instead of duplicating. The temp name still
  * embeds taskId: a speculative attempt never collides with the
  * original's in-flight file.
  */
private[graft] class JsonLinesStreamingWriterFactory(dir: String,
    schema: StructType, bloomFields: Set[String] = Set.empty)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new JsonLinesDataWriter(dir, schema,
      f".tmp-e$epochId%06d-p$partitionId%05d-attempt-$taskId.jsonl",
      f"part-e$epochId%06d-p$partitionId%05d.jsonl", bloomFields)
}

/** Serializes rows back to JSON lines via Jackson (proper string
  * escaping — the reader must round-trip anything it wrote). Naming is
  * supplied by the factory: job-unique for batch, (epoch, partition)-
  * deterministic for streaming.
  */
private[sources] class JsonLinesDataWriter(dir: String, schema: StructType,
    tempName: String, finalName: String,
    bloomFields: Set[String] = Set.empty) extends DataWriter[InternalRow] {

  private val mapper = new ObjectMapper()
  private val tempPath = new Path(dir, tempName)
  private var written = 0L
  private val out = {
    val filesys = JsonLines.fs(tempPath)
    new java.io.BufferedOutputStream(filesys.create(tempPath, true), 64 * 1024)
  }

  // zone-map accumulation: per-field running min/max over non-null
  // values, plus which fields ever saw a null
  private val mins = scala.collection.mutable.Map[String, Any]()
  private val maxs = scala.collection.mutable.Map[String, Any]()
  private val sawNull = scala.collection.mutable.Set[String]()
  // per-field Bloom bitsets for writer-opted columns (Long/String only —
  // JsonLinesBloom.canonical rejects the rest, so a Double opt-in is a
  // silent no-op rather than a broken proof)
  private val blooms = scala.collection.mutable.Map[String, Array[Long]]()
  private def bloomTrack(name: String, v: Any): Unit =
    if (bloomFields.contains(name))
      JsonLinesBloom.add(
        blooms.getOrElseUpdate(name,
          new Array[Long](JsonLinesBloom.Words)), v)
  // NaN breaks ordering proofs: any field that ever saw one carries NO
  // zone at all (not even its null flag — an all-null-plus-NaN zone
  // would wrongly prove comparisons empty)
  private val poisoned = scala.collection.mutable.Set[String]()

  private def track(name: String, v: Any): Unit = {
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long) => x < y
      case (x: Double, y: Double) => x < y
      case (x: String, y: String) => x < y
      case (x: Boolean, y: Boolean) => !x && y
      case _ => false
    }
    if (!mins.contains(name) || lt(v, mins(name))) mins(name) = v
    if (!maxs.contains(name) || lt(maxs(name), v)) maxs(name) = v
  }

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) { node.putNull(f.name); sawNull += f.name }
      else f.dataType match {
        case LongType =>
          val v = row.getLong(i); node.put(f.name, v); track(f.name, v)
          bloomTrack(f.name, v)
        case DoubleType =>
          val v = row.getDouble(i); node.put(f.name, v)
          if (v.isNaN) poisoned += f.name else track(f.name, v)
        case BooleanType =>
          val v = row.getBoolean(i); node.put(f.name, v); track(f.name, v)
        case StringType =>
          val v = row.getUTF8String(i).toString
          node.put(f.name, v); track(f.name, v)
          bloomTrack(f.name, v)
        case dt => throw new UnsupportedOperationException(
          s"graft-jsonl write: unsupported type $dt for field ${f.name}")
      }
    }
    out.write(mapper.writeValueAsBytes(node))
    out.write('\n')
    written += 1
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(JsonLinesTaskMetric("writtenLines", written))

  override def commit(): WriterCommitMessage = {
    out.close()
    JsonLinesCommitMessage(tempPath.toString, finalName,
      JsonLinesZone(
        (mins.keySet -- poisoned).map(k => k -> ((mins(k), maxs(k)))).toMap,
        (sawNull -- poisoned).toSet,
        blooms.map { case (k, bits) => k -> bits.toVector }.toMap,
        written))
  }

  override def abort(): Unit = {
    out.close()
    JsonLines.fs(tempPath).delete(tempPath, false)
  }

  override def close(): Unit = ()
}

private[sources] class JsonLinesReaderFactory(tableSchema: StructType,
    required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonLinesPartitionReader(
      partition.asInstanceOf[JsonLinesPartition], tableSchema, required,
      pushed, limit)
}

/** Reads the lines whose first byte lies in (start, end] — plus the
  * file's first line for the split at offset 0. This is the classic
  * text-split ownership rule (Hadoop `LineRecordReader`): every line is
  * read by exactly one split, so byte-range planning is exact, not
  * approximate.
  */
private[sources] class JsonLinesPartitionReader(part: JsonLinesPartition,
    tableSchema: StructType, required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {

  // partial limit pushdown: rows EMITTED by this reader (post-filter)
  private var emitted = 0L

  private val mapper = new ObjectMapper()
  private val in = {
    val p = new Path(part.path)
    JsonLines.fs(p).open(p)
  }
  // position AFTER the seek/skip below = byte offset of the next line start
  private var pos: Long = part.start
  private val reader = {
    in.seek(part.start)
    val buf = new java.io.BufferedInputStream(in, 64 * 1024)
    if (part.start > 0) {
      // consume through the first '\n' at-or-after start: either the tail
      // of a line spanning the boundary, or a whole line starting exactly
      // at `start` — both owned by the PREVIOUS split under the
      // (start, end] rule (it reads while lineStart <= its end)
      var b = buf.read()
      if (b != -1) pos += 1
      while (b != -1 && b != '\n') { b = buf.read(); if (b != -1) pos += 1 }
    }
    buf
  }
  private var current: InternalRow = _
  private val fieldIndex = tableSchema.fieldNames.zipWithIndex.toMap
  // path-encoded partition values, typed once per split and overlaid on
  // every parsed row BEFORE filter evaluation, so row-level predicates
  // on partition columns behave exactly like data-column predicates
  private val partOverlay: Seq[(Int, Any)] =
    part.partValues.toSeq.flatMap { case (k, raw) =>
      fieldIndex.get(k).map(i =>
        i -> JsonLines.partitionValue(tableSchema.fields(i).dataType, raw))
    }

  /** Next raw line (without terminator), or null at end-of-ownership:
    * this split owns lines starting in (start, end] — plus offset 0 for
    * the first split — mirroring Hadoop's text-split rule so every line
    * is read by exactly one split.
    */
  private def nextLine(): String = {
    if (pos > part.end || pos >= part.fileLen) return null
    val bytes = new java.io.ByteArrayOutputStream(256)
    var b = reader.read()
    if (b == -1) return null
    pos += 1
    while (b != -1 && b != '\n') {
      bytes.write(b)
      b = reader.read()
      if (b != -1) pos += 1
    }
    new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Parse one line to the FULL table row (filters may reference
    * non-projected columns); malformed -> null (skip), wrong-typed
    * field -> null field.
    */
  private def parse(line: String): Array[Any] = {
    val node: JsonNode =
      try mapper.readTree(line)
      catch { case _: Exception => return null }
    if (node == null || !node.isObject) return null
    tableSchema.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case LongType => if (v.isIntegralNumber) v.asLong() else null
        case DoubleType => if (v.isNumber) v.asDouble() else null
        case BooleanType => if (v.isBoolean) v.asBoolean() else null
        case StringType => if (v.isValueNode) v.asText() else null
        case _ => null
      }
    }
  }

  private var malformedLines = 0L
  private var filteredLines = 0L

  override def next(): Boolean = {
    // partial limit pushdown: once this reader has emitted `limit`
    // rows, stop parsing the rest of the split entirely
    if (limit.exists(emitted >= _)) return false
    var line = nextLine()
    while (line != null) {
      if (line.trim.nonEmpty) {
        val full = parse(line)
        if (full != null)
          partOverlay.foreach { case (i, v) => full(i) = v }
        if (full == null) malformedLines += 1
        else if (!pushed.forall(JsonLinesFilters.eval(_, fieldIndex, full)))
          filteredLines += 1
        else {
          val projected = required.fields.map { f =>
            full(fieldIndex(f.name)) match {
              case s: String => UTF8String.fromString(s)
              case other => other
            }
          }
          current = new GenericInternalRow(projected)
          emitted += 1
          return true
        }
      }
      line = nextLine()
    }
    false
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(JsonLinesTaskMetric("malformedLines", malformedLines),
      JsonLinesTaskMetric("filteredLines", filteredLines))

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

/** The predicate subset the reader evaluates (on parsed JVM values,
  * BEFORE row construction). Semantics mirror Spark's: any comparison
  * with null is false; IsNull/IsNotNull test the parsed field.
  */
private[sources] object JsonLinesFilters {

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => top(schema, a)
    case GreaterThan(a, _) => top(schema, a)
    case GreaterThanOrEqual(a, _) => top(schema, a)
    case LessThan(a, _) => top(schema, a)
    case LessThanOrEqual(a, _) => top(schema, a)
    case In(a, _) => top(schema, a)
    case IsNull(a) => top(schema, a)
    case IsNotNull(a) => top(schema, a)
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case Or(l, r) => supported(schema, l) && supported(schema, r)
    case _ => false
  }

  private def top(schema: StructType, attr: String): Boolean =
    !attr.contains(".") && schema.fieldNames.contains(attr)

  private def cmp(v: Any, lit: Any): Option[Int] = (v, lit) match {
    case (null, _) | (_, null) => None
    case (a: Long, b: Number) => Some(java.lang.Long.compare(a, b.longValue()))
    case (a: Double, b: Number) => Some(java.lang.Double.compare(a, b.doubleValue()))
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
    case _ => None
  }

  def eval(f: Filter, idx: Map[String, Int], row: Array[Any]): Boolean = f match {
    case EqualTo(a, v) => cmp(row(idx(a)), v).contains(0)
    case GreaterThan(a, v) => cmp(row(idx(a)), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(row(idx(a)), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(row(idx(a)), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(row(idx(a)), v).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(row(idx(a)), v).contains(0))
    case IsNull(a) => row(idx(a)) == null
    case IsNotNull(a) => row(idx(a)) != null
    case And(l, r) => eval(l, idx, row) && eval(r, idx, row)
    case Or(l, r) => eval(l, idx, row) || eval(r, idx, row)
    case _ => true
  }
}
