package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder mandate): media as opaque `binary`
  * columns with typed metadata, decoded/featurized partition-parallel.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic stub ([[FakeDecoder]]) — but everything
  * Spark-side is real and tested: the schema (binary payload + metadata
  * struct), the batch shape (mapPartitions so a real decoder amortizes
  * model/codec init per partition, exactly like a Pandas-UDF batch), and
  * the partition-parallel execution. Swapping [[FakeDecoder.decode]] for a
  * JNI/ONNX call is the only change needed at 100 TB.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String,
      width: Int, height: Int)

  /** Extracted features: fixed-width vector + scalar stats. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
      histogram: Array[Double])

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * "decodes" a payload into a 16-bin byte histogram + a rolling
    * checksum. A real deployment replaces this body with e.g. JPEG decode
    * + a vision-encoder forward pass; the signature and batch shape stay.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Long, Array[Double]) = {
      val hist = new Array[Double](16)
      var crc = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        hist(b & 0x0f) += 1.0
        crc = crc * 31 + b
        i += 1
      }
      val n = math.max(payload.length, 1).toDouble
      var j = 0
      while (j < 16) { hist(j) /= n; j += 1 }
      (crc, hist)
    }
  }

  /** Partition-parallel decode: one decoder instance per partition (where
    * a real codec/model would be initialized once), streaming rows through
    * it. This is the Scala analog of `mapInPandas` batching.
    */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real deployment: init codec / feature model here, once per partition
      it.map { r =>
        val (crc, hist) = FakeDecoder.decode(r.payload)
        MediaFeatures(r.media_id, r.payload.length.toLong, crc, hist)
      }
    }
  }

  /** Wrap documents as media records (text bytes as payload) — the
    * fixture stand-in for an image table.
    */
  def asMediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
  }

  /** Oracle-checkable slice of the multimodal path: byte length + md5 of
    * the payload + md5-nibble features (everything the stub can share
    * exactly with DuckDB). The mapPartitions decode path is covered by
    * MultimodalSpec instead (CRC/histogram are not SQL-expressible).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5"))
      .withColumn("f0", expr("CAST(instr('0123456789abcdef', substring(content_md5, 1, 1)) - 1 AS BIGINT)"))
      .withColumn("f1", expr("CAST(instr('0123456789abcdef', substring(content_md5, 2, 1)) - 1 AS BIGINT)"))
      .withColumn("f2", expr("CAST(instr('0123456789abcdef', substring(content_md5, 3, 1)) - 1 AS BIGINT)"))
      .withColumn("f3", expr("CAST(instr('0123456789abcdef', substring(content_md5, 4, 1)) - 1 AS BIGINT)"))
      .withColumn("pseudo_score", round((col("f0") * 16 + col("f1")) / lit(255.0), 4))
      .orderBy(col("doc_id"))

  val multimodalFeaturesOracle: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  CAST(instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS BIGINT) AS f0,
      |  CAST(instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1 AS BIGINT) AS f1,
      |  CAST(instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1 AS BIGINT) AS f2,
      |  CAST(instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1 AS BIGINT) AS f3,
      |  round((CAST(instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS BIGINT) * 16
      |         + CAST(instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1 AS BIGINT)) / 255.0, 4) AS pseudo_score
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame size (bytes) and cap for [[multimodalFrameSample]]. */
  val FrameBytes = 64
  val MaxFrames = 8

  /** Frame sampling over a media payload — the video-pipeline shape:
    * split the payload into fixed-size frames, keep every 2nd frame up
    * to a cap (bounded fan-out per record regardless of payload size),
    * fingerprint each sampled frame. The explode is map-side; a real
    * deployment swaps the substring+md5 for a frame decode, the
    * offsets/stride/cap plumbing stays.
    *
    * All frame arithmetic is BYTE-based on the binary payload
    * (octet_length + substring over BinaryType) — the correct unit for
    * opaque media. DuckDB 1.0 has no BLOB substring, so the oracle
    * frames `text` with character-unit substr; the two coincide exactly
    * because the documents fixture is pure ASCII (char == byte).
    * MultimodalSpec asserts the byte semantics directly on a non-ASCII
    * payload, where the units genuinely differ.
    */
  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload")))

  /** Library form over any (media_id, payload binary) frame. */
  def frameSample(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), col("payload"),
        octet_length(col("payload")).cast("long").as("len"))
      .select(col("media_id"), col("payload"),
        // empty/null payloads yield NO frames (sequence(0,-1) would emit
        // a descending [0,-1] — guard matches the oracle's empty range)
        explode(when(col("len") > 0,
          sequence(lit(0L),
            least(ceil(col("len") / lit(FrameBytes.toDouble)).cast("long"),
              lit(MaxFrames.toLong)) - 1))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .filter(col("frame_idx") % 2 === 0)
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * FrameBytes).as("byte_offset"),
        md5(expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)"))
          .as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))

  val multimodalFrameSampleOracle: String =
    s"""WITH f AS (
      |  SELECT doc_id AS media_id, text,
      |         unnest(range(0, least(CAST(ceil(strlen(text) / $FrameBytes.0) AS BIGINT),
      |                               $MaxFrames))) AS frame_idx
      |  FROM documents)
      |SELECT media_id, frame_idx,
      |       frame_idx * $FrameBytes AS byte_offset,
      |       md5(substr(text, CAST(frame_idx * $FrameBytes + 1 AS INT), $FrameBytes)) AS frame_md5
      |FROM f WHERE frame_idx % 2 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_frames" -> (multimodalFrameSample _))

  def oracles: Map[String, String] = Map(
    "multimodal_features" -> multimodalFeaturesOracle,
    "multimodal_frames" -> multimodalFrameSampleOracle)
}
