package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder mandate): media as opaque `binary`
  * columns with typed metadata, decoded/featurized partition-parallel.
  *
  * The decode kernel is a REAL pure-JVM audio codec: [[Wav]] parses a
  * RIFF/WAVE container (chunk walk with word-alignment padding, `fmt `
  * field validation, 16-bit PCM frame extraction) with no native
  * dependencies. The Spark side is the production batch shape: binary
  * payload + metadata schema, mapPartitions so a decoder amortizes init
  * per partition (the Scala analog of a `mapInPandas` batch), and
  * partition-parallel execution. A heavier codec (JPEG, Opus) slots into
  * the same shape unchanged at 100 TB.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String,
      width: Int, height: Int)

  /** Features extracted by a real WAV decode: container metadata plus
    * integer-exact sample statistics (integers are exactly portable
    * across engines — no float-rounding hazard in the oracle compare).
    */
  case class WavFeatures(media_id: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long, duration_us: Long,
      sum_amp: Long, sum_sq: Long, peak_abs: Long)

  /** Minimal but genuine RIFF/WAVE codec (pure JVM, no codecs needed):
    * encodes 16-bit mono PCM and decodes by walking RIFF sub-chunks —
    * including skipping unknown chunks and honoring the odd-size pad
    * byte — validating the `fmt ` chunk, and folding the `data` samples
    * into exact integer statistics. Malformed containers produce
    * `Left(reason)` rather than throwing, so a 100 TB scan can route
    * bad rows to a quarantine sink instead of failing the job.
    */
  object Wav {
    /** Decoded container info + integer-exact sample statistics. */
    case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
        nSamples: Long, sumAmp: Long, sumSq: Long, peakAbs: Long)

    /** Deterministic sample synthesis for the fixture: each payload byte
      * becomes one 16-bit sample `(b - 128) * 256` — the byte arithmetic
      * DuckDB reproduces exactly from the same characters.
      */
    def samplesFromBytes(bytes: Array[Byte]): Array[Short] = {
      val out = new Array[Short](bytes.length)
      var i = 0
      while (i < bytes.length) {
        out(i) = (((bytes(i) & 0xff) - 128) * 256).toShort
        i += 1
      }
      out
    }

    private def putU32(b: java.nio.ByteBuffer, v: Long): Unit =
      b.putInt((v & 0xffffffffL).toInt)

    /** Encode 16-bit mono PCM into a spec-valid RIFF/WAVE container. A
      * deliberately odd-sized `LIST` info chunk sits between `fmt ` and
      * `data` so every decode exercises the unknown-chunk skip and the
      * word-alignment pad byte — the parts of a RIFF parser naive code
      * gets wrong.
      */
    def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val junk = "INFOgft".getBytes("US-ASCII") // 7 bytes -> odd, pad byte follows
      val junkPadded = junk.length + (junk.length & 1)
      val dataSize = samples.length * 2
      val riffBody = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataSize)
      val buf = java.nio.ByteBuffer.allocate(8 + riffBody)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")); putU32(buf, riffBody)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")); putU32(buf, 16)
      buf.putShort(1)                       // PCM
      buf.putShort(1)                       // mono
      putU32(buf, sampleRate)
      putU32(buf, sampleRate.toLong * 2)    // byte rate = rate * block align
      buf.putShort(2)                       // block align
      buf.putShort(16)                      // bits per sample
      buf.put("LIST".getBytes("US-ASCII")); putU32(buf, junk.length)
      buf.put(junk); if ((junk.length & 1) == 1) buf.put(0.toByte)
      buf.put("data".getBytes("US-ASCII")); putU32(buf, dataSize)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
      buf.array()
    }

    /** Parse a RIFF/WAVE container. Walks sub-chunks (skipping unknown
      * ones, honoring the odd-size pad byte), requires a PCM 16-bit
      * `fmt ` chunk before `data`, and folds samples into integer stats.
      */
    def decode(payload: Array[Byte]): Either[String, WavInfo] =
      openData(payload).map { case (rate, channels, bits, buf, n) =>
        var sum = 0L; var sq = 0L; var peak = 0L
        var i = 0L
        while (i < n) {
          val s = buf.getShort().toLong
          sum += s; sq += s * s
          val a = math.abs(s); if (a > peak) peak = a
          i += 1
        }
        WavInfo(rate, channels, bits, n / channels, sum, sq, peak)
      }

    /** Per-window energy fold over the same chunk walk as [[decode]]:
      * window `w` covers samples `[w*win, (w+1)*win)` in container order
      * (the final window may be partial) and accumulates `sum(s^2)`.
      */
    def decodeWindowEnergies(payload: Array[Byte],
        win: Int): Either[String, Array[Long]] =
      openData(payload).map { case (_, _, _, buf, n) =>
        val out = new Array[Long](((n + win - 1) / win).toInt)
        var i = 0L
        while (i < n) {
          val s = buf.getShort().toLong
          out((i / win).toInt) += s * s
          i += 1
        }
        out
      }

    /** The shared container walk: validates the RIFF/WAVE framing and the
      * PCM 16-bit `fmt ` chunk, then hands the caller the buffer
      * positioned at the first sample of `data` with the sample count —
      * each decode variant supplies only its own fold.
      */
    private def openData(payload: Array[Byte])
        : Either[String, (Int, Int, Int, java.nio.ByteBuffer, Long)] = {
      if (payload.length < 12) return Left("container too short for RIFF header")
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](4); buf.get(magic)
      if (new String(magic, "US-ASCII") != "RIFF") return Left("bad RIFF magic")
      val riffSize = buf.getInt() & 0xffffffffL
      if (riffSize + 8 > payload.length) return Left("RIFF size exceeds payload")
      buf.get(magic)
      if (new String(magic, "US-ASCII") != "WAVE") return Left("not a WAVE form")
      var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
      // chunks are walked only to the end of the DECLARED RIFF body
      // (8 + riffSize), never to the end of the payload: stray trailing
      // bytes after the form (e.g. an appended 'data' chunk outside it)
      // are ignored, matching the container spec
      val end = (8 + riffSize).toInt
      while (end - buf.position() >= 8) {
        buf.get(magic)
        val id = new String(magic, "US-ASCII")
        val size = buf.getInt() & 0xffffffffL
        if (size > end - buf.position()) return Left(s"chunk '$id' overruns payload")
        id match {
          case "fmt " =>
            if (size < 16) return Left("fmt chunk too short")
            val audioFormat = buf.getShort() & 0xffff
            val channels = buf.getShort() & 0xffff
            val rate = buf.getInt()
            buf.getInt(); buf.getShort() // byte rate, block align (derived)
            val bits = buf.getShort() & 0xffff
            if (size > 16) buf.position(buf.position() + (size - 16).toInt)
            fmt = Some((audioFormat, channels, rate, bits))
          case "data" =>
            fmt match {
              case None => return Left("data chunk before fmt")
              case Some((audioFormat, channels, rate, bits)) =>
                if (audioFormat != 1) return Left(s"unsupported codec $audioFormat (PCM only)")
                if (bits != 16) return Left(s"unsupported bit depth $bits (16-bit only)")
                if (channels < 1) return Left("zero channels")
                return Right((rate, channels, bits, buf, size / 2))
            }
          case _ =>
            // skip + word-alignment pad, clamped to the RIFF body so a
            // truncated trailing chunk falls through to "no data chunk"
            buf.position(buf.position() +
              math.min(size + (size & 1), (end - buf.position()).toLong).toInt)
        }
        // fmt pad byte sits OUTSIDE the declared chunk size — clamp like
        // the unknown-chunk skip so a pad-less trailing fmt chunk falls
        // through to "no data chunk" instead of throwing
        if ((size & 1) == 1 && id == "fmt ")
          buf.position(math.min(buf.position() + 1, end))
      }
      Left("no data chunk")
    }
  }

  /** Features extracted by a real PPM (P6) image decode: header
    * geometry plus integer-exact per-channel statistics.
    */
  case class PpmFeatures(media_id: Long, width: Int, height: Int,
      maxval: Int, n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long,
      peak: Int)

  /** Minimal but genuine binary-PPM (P6) codec — the image-shaped twin
    * of [[Wav]]: encodes RGB rasters and decodes with the real netpbm
    * header tokenizer (whitespace-delimited tokens, `#` comment lines —
    * the part naive parsers skip), validating geometry and maxval and
    * folding the raster into exact integer channel statistics.
    */
  object Ppm {
    case class PpmInfo(width: Int, height: Int, maxval: Int, nPixels: Long,
        sumR: Long, sumG: Long, sumB: Long, peak: Int)

    /** Fixture raster width: bytes fill rows of 16 RGB pixels; the last
      * row is zero-padded (deterministically reproduced by the oracle).
      */
    val RowWidth = 16

    def encode(bytes: Array[Byte]): Array[Byte] = {
      val h = math.ceil(bytes.length / (RowWidth * 3.0)).toInt
      // the comment line makes every decode exercise the skip path
      val header = s"P6\n# graft synthetic raster\n$RowWidth $h\n255\n"
        .getBytes("US-ASCII")
      val data = new Array[Byte](RowWidth * h * 3)
      System.arraycopy(bytes, 0, data, 0, bytes.length)
      header ++ data
    }

    private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t'

    /** netpbm header token: skip whitespace and `#`-to-newline comments,
      * return (token, position after token).
      */
    private def token(buf: Array[Byte], from: Int): Either[String, (String, Int)] = {
      var i = from
      while (i < buf.length && (isWs(buf(i)) || buf(i) == '#')) {
        if (buf(i) == '#') while (i < buf.length && buf(i) != '\n') i += 1
        else i += 1
      }
      if (i >= buf.length) return Left("truncated header")
      val s = i
      while (i < buf.length && !isWs(buf(i))) i += 1
      Right((new String(buf, s, i - s, "US-ASCII"), i))
    }

    def decode(payload: Array[Byte]): Either[String, PpmInfo] = {
      def num(t: (String, Int)): Either[String, (Int, Int)] =
        try Right((t._1.toInt, t._2))
        catch { case _: NumberFormatException => Left(s"non-numeric header token '${t._1}'") }
      for {
        magic <- token(payload, 0)
        _ <- if (magic._1 == "P6") Right(()) else Left(s"bad magic '${magic._1}' (P6 only)")
        w <- token(payload, magic._2).flatMap(num)
        h <- token(payload, w._2).flatMap(num)
        mv <- token(payload, h._2).flatMap(num)
        _ <- if (w._1 >= 0 && h._1 >= 0) Right(()) else Left("negative dimensions")
        _ <- if (mv._1 >= 1 && mv._1 <= 255) Right(())
             else Left(s"unsupported maxval ${mv._1} (1..255 only)")
        // exactly ONE whitespace byte separates maxval from the raster
        start = mv._2 + 1
        n = w._1.toLong * h._1 * 3
        _ <- if (payload.length - start >= n) Right(())
             else Left("truncated pixel data")
      } yield {
        var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0
        var i = 0L
        while (i < n) {
          val v = payload((start + i).toInt) & 0xff
          (i % 3) match {
            case 0 => sr += v
            case 1 => sg += v
            case _ => sb += v
          }
          if (v > peak) peak = v
          i += 1
        }
        PpmInfo(w._1, h._1, mv._1, w._1.toLong * h._1, sr, sg, sb, peak)
      }
    }

    /** Average-hash over the decoded raster: split the raster's bytes
      * into `nCells` equal ranges, set bit c when cell c's byte sum is
      * >= the global mean (integer-exact: `sum_c * nCells >= total`, no
      * division). The standard aHash perceptual fingerprint, byte-range
      * cells instead of a 2-D grid because the fixture rasters are a
      * fixed [[RowWidth]] wide (a byte range IS a row band). Reuses the
      * real header tokenizer — a malformed container fails here exactly
      * like [[decode]].
      */
    def ahash(payload: Array[Byte], nCells: Int): Either[String, Long] =
      for {
        magic <- token(payload, 0)
        _ <- if (magic._1 == "P6") Right(()) else Left(s"bad magic '${magic._1}' (P6 only)")
        w <- token(payload, magic._2).flatMap(num)
        h <- token(payload, w._2).flatMap(num)
        mv <- token(payload, h._2).flatMap(num)
        _ <- if (w._1 >= 0 && h._1 >= 0) Right(()) else Left("negative dimensions")
        _ <- if (mv._1 >= 1 && mv._1 <= 255) Right(())
             else Left(s"unsupported maxval ${mv._1} (1..255 only)")
        start = mv._2 + 1
        n = w._1.toLong * h._1 * 3
        _ <- if (payload.length - start >= n) Right(())
             else Left("truncated pixel data")
      } yield {
        val cellSize = n / nCells
        if (cellSize == 0) 0L
        else {
          val sums = new Array[Long](nCells)
          var tot = 0L
          var i = 0L
          while (i < n) {
            val v = payload((start + i).toInt) & 0xff
            sums(math.min((i / cellSize).toInt, nCells - 1)) += v
            tot += v
            i += 1
          }
          var hash = 0L
          var c = 0
          while (c < nCells) {
            if (sums(c) * nCells >= tot && tot > 0) hash |= 1L << c
            c += 1
          }
          hash
        }
      }

    private def num(t: (String, Int)): Either[String, (Int, Int)] =
      try Right((t._1.toInt, t._2))
      catch { case _: NumberFormatException => Left(s"non-numeric header token '${t._1}'") }

    /** Decoded raster with its raw interleaved RGB bytes — the form the
      * pixel-transforming ops (resize, crop) consume; [[decode]] is the
      * stats-only fold that never materializes the raster.
      */
    case class Raster(width: Int, height: Int, maxval: Int, data: Array[Byte])

    def decodeRaster(payload: Array[Byte]): Either[String, Raster] =
      for {
        magic <- token(payload, 0)
        _ <- if (magic._1 == "P6") Right(()) else Left(s"bad magic '${magic._1}' (P6 only)")
        w <- token(payload, magic._2).flatMap(num)
        h <- token(payload, w._2).flatMap(num)
        mv <- token(payload, h._2).flatMap(num)
        _ <- if (w._1 >= 0 && h._1 >= 0) Right(()) else Left("negative dimensions")
        _ <- if (mv._1 >= 1 && mv._1 <= 255) Right(())
             else Left(s"unsupported maxval ${mv._1} (1..255 only)")
        start = mv._2 + 1
        n = w._1.toLong * h._1 * 3
        _ <- if (payload.length - start >= n) Right(())
             else Left("truncated pixel data")
      } yield Raster(w._1, h._1, mv._1,
        java.util.Arrays.copyOfRange(payload, start, start + n.toInt))

    /** Nearest-neighbor resample to (w2, h2): output pixel (x, y) copies
      * source pixel (x*w/w2, y*h/h2) — the standard integer-exact
      * nearest-neighbor mapping (floor), so every engine reproduces the
      * resized raster bit-for-bit from the same source.
      */
    def resizeNearest(r: Raster, w2: Int, h2: Int): Raster = {
      val out = new Array[Byte](w2 * h2 * 3)
      var y = 0
      while (y < h2) {
        val sy = y * r.height / h2
        var x = 0
        while (x < w2) {
          val sx = x * r.width / w2
          val src = (sy * r.width + sx) * 3
          val dst = (y * w2 + x) * 3
          out(dst) = r.data(src)
          out(dst + 1) = r.data(src + 1)
          out(dst + 2) = r.data(src + 2)
          x += 1
        }
        y += 1
      }
      Raster(w2, h2, r.maxval, out)
    }
  }

  /** Partition-parallel WAV decode: one decoder scope per partition
    * (where a heavier codec would initialize once), streaming rows
    * through it — the Scala analog of `mapInPandas` batching. Malformed
    * rows are DROPPED here (never fail the scan); a pipeline that wants
    * a quarantine sink calls [[Wav.decode]] directly and routes on the
    * Left(reason).
    */
  def decodeWav(records: Dataset[MediaRecord]): Dataset[WavFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real deployment: init codec / feature model here, once per partition
      it.flatMap { r =>
        Wav.decode(r.payload).toOption.map { info =>
          WavFeatures(r.media_id, info.sampleRate, info.channels,
            info.bitsPerSample, info.nSamples,
            info.nSamples * 1000000L / math.max(info.sampleRate, 1),
            info.sumAmp, info.sumSq, info.peakAbs)
        }
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

  /** Oracle-checked REAL decode: synthesize a spec-valid WAV container
    * from each document's bytes (no media files ship in the fixture),
    * then run the genuine [[Wav.decode]] chunk-walking parser over it in
    * the mapPartitions batch shape. All emitted statistics are integers,
    * so DuckDB reproduces them exactly from the same characters
    * (`sample = (ascii(ch) - 128) * 256`); the fixture is pure ASCII so
    * char arithmetic == byte arithmetic — an invariant ENFORCED by a
    * MultimodalSpec guard over every fixture scale (DuckDB has no blob
    * substring, so the oracle cannot go byte-based; the guard makes a
    * non-ASCII fixture fail with a cause instead of a silent hash
    * mismatch). MultimodalSpec covers non-ASCII byte semantics directly.
    */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("audio/wav").as("mime"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
      .map(r => r.copy(payload = Wav.encode(Wav.samplesFromBytes(r.payload), 8000)))
    decodeWav(media).toDF().orderBy("media_id")
  }

  val multimodalDecodeOracle: String =
    """WITH pos AS (
      |  SELECT doc_id, CAST(unnest(range(1, strlen(text) + 1)) AS INT) AS p, text
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, CAST((ascii(substr(text, p, 1)) - 128) * 256 AS BIGINT) AS samp
      |  FROM pos),
      |agg AS (
      |  SELECT doc_id,
      |         CAST(count(*) AS BIGINT) AS n_samples,
      |         CAST(sum(samp) AS BIGINT) AS sum_amp,
      |         CAST(sum(samp * samp) AS BIGINT) AS sum_sq,
      |         CAST(max(abs(samp)) AS BIGINT) AS peak_abs
      |  FROM s GROUP BY doc_id)
      |SELECT d.doc_id AS media_id,
      |       8000 AS sample_rate, 1 AS channels, 16 AS bits_per_sample,
      |       COALESCE(a.n_samples, 0) AS n_samples,
      |       COALESCE(a.n_samples, 0) * 125 AS duration_us,
      |       COALESCE(a.sum_amp, 0) AS sum_amp,
      |       COALESCE(a.sum_sq, 0) AS sum_sq,
      |       COALESCE(a.peak_abs, 0) AS peak_abs
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY media_id""".stripMargin

  /** Oracle-checked image decode — the raster twin of
    * [[multimodalDecode]]: synthesize a P6 raster from each document's
    * bytes (rows of 16 RGB pixels, zero-padded tail), run the genuine
    * [[Ppm.decode]] header tokenizer + channel fold over it, and emit
    * integer statistics DuckDB reproduces from the same characters
    * (channel = 0-based byte position mod 3; padding bytes are zero so
    * they change no sum and no peak).
    */
  def multimodalImage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real deployment: init image codec here, once per partition
        it.flatMap { case (id, bytes) =>
          Ppm.decode(Ppm.encode(bytes)).toOption.map { p =>
            PpmFeatures(id, p.width, p.height, p.maxval, p.nPixels,
              p.sumR, p.sumG, p.sumB, p.peak)
          }
        }
      }.toDF().orderBy("media_id")
  }

  val multimodalImageOracle: String =
    s"""WITH pos AS (
      |  SELECT doc_id, CAST(unnest(range(1, strlen(text) + 1)) AS INT) AS p, text
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, ascii(substr(text, p, 1)) AS v, (p - 1) % 3 AS ch
      |  FROM pos),
      |agg AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
      |         CAST(SUM(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
      |         CAST(SUM(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
      |         MAX(v) AS peak
      |  FROM b GROUP BY doc_id)
      |SELECT d.doc_id AS media_id,
      |       ${Ppm.RowWidth} AS width,
      |       CAST(ceil(strlen(d.text) / ${Ppm.RowWidth * 3}.0) AS INT) AS height,
      |       255 AS maxval,
      |       ${Ppm.RowWidth} * CAST(ceil(strlen(d.text) / ${Ppm.RowWidth * 3}.0) AS BIGINT) AS n_pixels,
      |       COALESCE(a.sum_r, 0) AS sum_r,
      |       COALESCE(a.sum_g, 0) AS sum_g,
      |       COALESCE(a.sum_b, 0) AS sum_b,
      |       COALESCE(a.peak, 0) AS peak
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY media_id""".stripMargin

  /** Cells in the [[Ppm.ahash]] fingerprint (16 bits here; a production
    * pipeline over real images uses an 8x8 grid = 64 bits — the knob is
    * the hash width, the plumbing is identical).
    */
  val AhashCells = 16

  /** Perceptual-hash image dedup — the media twin of the text exact-dup
    * stage: synthesize each document's P6 raster, run the REAL
    * [[Ppm.ahash]] (header tokenizer + cell fold) in the mapPartitions
    * batch shape, then group identical fingerprints into duplicate sets
    * (canonical = min media_id, like `dedup_exact`). Average-hash is
    * deliberately integer-exact (`cell_sum * nCells >= total`, no
    * float means), so DuckDB reproduces the fingerprint bit-for-bit
    * from the same characters.
    *
    * Scale: hashing is map-only; the group step is ONE window shuffle
    * on the hash key. A 16-bit key space would skew at corpus scale —
    * the production knob is [[AhashCells]] = 64 (8x8 grid), which is
    * also what makes banded hamming search (as in `dedup_simhash_pairs`)
    * meaningful; the fixture keeps 16 so the whole key space is
    * exercised.
    */
  def multimodalImageDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashes = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real deployment: init image codec here, once per partition
        it.flatMap { case (id, bytes) =>
          Ppm.ahash(Ppm.encode(bytes), AhashCells).toOption.map(h => (id, h))
        }
      }.toDF("media_id", "ahash")
    val w = Window.partitionBy(col("ahash"))
    hashes
      .withColumn("canonical_id", min(col("media_id")).over(w))
      .withColumn("n_same", count(lit(1)).over(w))
      .select(col("media_id"), col("ahash"), col("canonical_id"), col("n_same"))
      .orderBy(col("media_id"))
  }

  /** The oracle rebuilds the fingerprint from the raster geometry: a
    * doc's raster is its text bytes zero-padded to 16-pixel rows
    * (3*RowWidth = 48 bytes/row), cells are equal byte ranges of size
    * 3h, and padding bytes are zero so they change no cell sum — only
    * the geometry (h, hence cell boundaries) matters, which the SQL
    * derives the same way [[Ppm.encode]] does.
    */
  val multimodalImageDedupOracle: String = {
    val rowBytes = Ppm.RowWidth * 3
    s"""WITH geom AS (
      |  SELECT doc_id, text, strlen(text) AS len,
      |         CAST(ceil(strlen(text) / $rowBytes.0) AS BIGINT) AS h
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, h, CAST(unnest(range(1, len + 1)) AS INT) AS p, text
      |  FROM geom WHERE len > 0 AND h > 0),
      |cells AS (
      |  SELECT doc_id, (p - 1) // (3 * h) AS cell,
      |         SUM(ascii(substr(text, p, 1))) AS cs
      |  FROM pos GROUP BY doc_id, (p - 1) // (3 * h)),
      |tot AS (SELECT doc_id, SUM(cs) AS t FROM cells GROUP BY doc_id),
      |hs AS (
      |  SELECT c.doc_id,
      |         CAST(SUM(CASE WHEN cs * $AhashCells >= t AND t > 0
      |                       THEN CAST(1 AS BIGINT) << CAST(cell AS INT)
      |                       ELSE 0 END) AS BIGINT) AS ahash
      |  FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id),
      |fp AS (
      |  SELECT d.doc_id AS media_id, COALESCE(hs.ahash, 0) AS ahash
      |  FROM documents d LEFT JOIN hs ON d.doc_id = hs.doc_id)
      |SELECT media_id, ahash,
      |       MIN(media_id) OVER (PARTITION BY ahash) AS canonical_id,
      |       COUNT(*) OVER (PARTITION BY ahash) AS n_same
      |FROM fp ORDER BY media_id""".stripMargin
  }

  /** Output grid for [[multimodalResize]]. */
  val ResizeW = 4
  val ResizeH = 4

  case class ResizedFeatures(media_id: Long, out_w: Int, out_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, peak: Int)

  /** Nearest-neighbor thumbnail pass — the decode → transform →
    * featurize shape a multimodal pipeline runs per image, here with the
    * REAL netpbm decode ([[Ppm.decodeRaster]]) and an integer-exact
    * resample ([[Ppm.resizeNearest]]) in the partition-parallel batch
    * shape. Integer-exact end to end, so the oracle reproduces the
    * resized raster's statistics by indexing the same source characters
    * at the nearest-neighbor grid positions (source pixel (x*w//W2,
    * y*h//H2); zero padding beyond the text). At 100 TB the transform is
    * embarrassingly parallel; the raster never leaves its partition —
    * only the fixed-size feature row does.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          Ppm.decodeRaster(Ppm.encode(bytes)).toOption.map { r =>
            val s = Ppm.resizeNearest(r, ResizeW, ResizeH)
            var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0
            var i = 0
            while (i < s.data.length) {
              val v = s.data(i) & 0xff
              (i % 3) match {
                case 0 => sr += v
                case 1 => sg += v
                case _ => sb += v
              }
              if (v > peak) peak = v
              i += 1
            }
            ResizedFeatures(id, s.width, s.height, sr, sg, sb, peak)
          }
        }
      }.toDF().orderBy("media_id")
  }

  val multimodalResizeOracle: String =
    s"""WITH g AS (
      |  SELECT doc_id, text,
      |         CAST(ceil(strlen(text) / ${Ppm.RowWidth * 3}.0) AS INT) AS h
      |  FROM documents),
      |py AS (SELECT doc_id, text, h, CAST(unnest(range(0, $ResizeH)) AS INT) AS y FROM g),
      |px AS (SELECT doc_id, text, h, y, CAST(unnest(range(0, $ResizeW)) AS INT) AS x FROM py),
      |pc AS (SELECT doc_id, text, h, y, x, CAST(unnest(range(0, 3)) AS INT) AS ch FROM px),
      |v AS (
      |  SELECT doc_id, ch,
      |         CASE WHEN pos <= strlen(text) THEN ascii(substr(text, pos, 1))
      |              ELSE 0 END AS v
      |  FROM (SELECT *,
      |          (((y * h) // $ResizeH) * ${Ppm.RowWidth}
      |            + ((x * ${Ppm.RowWidth}) // $ResizeW)) * 3 + ch + 1 AS pos
      |        FROM pc)),
      |agg AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
      |         CAST(SUM(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
      |         CAST(SUM(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
      |         MAX(v) AS peak
      |  FROM v GROUP BY doc_id)
      |SELECT doc_id AS media_id, $ResizeW AS out_w, $ResizeH AS out_h,
      |       sum_r, sum_g, sum_b, peak
      |FROM agg ORDER BY media_id""".stripMargin

  /** Energy-segmentation window length (samples) and activity threshold
    * (per-window sum of squared samples). 50 samples = 6.25 ms at the
    * synthesized 8 kHz rate — a VAD-ish frame at this fixture's document
    * lengths (the median document yields ~10 full windows). The threshold
    * sits at the fixture's median full-window energy, so real documents
    * flip between active and inactive mid-stream and the islands logic
    * genuinely splits runs (a coarser window or an off-median threshold
    * degenerates every document to a single run, verified in
    * MultimodalSpec).
    */
  val AudioWinSamples = 50
  val AudioEnergyThreshold: Long = 6640000000L

  /** Voice-activity-style audio segmentation: the real [[Wav]] codec
    * emits per-window energies partition-parallel (`decodeWindowEnergies`
    * — one long per 31 ms frame, the codec's only output), then CATALYST
    * does the segmentation: active windows become gaps-and-islands runs
    * via the `w - row_number()` grouping idiom, rolled up to per-media
    * segment counts. The division of labor is the multimodal contract at
    * 100 TB — imperative code touches bytes only, everything relational
    * (thresholding, run detection, rollup) stays in codegen'd operators.
    *
    * All emitted values are integer window counts, so DuckDB reproduces
    * them exactly from the same characters (same ASCII-fixture invariant
    * as [[multimodalDecode]], enforced by the MultimodalSpec guard).
    */
  def multimodalAudioActivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val energies = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("audio/wav").as("mime"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
      .flatMap { r =>
        val container = Wav.encode(Wav.samplesFromBytes(r.payload), 8000)
        Wav.decodeWindowEnergies(container, AudioWinSamples)
          .fold(_ => Iterator.empty[(Long, Int, Long)],
            arr => arr.iterator.zipWithIndex.map {
              case (e, w) => (r.media_id, w, e)
            })
      }
      .toDF("media_id", "w", "energy")
    val active = energies.filter(col("energy") > AudioEnergyThreshold)
      .withColumn("grp", col("w") - row_number().over(
        Window.partitionBy(col("media_id")).orderBy(col("w"))))
    val segs = active.groupBy(col("media_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    val perMedia = segs.groupBy(col("media_id"))
      .agg(sum(col("len")).as("n_active"),
        count(lit(1)).as("n_segments"),
        max(col("len")).as("longest_segment"))
    Tables.documents(spark, dir).select(col("doc_id").as("media_id"))
      .join(energies.groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_windows")), Seq("media_id"), "left")
      .join(perMedia, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_segment"), lit(0L)).as("longest_segment"))
      .orderBy(col("media_id"))
  }

  val multimodalAudioActivityOracle: String =
    s"""WITH pos AS (
      |  SELECT doc_id, CAST(unnest(range(1, strlen(text) + 1)) AS INT) AS p, text
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, (p - 1) // $AudioWinSamples AS w,
      |         SUM(CAST((ascii(substr(text, p, 1)) - 128) * 256 AS BIGINT)
      |             * CAST((ascii(substr(text, p, 1)) - 128) * 256 AS BIGINT))
      |           AS energy
      |  FROM pos GROUP BY doc_id, w),
      |nw AS (SELECT doc_id, COUNT(*) AS n_windows FROM e GROUP BY doc_id),
      |act AS (
      |  SELECT doc_id, w,
      |         w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
      |  FROM e WHERE energy > $AudioEnergyThreshold),
      |seg AS (SELECT doc_id, grp, COUNT(*) AS len FROM act GROUP BY doc_id, grp),
      |pm AS (
      |  SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_active,
      |         COUNT(*) AS n_segments, MAX(len) AS longest_segment
      |  FROM seg GROUP BY doc_id)
      |SELECT d.doc_id AS media_id,
      |       COALESCE(nw.n_windows, 0) AS n_windows,
      |       COALESCE(pm.n_active, 0) AS n_active,
      |       COALESCE(pm.n_segments, 0) AS n_segments,
      |       COALESCE(pm.longest_segment, 0) AS longest_segment
      |FROM documents d
      |LEFT JOIN nw ON d.doc_id = nw.doc_id
      |LEFT JOIN pm ON d.doc_id = pm.doc_id
      |ORDER BY media_id""".stripMargin

  /** Audio perceptual-fingerprint dedup — the audio twin of the aHash
    * image dedup: the sign of each consecutive window-energy DELTA
    * becomes one fingerprint bit (delta-sign signatures survive
    * amplitude scaling, the property that makes them perceptual), and
    * media sharing a fingerprint group into duplicate clusters. The
    * energies come through the REAL RIFF/WAVE codec partition-parallel;
    * the fingerprint fold is an integer window+aggregate (exact in both
    * engines); grouping is one fingerprint-key shuffle. A production
    * system widens to per-band energies — the plumbing is unchanged.
    */
  def multimodalAudioDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val energies = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("audio/wav").as("mime"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
      .flatMap { r =>
        val container = Wav.encode(Wav.samplesFromBytes(r.payload), 8000)
        Wav.decodeWindowEnergies(container, AudioWinSamples)
          .fold(_ => Iterator.empty[(Long, Int, Long)],
            arr => arr.iterator.zipWithIndex.map {
              case (e, w) => (r.media_id, w, e)
            })
      }
      .toDF("media_id", "w", "energy")
    val wOrd = Window.partitionBy(col("media_id")).orderBy(col("w"))
    val fps = energies
      .withColumn("prev", lag(col("energy"), 1).over(wOrd))
      .filter(col("prev").isNotNull && col("w") <= 32)
      .groupBy(col("media_id"))
      .agg(sum(when(col("energy") > col("prev"),
        expr("shiftleft(1L, w - 1)")).otherwise(lit(0L))).as("fp"),
        count(lit(1)).as("n_bits"))
    fps.groupBy(col("fp"), col("n_bits"))
      .agg(count(lit(1)).as("n_media"),
        min(col("media_id")).as("first_media"),
        max(col("media_id")).as("last_media"))
      .filter(col("n_media") >= 2)
      .orderBy(col("fp"), col("n_bits"))
  }

  val multimodalAudioDedupOracle: String =
    s"""WITH pos AS (
      |  SELECT doc_id, CAST(unnest(range(1, strlen(text) + 1)) AS INT) AS p,
      |         text
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, (p - 1) // $AudioWinSamples AS w,
      |         SUM(CAST((ascii(substr(text, p, 1)) - 128) * 256 AS BIGINT)
      |             * CAST((ascii(substr(text, p, 1)) - 128) * 256 AS BIGINT))
      |           AS energy
      |  FROM pos GROUP BY doc_id, w),
      |d AS (
      |  SELECT doc_id, w, energy,
      |         lag(energy) OVER (PARTITION BY doc_id ORDER BY w) AS prev
      |  FROM e),
      |fp AS (
      |  SELECT doc_id,
      |         CAST(SUM(CASE WHEN energy > prev
      |                       THEN 1::BIGINT << (w - 1) ELSE 0 END)
      |              AS BIGINT) AS fp,
      |         COUNT(*) AS n_bits
      |  FROM d WHERE prev IS NOT NULL AND w <= 32
      |  GROUP BY doc_id)
      |SELECT fp, n_bits, COUNT(*) AS n_media,
      |       MIN(doc_id) AS first_media, MAX(doc_id) AS last_media
      |FROM fp GROUP BY fp, n_bits HAVING COUNT(*) >= 2
      |ORDER BY fp, n_bits""".stripMargin

  /** Shot-boundary detection over the synthesized frame stream — the
    * video-segmentation shape (per-frame signature → adjacent-frame
    * difference → threshold → gaps-and-islands shots) on the same
    * deterministic document-byte "video" the frame sampler uses. The
    * per-frame signature is the frame's space count (an exact integer
    * both engines compute as `len − len(replace(f, ' ', ''))`); a shot
    * boundary fires where the signature jumps by ≥ 3 from the previous
    * frame, and consecutive same-shot frames collapse via the cumulative
    * boundary-flag island id.
    *
    * Plan: the frame explode is map-side (sequence over the
    * length-derived count, ≤ MaxFrames per media); ONE shuffle on
    * media_id serves the frame-order window, the island rollup, and the
    * per-media report. Real video swaps the signature column for a
    * decoded-histogram distance; everything downstream is unchanged.
    */
  def multimodalShotDetect(spark: SparkSession, dir: String): DataFrame = {
    val frames = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        col("text"), length(col("text")).cast("long").as("len"))
      .select(col("media_id"), col("text"),
        explode(when(col("len") > 0,
          sequence(lit(0L),
            least(ceil(col("len") / lit(FrameBytes.toDouble)).cast("long"),
              lit(MaxFrames.toLong)) - 1))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .withColumn("f",
        expr(s"substring(text, cast(frame_idx * $FrameBytes + 1 as int), $FrameBytes)"))
      .select(col("media_id"), col("frame_idx"),
        (length(col("f")) - length(regexp_replace(col("f"), " ", "")))
          .cast("long").as("sig"))
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    val shots = frames
      .withColumn("boundary",
        when(abs(col("sig") - lag(col("sig"), 1).over(w)) >= 3, 1L)
          .otherwise(0L))
      .withColumn("shot_id", sum(col("boundary")).over(wCum))
      .groupBy(col("media_id"), col("shot_id"))
      .agg(count(lit(1)).as("shot_len"))
    shots
      .groupBy(col("media_id"))
      .agg(sum(col("shot_len")).as("n_frames"),
        count(lit(1)).as("n_shots"),
        max(col("shot_len")).as("longest_shot"))
      .orderBy(col("media_id"))
  }

  val multimodalShotDetectOracle: String =
    s"""WITH fr AS (
      |  SELECT doc_id AS media_id, text,
      |         unnest(range(0, least(CAST(ceil(strlen(text) / $FrameBytes.0)
      |                                    AS BIGINT), $MaxFrames)))
      |           AS frame_idx
      |  FROM documents),
      |sig AS (
      |  SELECT media_id, frame_idx,
      |         strlen(f) - strlen(replace(f, ' ', '')) AS sig
      |  FROM (SELECT media_id, frame_idx,
      |          substr(text, CAST(frame_idx * $FrameBytes + 1 AS INT),
      |                 $FrameBytes) AS f
      |        FROM fr)),
      |b AS (
      |  SELECT media_id, frame_idx, sig,
      |         CASE WHEN abs(sig - lag(sig) OVER
      |             (PARTITION BY media_id ORDER BY frame_idx)) >= 3
      |           THEN 1 ELSE 0 END AS boundary
      |  FROM sig),
      |isl AS (
      |  SELECT media_id,
      |         SUM(boundary) OVER (PARTITION BY media_id ORDER BY frame_idx
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot_id
      |  FROM b),
      |sh AS (
      |  SELECT media_id, shot_id, COUNT(*) AS shot_len
      |  FROM isl GROUP BY media_id, shot_id)
      |SELECT media_id, CAST(SUM(shot_len) AS BIGINT) AS n_frames,
      |       COUNT(*) AS n_shots,
      |       CAST(MAX(shot_len) AS BIGINT) AS longest_shot
      |FROM sh GROUP BY media_id ORDER BY media_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_shot_detect" -> (multimodalShotDetect _),
    "multimodal_audio_dedup" -> (multimodalAudioDedup _),
    "multimodal_audio_activity" -> (multimodalAudioActivity _),
    "multimodal_resize" -> (multimodalResize _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_frames" -> (multimodalFrameSample _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_image" -> (multimodalImage _),
    "multimodal_image_dedup" -> (multimodalImageDedup _))

  def oracles: Map[String, String] = Map(
    "multimodal_shot_detect" -> multimodalShotDetectOracle,
    "multimodal_audio_dedup" -> multimodalAudioDedupOracle,
    "multimodal_audio_activity" -> multimodalAudioActivityOracle,
    "multimodal_resize" -> multimodalResizeOracle,
    "multimodal_features" -> multimodalFeaturesOracle,
    "multimodal_frames" -> multimodalFrameSampleOracle,
    "multimodal_decode" -> multimodalDecodeOracle,
    "multimodal_image" -> multimodalImageOracle,
    "multimodal_image_dedup" -> multimodalImageDedupOracle)
}
