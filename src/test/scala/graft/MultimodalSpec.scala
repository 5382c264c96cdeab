package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

/** The multimodal plumbing (binary payload -> mapPartitions decode) over
  * the REAL pure-JVM RIFF/WAVE codec in [[MultimodalOps.Wav]].
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import MultimodalOps.Wav

  test("WAV round-trip: encode then decode recovers exact sample statistics") {
    // non-ASCII bytes too: the codec is byte-based, not char-based
    val payload = "héllo wörld \u0001ÿ".getBytes("ISO-8859-1")
    val samples = Wav.samplesFromBytes(payload)
    val wav = Wav.encode(samples, 8000)
    val info = Wav.decode(wav).toOption.get
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.nSamples == payload.length.toLong)
    assert(info.sumAmp == samples.map(_.toLong).sum)
    assert(info.sumSq == samples.map(s => s.toLong * s).sum)
    assert(info.peakAbs == samples.map(s => math.abs(s.toLong)).max)
  }

  test("WAV decode walks and skips unknown chunks with odd-size padding") {
    // encode() plants a 7-byte LIST chunk before data — decode must skip
    // it (plus its pad byte) to find data at all; also verify by hand
    val wav = Wav.encode(Array[Short](100, -200, 300), 44100)
    val info = Wav.decode(wav).toOption.get
    assert(info.sampleRate == 44100 && info.nSamples == 3)
    assert(info.sumAmp == 200 && info.peakAbs == 300)
  }

  test("WAV decode ignores trailing bytes beyond the declared RIFF size") {
    val wav = Wav.encode(Array[Short](100, -200, 300), 8000)
    // append a stray second 'data' chunk AFTER the declared RIFF body:
    // a spec-conformant walker must not parse it as part of the form
    val stray = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    stray.put("data".getBytes("US-ASCII")).putInt(4).putShort(999).putShort(999)
    val withTail = wav ++ stray.array()
    val info = Wav.decode(withTail).toOption.get
    assert(info.nSamples == 3 && info.sumAmp == 200 && info.peakAbs == 300,
      "trailing bytes outside the RIFF body leaked into the decode")
  }

  test("documents fixture is pure ASCII (the char-vs-byte invariant the " +
      "decode oracles rely on)") {
    // the DuckDB oracles for multimodal_decode/multimodal_image use
    // ascii()/strlen (CHARACTER semantics) against the engine's UTF-8
    // BYTE semantics; they coincide only while documents.text is ASCII.
    // Guard the invariant on every fixture scale the driver exercises so
    // a non-ASCII fixture change fails HERE with a cause, not as an
    // unexplained hash mismatch.
    import org.apache.spark.sql.functions.{col, length, octet_length}
    for (dir <- Seq(TestSpark.sfDir, TestSpark.sfDirMid, TestSpark.sfDirBig)) {
      val nonAscii = Tables.documents(spark, dir)
        .filter(octet_length(col("text")) =!= length(col("text"))).count()
      assert(nonAscii == 0,
        s"$dir/documents has $nonAscii non-ASCII rows — the multimodal " +
          "oracles' ascii()/strlen arithmetic no longer matches byte semantics")
    }
  }

  test("WAV decode rejects malformed containers with a reason, not a throw") {
    val good = Wav.encode(Array[Short](1, 2, 3), 8000)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Wav.decode(badMagic) == Left("bad RIFF magic"))
    // truncated mid-header
    assert(Wav.decode(good.take(10)).isLeft)
    // truncated mid-data (RIFF size now exceeds payload)
    assert(Wav.decode(good.dropRight(2)).isLeft)
    // data chunk missing entirely
    val noData = good.take(good.length - (8 + 6)) // chop data chunk
    val patched = noData.clone()
    // fix RIFF size so only the data chunk is "missing", not truncation
    val newSize = patched.length - 8
    patched(4) = (newSize & 0xff).toByte; patched(5) = ((newSize >> 8) & 0xff).toByte
    patched(6) = ((newSize >> 16) & 0xff).toByte; patched(7) = ((newSize >> 24) & 0xff).toByte
    assert(Wav.decode(patched) == Left("no data chunk"))
    // empty payload
    assert(Wav.decode(Array.emptyByteArray).isLeft)
    // odd-size fmt chunk ending exactly at the payload, no pad byte and
    // no data chunk: the clamped pad skip must yield Left, not throw
    val b = java.nio.ByteBuffer.allocate(8 + 4 + 8 + 17)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")); b.putInt(4 + 8 + 17)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")); b.putInt(17)
    b.putShort(1); b.putShort(1); b.putInt(8000); b.putInt(16000)
    b.putShort(2); b.putShort(16); b.put(0.toByte)
    assert(Wav.decode(b.array()) == Left("no data chunk"))
  }

  test("decodeWav runs partition-parallel and drops malformed rows") {
    import spark.implicits._
    val good = Wav.encode(Wav.samplesFromBytes("abc".getBytes), 8000)
    val records = Seq(
      MultimodalOps.MediaRecord(1L, good, "audio/wav", 0, 0),
      MultimodalOps.MediaRecord(2L, "not a wav at all".getBytes, "audio/wav", 0, 0))
      .toDS().repartition(2)
    val rows = MultimodalOps.decodeWav(records).collect()
    assert(rows.map(_.media_id).toSeq == Seq(1L))
    assert(rows.head.n_samples == 3 && rows.head.duration_us == 375)
  }

  test("frame sampling counts BYTES, not characters (non-ASCII payload)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 64 two-byte chars: 64 characters but 128 bytes -> TWO 64-byte
    // frames (indices 0,1), of which the even-stride sample keeps idx 0;
    // a char-unit implementation would see one frame of 64 "positions"
    val twoByte = "é" * 64
    val frames = MultimodalOps.frameSample(
      Seq((1L, twoByte)).toDF("media_id", "txt")
        .select(col("media_id"), encode(col("txt"), "UTF-8").as("payload")))
      .collect()
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L))
    assert(frames.head.getAs[Long]("byte_offset") == 0L)
    // 65 two-byte chars -> 130 bytes -> 3 frames (0,1,2), sample keeps 0,2
    val frames2 = MultimodalOps.frameSample(
      Seq((2L, "é" * 65)).toDF("media_id", "txt")
        .select(col("media_id"), encode(col("txt"), "UTF-8").as("payload")))
      .collect()
    assert(frames2.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 2L))
    assert(frames2.map(_.getAs[Long]("byte_offset")).toSeq == Seq(0L, 128L))
  }

  test("PPM round-trip: encode then decode recovers geometry and exact " +
      "channel sums through the comment-bearing header") {
    import MultimodalOps.Ppm
    val bytes = (0 until 100).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val info = Ppm.decode(Ppm.encode(bytes)).toOption.get
    assert(info.width == Ppm.RowWidth && info.maxval == 255)
    assert(info.height == math.ceil(bytes.length / 48.0).toInt)
    assert(info.nPixels == info.width.toLong * info.height)
    def chSum(c: Int) = bytes.zipWithIndex.collect {
      case (b, i) if i % 3 == c => (b & 0xff).toLong
    }.sum
    assert(info.sumR == chSum(0) && info.sumG == chSum(1) && info.sumB == chSum(2))
    assert(info.peak == bytes.map(_ & 0xff).max)
  }

  test("PPM decode rejects malformed rasters with a reason, not a throw") {
    import MultimodalOps.Ppm
    val good = Ppm.encode("some pixel bytes here".getBytes)
    assert(Ppm.decode("P5\n1 1\n255\n ".getBytes).isLeft)  // grayscale magic
    assert(Ppm.decode(good.dropRight(3)).isLeft)            // truncated raster
    assert(Ppm.decode("P6\n# only a comment".getBytes).isLeft) // truncated header
    assert(Ppm.decode("P6\n16 abc\n255\n".getBytes).isLeft) // non-numeric dim
    assert(Ppm.decode("P6\n1 1\n70000\n".getBytes).isLeft)  // maxval > 255
    assert(Ppm.decode(Array.emptyByteArray).isLeft)
  }

  test("decode is deterministic (same payload -> same statistics)") {
    val wav = Wav.encode(Wav.samplesFromBytes("hello world".getBytes("UTF-8")), 8000)
    assert(Wav.decode(wav) == Wav.decode(wav.clone()))
  }

  test("ahash is invariant under uniform brightness shift (the property " +
      "that makes it perceptual, not cryptographic)") {
    import MultimodalOps.Ppm
    // +k on every byte moves each cell sum by k*cellSize and the total
    // by k*n; since 16*cellSize == n the comparison is exactly unchanged
    val base = Array.tabulate(96)(i => (i % 150 + 10).toByte)
    val brighter = base.map(b => (b + 40).toByte) // stays < 256, no wrap
    val h1 = Ppm.ahash(Ppm.encode(base), MultimodalOps.AhashCells)
    val h2 = Ppm.ahash(Ppm.encode(brighter), MultimodalOps.AhashCells)
    assert(h1.isRight && h1 == h2,
      s"brightness shift changed the fingerprint: $h1 vs $h2")
    // and identical payloads trivially collide
    assert(h1 == Ppm.ahash(Ppm.encode(base.clone()), MultimodalOps.AhashCells))
  }

  test("ahash separates structurally different rasters and rejects " +
      "malformed containers") {
    import MultimodalOps.Ppm
    // bright-then-dark vs dark-then-bright: every cell flips sides of
    // the global mean, so the fingerprints must differ (in fact invert)
    val n = 96
    val brightFirst = Array.tabulate(n)(i => if (i < n / 2) 200.toByte else 10.toByte)
    val darkFirst = Array.tabulate(n)(i => if (i < n / 2) 10.toByte else 200.toByte)
    val h1 = Ppm.ahash(Ppm.encode(brightFirst), MultimodalOps.AhashCells)
    val h2 = Ppm.ahash(Ppm.encode(darkFirst), MultimodalOps.AhashCells)
    assert(h1.isRight && h2.isRight && h1 != h2,
      s"structurally different rasters collided: $h1")
    assert(Ppm.ahash("P5\n1 1\n255\n".getBytes, 16).isLeft)  // wrong magic
    assert(Ppm.ahash("P6\n16 abc\n255\n".getBytes, 16).isLeft)
    assert(Ppm.ahash(Array.emptyByteArray, 16).isLeft)
    // hand-checked tiny case: 48 bytes = 1 row = raster of exactly one
    // cell-per-3-bytes; first half zero, second half 255 -> high 8 bits
    val half = Array.tabulate(48)(i => if (i < 24) 0.toByte else 255.toByte)
    val h = Ppm.ahash(Ppm.encode(half), 16)
    assert(h == Right(0xFF00L), s"expected 0xFF00, got $h")
  }

  test("nearest-neighbor resize: identity at same dims, exact pixel " +
      "selection on a downsample, malformed rejected") {
    import graft.operators.MultimodalOps.Ppm
    // 4x4 raster whose pixel (x, y) carries value y*4+x in all channels
    val data = Array.tabulate(4 * 4 * 3)(i => (i / 3).toByte)
    val r = Ppm.Raster(4, 4, 255, data)
    // same dims -> bit-identical raster
    val same = Ppm.resizeNearest(r, 4, 4)
    assert(java.util.Arrays.equals(same.data, data), "identity resize changed pixels")
    // 2x2 -> floor mapping picks source pixels (0,0) (2,0) (0,2) (2,2)
    val small = Ppm.resizeNearest(r, 2, 2)
    val picked = small.data.grouped(3).map(_(0).toInt).toSeq
    assert(picked == Seq(0, 2, 8, 10), s"wrong pixels selected: $picked")
    // upsample replicates: 4x4 -> 8x8 has each source pixel 4 times
    val big = Ppm.resizeNearest(r, 8, 8)
    assert(big.data.length == 8 * 8 * 3)
    assert(big.data.grouped(3).map(_(0).toInt).toSeq.count(_ == 0) == 4)
    // decodeRaster refuses garbage like the stats decoder does
    assert(Ppm.decodeRaster("not a ppm".getBytes).isLeft)
  }

  test("audio activity: window energies agree with the codec fold, window " +
      "counts derive from payload length, and the islands logic genuinely " +
      "splits runs") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.sfDir
    val out = MultimodalOps.multimodalAudioActivity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val win = MultimodalOps.AudioWinSamples
    out.foreach { case (id, nw, nActive, nSeg, longest) =>
      assert(nw == (lens(id) + win - 1) / win,
        s"doc $id window count $nw != ceil(${lens(id)}/$win)")
      assert(nActive <= nw && longest <= nActive && nSeg <= nActive)
      assert((nSeg == 0) == (nActive == 0))
    }
    // the threshold must genuinely split runs on the fixture — a
    // degenerate all-active or single-run outcome means the constant
    // drifted from the corpus energy distribution
    assert(out.exists(_._4 > 1), "no document has multiple active segments")
    assert(out.exists(o => o._3 > 0 && o._3 < o._2),
      "no document is partially active")
    // codec-level law on one doc: per-window energies sum to the decode
    // fold's total sum of squares
    val payload = Tables.documents(spark, dir)
      .filter(col("doc_id") === out.head._1)
      .select(col("text")).head().getString(0).getBytes("UTF-8")
    val container = Wav.encode(Wav.samplesFromBytes(payload), 8000)
    val total = Wav.decode(container).toOption.get.sumSq
    val windows = Wav.decodeWindowEnergies(container, win).toOption.get
    assert(windows.sum == total, "window energies do not sum to total sumSq")
    assert(windows.length == ((payload.length + win - 1) / win))
  }

  test("audio dedup: clusters are genuine (>= 2 media), fingerprints fit " +
      "their bit budget, and the signature matches a direct codec fold") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.sfDir
    val rows = MultimodalOps.multimodalAudioDedup(spark, dir).collect()
    assert(rows.nonEmpty, "fixture must surface duplicate clusters")
    rows.foreach { r =>
      val (fp, bits, n) = (r.getAs[Long]("fp"), r.getAs[Long]("n_bits"),
        r.getAs[Long]("n_media"))
      assert(n >= 2, r.toString)
      assert(fp >= 0 && fp < (1L << bits.toInt), s"fp escapes bit budget: $r")
      assert(r.getAs[Long]("first_media") < r.getAs[Long]("last_media"))
    }
    // direct-codec recomputation for one clustered document
    val doc = Tables.documents(spark, dir)
      .filter(col("doc_id") === rows.head.getAs[Long]("first_media"))
      .select("text").collect().head.getString(0)
    val energies = MultimodalOps.Wav.decodeWindowEnergies(
      MultimodalOps.Wav.encode(
        MultimodalOps.Wav.samplesFromBytes(doc.getBytes("UTF-8")), 8000),
      MultimodalOps.AudioWinSamples).toOption.get
    // mirror the operator's w <= 32 bit cap: a fixture doc with > 33
    // energy windows would otherwise add uncapped (and past i=63,
    // silently wrapping) 1L << i terms the engine never emits
    val expectFp = energies.take(33).sliding(2).zipWithIndex.collect {
      case (Array(a, b), i) if b > a => 1L << i
    }.sum
    assert(expectFp == rows.head.getAs[Long]("fp"),
      s"engine fingerprint disagrees with the direct codec fold")
  }

  test("shot detection: shots partition the frame stream and frame counts " +
      "match the sampler's cap") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.sfDir
    val rows = MultimodalOps.multimodalShotDetect(spark, dir).collect()
    assert(rows.nonEmpty)
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var multiShot = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val expFrames = math.min(
        math.ceil(lens(id) / MultimodalOps.FrameBytes.toDouble).toLong,
        MultimodalOps.MaxFrames.toLong)
      assert(r.getAs[Long]("n_frames") == expFrames, s"frame count: $r")
      val (nShots, longest) =
        (r.getAs[Long]("n_shots"), r.getAs[Long]("longest_shot"))
      assert(nShots >= 1 && nShots <= r.getAs[Long]("n_frames"), r.toString)
      assert(longest >= 1 && longest <= r.getAs[Long]("n_frames"), r.toString)
      // n_shots runs covering n_frames: longest >= ceil(avg run)
      assert(longest * nShots >= r.getAs[Long]("n_frames"), r.toString)
      if (nShots > 1) multiShot += 1
    }
    assert(multiShot > 0, "fixture must exercise at least one boundary")
  }
}
