package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

/** The multimodal plumbing (binary payload -> mapPartitions decode) is
  * real even though the decode kernel is a stub.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decodeFeatures runs partition-parallel over binary payloads") {
    val records = MultimodalOps.asMediaRecords(spark, TestSpark.sfDir)
    val feats = MultimodalOps.decodeFeatures(records)
    val rows = feats.collect()
    assert(rows.length == records.count())
    val r = rows.minBy(_.media_id)
    assert(r.n_bytes > 0)
    assert(r.histogram.length == 16)
    assert(math.abs(r.histogram.sum - 1.0) < 1e-9, "histogram must be normalized")
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

  test("decode is deterministic (same payload -> same checksum)") {
    val (c1, h1) = MultimodalOps.FakeDecoder.decode("hello world".getBytes("UTF-8"))
    val (c2, h2) = MultimodalOps.FakeDecoder.decode("hello world".getBytes("UTF-8"))
    assert(c1 == c2 && h1.sameElements(h2))
  }
}
