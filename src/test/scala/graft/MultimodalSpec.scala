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

  test("decode is deterministic (same payload -> same checksum)") {
    val (c1, h1) = MultimodalOps.FakeDecoder.decode("hello world".getBytes("UTF-8"))
    val (c2, h2) = MultimodalOps.FakeDecoder.decode("hello world".getBytes("UTF-8"))
    assert(c1 == c2 && h1.sameElements(h2))
  }
}
