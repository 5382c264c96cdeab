package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DocStreamJob

/** Streaming document-ingest semantics: low-quality docs rejected,
  * duplicate fingerprints dropped within the watermark with bounded
  * state, survivors appended executor-parallel.
  */
class DocStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // long, stopword-free, long-token text -> quality well above 0.5
  private val goodText = Seq.tabulate(60)(i => s"token$i word$i").mkString(" ")
  // "a a a ..." -> stop_ratio 1, tiny tokens -> quality well below 0.5
  private val junkText = Seq.fill(40)("a").mkString(" ")

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("cleanse scores like the batch operator and rejects junk") {
    val df = Seq(
      (1L, goodText, "en", ts(1000)),
      (2L, junkText, "en", ts(1001)))
      .toDF("doc_id", "text", "lang", "ingest_ts")
    val out = DocStreamJob.cleanse(df).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getAs[Double]("quality") >= 0.5)
  }

  test("streaming pipeline: junk filtered, same-fingerprint doc dropped, " +
      "survivors appended") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String, Timestamp)]
    val docs = stream.toDF().toDF("doc_id", "text", "lang", "ingest_ts")
    val out = Files.createTempDirectory("doc_sink").toString
    val ckpt = Files.createTempDirectory("doc_ckpt").toString
    val q = DocStreamJob.start(docs, ckpt)((batch, _) =>
      batch.write.mode("append").parquet(out))
    try {
      stream.addData(
        (1L, goodText, "en", ts(1000)),
        (2L, junkText, "en", ts(1001)),          // quality-rejected
        (3L, goodText + " extra tail", "en", ts(1002)))
      q.processAllAvailable()
      // doc 4 repeats doc 1's token SET (shuffled + duplicated tokens):
      // same bag-of-words fingerprint -> dropped within the watermark
      val reshuffled = (goodText.split(" ").reverse ++ Seq("token0")).mkString(" ")
      stream.addData((4L, reshuffled, "en", ts(1003)))
      q.processAllAvailable()
    } finally q.stop()
    val sunk = spark.read.parquet(out)
    assert(sunk.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    // fingerprints of survivors are distinct by construction
    assert(sunk.select("fingerprint").distinct().count() == 2)
  }
}
