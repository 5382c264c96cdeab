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

  test("streaming incremental dedup: an arriving corpus duplicate is " +
      "flagged against the static staged index with exact jaccard") {
    import org.apache.spark.sql.functions.col
    // a corpus doc with a known batch-verified near-dup partner
    val pairs = graft.operators.DedupOps
      .dedupNgramJaccard(spark, TestSpark.sfDir).collect()
    assert(pairs.nonEmpty)
    val (da, db) = (pairs.head.getLong(0), pairs.head.getLong(1))
    val dbText = Tables.documents(spark, TestSpark.sfDir)
      .filter(col("doc_id") === db).select("text").as[String].head()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = Files.createTempDirectory("incdedup_sink").toString
    val ckpt = Files.createTempDirectory("incdedup_ckpt").toString
    val q = DocStreamJob.startIncrementalDedup(docs, TestSpark.sfDir, ckpt)(
      (batch, _) => batch.write.mode("append").parquet(out))
    try {
      stream.addData((900001L, dbText), (900002L, "zeta omega unseen phrase"))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the replayed duplicate matched its corpus original (jaccard 1.0)
    // and db's batch partner; the unseen doc matched nothing
    assert(hits.contains((900001L, db, 1.0)), s"exact copy not flagged: ${hits.toSeq}")
    assert(hits.exists(h => h._1 == 900001L && h._2 == da),
      s"batch partner $da not flagged: ${hits.toSeq}")
    assert(!hits.exists(_._1 == 900002L), s"unseen doc falsely flagged: ${hits.toSeq}")
  }

  test("streaming substring screen: an arriving doc with a copied " +
      "passage is flagged against the staged span index") {
    import org.apache.spark.sql.functions.{col, size => asize}
    import graft.operators.DedupOps
    // a corpus doc long enough to carry MinSharedSpans+SubstrW-1 windows
    val victim = Tables.documents(spark, TestSpark.sfDir)
      .filter(asize(org.apache.spark.sql.functions.split(col("text"), " "))
        >= DedupOps.SubstrW + DedupOps.MinSharedSpans + 5)
      .orderBy(col("doc_id")).select("doc_id", "text").head()
    val (vid, vtext) = (victim.getLong(0), victim.getString(1))
    // the "plagiarist": a fresh preamble + the victim's opening passage
    // (enough tokens for >= MinSharedSpans shared windows)
    val passage = vtext.split(" ")
      .take(DedupOps.SubstrW + DedupOps.MinSharedSpans + 2).mkString(" ")
    val copied = "totally novel preamble words " + passage

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = Files.createTempDirectory("substr_sink").toString
    val ckpt = Files.createTempDirectory("substr_ckpt").toString
    val q = DocStreamJob.startSubstrScreen(docs, TestSpark.sfDir, ckpt)(
      (batch, _) => batch.write.mode("append").parquet(out))
    try {
      stream.addData((910001L, copied),
        (910002L, Seq.fill(DedupOps.SubstrW + 5)("unseen").mkString(" ")))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.exists(h => h._1 == 910001L && h._2 == vid &&
      h._3 >= DedupOps.MinSharedSpans),
      s"copied passage not flagged against doc $vid: ${hits.toSeq}")
    assert(!hits.exists(_._1 == 910002L),
      s"fresh doc falsely flagged: ${hits.toSeq}")
  }

  test("streaming semantic screen: an arriving exact-copy embedding is " +
      "flagged against the staged cell index; a far vector is not") {
    import org.apache.spark.sql.functions.col
    val corpusVec = Tables.embeddings(spark, TestSpark.sfDir)
      .filter(col("vec_id") === 42L).select("embedding")
      .as[Seq[Float]].head()
    // cosine(x, -v) = -cosine(x, v); fixture pairwise |cos| <= ~0.48,
    // so the negated vector clears 0.95 against NOTHING
    val farVec = corpusVec.map(x => -x)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val vecs = stream.toDF().toDF("vec_id", "embedding")
    val out = Files.createTempDirectory("semscreen_sink").toString
    val ckpt = Files.createTempDirectory("semscreen_ckpt").toString
    val q = DocStreamJob.startSemanticScreen(
      vecs, TestSpark.sfDir, ckpt, threshold = 0.95)(
      (batch, _) => batch.write.mode("append").parquet(out))
    try {
      stream.addData((900001L, corpusVec), (900002L, farVec))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.contains((900001L, 42L, 1.0)),
      s"exact copy not flagged against its corpus original: ${hits.toSeq}")
    assert(!hits.exists(_._1 == 900002L),
      s"far vector falsely flagged: ${hits.toSeq}")
  }

  test("streaming media dedup: brightness-shifted re-encode collapses to " +
      "the first arrival, different raster survives, malformed dropped") {
    import graft.operators.MultimodalOps.Ppm
    import graft.streaming.DocStreamJob.MediaIngest
    val base = Array.tabulate(96)(i => (i % 150 + 10).toByte)
    val shifted = base.map(b => (b + 30).toByte)      // same aHash
    val n = 96
    val different = Array.tabulate(n)(i => if (i < n / 2) 200.toByte else 10.toByte)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[MediaIngest]
    val out = Files.createTempDirectory("media_sink").toString
    val ckpt = Files.createTempDirectory("media_ckpt").toString
    val q = DocStreamJob.dedupedMedia(stream.toDS()).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out); () }
      .start()
    try {
      stream.addData(
        MediaIngest(1L, Ppm.encode(base), ts(1000)),
        MediaIngest(2L, Ppm.encode(shifted), ts(1001)),   // perceptual dup
        MediaIngest(3L, Ppm.encode(different), ts(1002)),
        MediaIngest(4L, "not a ppm".getBytes, ts(1003)))  // malformed
      q.processAllAvailable()
    } finally q.stop()
    val sunk = spark.read.parquet(out)
    assert(sunk.select("media_id").as[Long].collect().toSet == Set(1L, 3L),
      "expected the first arrival of each perceptual group, nothing else")
  }
}
