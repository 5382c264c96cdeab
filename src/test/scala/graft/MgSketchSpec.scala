package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries sketch laws beyond the oracle's bound booleans. */
class MgSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sketch(values: Seq[String], m: Int, parts: Int): (Map[String, Long], Long, Long) = {
    import spark.implicits._
    graft.functions.MgSketch.register(spark)
    val row = values.toDF("v").repartition(parts)
      .agg(expr(s"mg_sketch(v, $m)").as("sk"))
      .select(col("sk.items"), col("sk.n"), col("sk.err")).head()
    (row.getMap[String, Long](0).toMap, row.getLong(1), row.getLong(2))
  }

  test("below capacity the sketch is exact: every count right, zero error") {
    val data = Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
    val (items, n, err) = sketch(data, m = 8, parts = 3)
    assert(n == 13 && err == 0, s"n=$n err=$err")
    assert(items == Map("a" -> 7L, "b" -> 4L, "c" -> 2L), items.toString)
  }

  test("a true majority item survives any eviction pressure and any " +
      "partitioning, with its count inside the theorem bounds") {
    val rnd = new scala.util.Random(11)
    // 60% one token, the rest spread over 50 noise tokens
    val data = rnd.shuffle(
      Seq.fill(600)("HEAVY") ++ (0 until 400).map(i => s"noise${i % 50}"))
    for (parts <- Seq(1, 7, 32)) {
      val (items, n, err) = sketch(data, m = 4, parts = parts)
      assert(n == 1000)
      // true(HEAVY)=600 > err (err <= n/(m+1) = 200) -> must be stored
      assert(err <= 200, s"error bound $err exceeds n/(m+1)")
      val c = items.getOrElse("HEAVY", 0L)
      assert(c > 0, s"majority item evicted at parts=$parts: $items")
      assert(c <= 600 && 600 - c <= err,
        s"count $c outside [${600 - err}, 600] at parts=$parts")
    }
  }

  test("every stored counter under-counts, and the bound covers every " +
      "absent item too") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val data = (0 until 3000).map(_ => s"t${rnd.nextInt(40)}")
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (items, n, err) = sketch(data, m = 10, parts = 8)
    assert(n == 3000)
    items.foreach { case (k, c) =>
      assert(c <= truth(k), s"$k over-counted: $c > ${truth(k)}")
    }
    truth.foreach { case (k, t) =>
      val c = items.getOrElse(k, 0L)
      assert(t - c <= err, s"$k: true $t, stored $c, bound $err violated")
    }
  }

  test("the sketch aggregates across streaming micro-batches: state stays " +
      "m counters and the bounds hold over the accumulated stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    graft.functions.MgSketch.register(spark)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val q = stream.toDF().toDF("v")
      .agg(expr("mg_sketch(v, 4)").as("sk"))
      .select(col("sk.items").as("items"), col("sk.n").as("n"),
        col("sk.err").as("err"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream").start()
    try {
      stream.addData(Seq.fill(300)("HEAVY") ++ (0 until 200).map(i => s"n${i % 40}"): _*)
      q.processAllAvailable()
      stream.addData(Seq.fill(300)("HEAVY") ++ (0 until 200).map(i => s"m${i % 40}"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val row = spark.sql("SELECT * FROM hh_stream").head()
    val items = row.getMap[String, Long](0).toMap
    val (n, err) = (row.getLong(1), row.getLong(2))
    assert(n == 1000, s"stream total miscounted: $n")
    assert(items.size <= 4, s"state exceeded m counters: $items")
    // true(HEAVY) = 600 > n/(m+1) = 200 >= err -> guaranteed stored
    val c = items.getOrElse("HEAVY", 0L)
    assert(c > 0 && c <= 600 && 600 - c <= err,
      s"HEAVY count $c outside bounds (err $err): $items")
  }
}
