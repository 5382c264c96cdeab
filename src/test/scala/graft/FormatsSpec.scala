package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** File-format surface: the engine must ingest the formats a data lake
  * actually contains — CSV and JSON with explicit schemas and
  * malformed-record policies (PERMISSIVE capture / DROPMALFORMED /
  * FAILFAST), ORC alongside parquet. Round-trips derive from the parquet
  * fixtures so content equality is checked against the source of truth.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val events = spark.read
    .parquet(s"${TestSpark.sfDir}/events.parquet")
    .select("event_id", "user_id", "event_type", "value")

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("csv round-trip with header + compression, explicit schema read") {
    val dir = Files.createTempDirectory("fmt_csv").toString
    events.write.mode("overwrite")
      .option("header", "true").option("compression", "gzip").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("orc round-trip") {
    val dir = Files.createTempDirectory("fmt_orc").toString
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(events).isEmpty)
  }

  test("json malformed-record policies: capture, drop, fail") {
    val dir = Files.createTempDirectory("fmt_json").toString
    events.limit(5).write.mode("overwrite").json(dir)
    Files.write(Paths.get(dir, "part-corrupt.json"),
      "{\"event_id\": oops not json}\n".getBytes(UTF_8))

    val withCorrupt = schema.add(StructField("_corrupt_record", StringType))
    val permissive = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(permissive.filter(col("_corrupt_record").isNull).count() == 5)

    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == 5)

    val failfast = spark.read.schema(schema)
      .option("mode", "FAILFAST").json(dir)
    intercept[SparkException] { failfast.count() }
    permissive.unpersist()
  }
}
