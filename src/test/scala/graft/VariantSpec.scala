package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Spark 4 VARIANT semi-structured access over the events props column:
  * typed extraction laws plus the inference surface the DuckDB oracle
  * cannot hash-compare.
  */
class VariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("variant_get typed extraction agrees with from_json and regexp " +
      "over every row") {
    val ev = Tables.events(spark, dir)
    val mismatch = ev.select(
      expr("variant_get(parse_json(props), '$.k', 'long')").as("v"),
      get_json_object(col("props"), "$.k").cast("long").as("j"),
      regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("r"))
      .filter(!(col("v") <=> col("j")) || !(col("v") <=> col("r")))
      .count()
    assert(mismatch == 0L, s"$mismatch rows disagree across extractors")
  }

  test("schema_of_variant infers the object shape; missing paths are " +
      "null, not errors") {
    val schemas = Tables.events(spark, dir)
      .select(expr("schema_of_variant(parse_json(props))").as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(schemas.forall(_.contains("k")), s"unexpected shapes: $schemas")
    val missing = Tables.events(spark, dir).limit(10)
      .select(expr("variant_get(parse_json(props), '$.absent', 'long')").as("m"))
      .collect()
    assert(missing.forall(_.isNullAt(0)), "missing path did not yield null")
  }
}
