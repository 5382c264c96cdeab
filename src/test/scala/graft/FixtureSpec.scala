package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift tripwire. The r6 round lost 26 queries + the t1 smoke
  * entry because `events.ts` silently changed parquet type
  * (timestamp[ns] → timestamp[us]) between builder sessions and the
  * engine hard-coded the old representation. This spec pins every
  * schema-sensitive fixture column so a regenerated fixture fails ONE
  * named test with an actionable message, instead of 26 opaque queries.
  */
class FixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Types the engine's schema-dispatched accessors support. The session
  // sets nanosAsLong=true, so a timestamp[ns] fixture surfaces as LongType.
  private val supportedTs: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  test("events.ts is a type Tables.eventMicros dispatches on") {
    val df = Tables.events(spark, TestSpark.sfDir)
    val t = df.schema("ts").dataType
    assert(supportedTs.contains(t),
      s"events.ts regenerated as unsupported $t — extend the " +
        "schema-dispatched Tables.eventMicros/eventSeconds accessors " +
        "(graft/Tables.scala); do NOT hard-code the representation at " +
        "call sites")
    // and the accessors actually evaluate: micros/seconds agree, and land
    // in the fixture's documented 2024-01 .. 2024-02 window
    val row = df.select(
      min(Tables.eventMicros(df)).as("lo"),
      max(Tables.eventMicros(df)).as("hi"),
      max(Tables.eventSeconds(df) * 1000000L -
        Tables.eventMicros(df)).as("drift")).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    assert(lo >= 1672531200000000L && hi < 1735689600000000L, // 2023..2025
      s"eventMicros out of plausible range: [$lo, $hi]")
    assert(math.abs(row.getLong(2)) < 1000000L,
      "eventSeconds and eventMicros disagree by more than one second")
  }

  test("orders/lineitem date columns are timestamp-typed") {
    for ((tab, c) <- Seq(
        Tables.orders(spark, TestSpark.sfDir) -> "o_orderdate",
        Tables.lineitem(spark, TestSpark.sfDir) -> "l_shipdate")) {
      val t = tab.schema(c).dataType
      assert(Set[DataType](TimestampType, TimestampNTZType, DateType)(t),
        s"$c regenerated as $t — relational oracles compare formatted " +
          "timestamps; audit RelationalOps date handling")
    }
  }

  test("embeddings.embedding is array<float> and 64-d") {
    val df = Tables.embeddings(spark, TestSpark.sfDir)
    val t = df.schema("embedding").dataType
    assert(t == ArrayType(FloatType) || t == ArrayType(FloatType, true),
      s"embedding regenerated as $t — SimilarityOps folds assume " +
        "array<float>; audit vector arithmetic casts")
    assert(df.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSet == Set(64),
      "embedding dimensionality changed from 64 — PQ/IVF codebook " +
        "constants in SimilarityOps assume 64-d")
  }

  test("documents core columns hold their types") {
    val s = Tables.documents(spark, TestSpark.sfDir).schema
    assert(s("doc_id").dataType == LongType)
    assert(s("text").dataType == StringType)
    assert(s("n_chars").dataType == LongType,
      s"n_chars regenerated as ${s("n_chars").dataType} — checksum " +
        "folds and length filters assume BIGINT")
  }

  test("columns the continuation operators dispatch on hold their types") {
    val ev = Tables.events(spark, TestSpark.sfDir).schema
    assert(ev("user_id").dataType == LongType,
      "user_id type drift — parity arms, streaks, and cohort keys assume BIGINT")
    assert(ev("value").dataType == DoubleType,
      "events.value drift — the round-5 float discipline assumes DOUBLE")
    assert(ev("event_type").dataType == StringType)
    val p = Tables.part(spark, TestSpark.sfDir).schema
    assert(p("p_name").dataType == StringType,
      "p_name drift — the Jaro-Winkler linkage catalog is string-keyed")
    val o = Tables.orders(spark, TestSpark.sfDir).schema
    assert(o("o_totalprice").dataType == DoubleType,
      "o_totalprice drift — Benford digit extraction and duplicate-payment " +
        "tolerances assume DOUBLE")
    val d = Tables.documents(spark, TestSpark.sfDir).schema
    assert(d("lang").dataType == StringType &&
      d("source").dataType == StringType,
      "lang/source drift — mixture, Gini, waterfill, and confusion " +
        "rollups assume string keys")
  }
}
