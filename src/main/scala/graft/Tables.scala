package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders for the driver-generated star schema + stream
  * tables (TESTDATA.md / FIXTURES.md §2). All queries take the sf dir as a
  * parameter so the same code runs at any scale factor — and, on a real
  * cluster, against any warehouse path.
  */
object Tables {

  /** `events.ts` as epoch MICROSECONDS, dispatched on the column's actual
    * type. The fixture has shipped as both parquet `timestamp[ns]` (reads
    * as LongType nanos under `spark.sql.legacy.parquet.nanosAsLong`) and
    * `timestamp[us]` (reads as TIMESTAMP_NTZ / TIMESTAMP); hard-coding
    * either representation breaks every ts-touching query when the fixture
    * regenerates (the r6 regression). Schema dispatch makes the engine
    * robust to both generations. Integer arithmetic only — double math
    * loses precision at 1e18. The TIMESTAMP cast is value-preserving
    * because every session pins spark.sql.session.timeZone=UTC, matching
    * the DuckDB oracle's naive `epoch_us(CAST(ts AS TIMESTAMP))`.
    */
  def eventMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000") // legacy nanos-as-Long fixture
    case _: TimestampNTZType | _: TimestampType =>
      unix_micros(col("ts").cast(TimestampType))
    case other => throw new IllegalStateException(
      s"events.ts has unexpected type $other — extend Tables.eventMicros")
  }

  /** `events.ts` as epoch SECONDS (same dispatch as [[eventMicros]]). */
  def eventSeconds(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000000000")
    case _: TimestampNTZType | _: TimestampType =>
      unix_seconds(col("ts").cast(TimestampType))
    case other => throw new IllegalStateException(
      s"events.ts has unexpected type $other — extend Tables.eventSeconds")
  }
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
