package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry returns rows; every registered query runs
  * at sf0.001 and every query has matching column sets with its oracle
  * registration.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns >0 rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns >0 rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  /** Queries intentionally registered without a DuckDB oracle (the driver
    * records a rows-only check): sketch outputs are engine-specific.
    */
  private val rowsOnly = Set("q_approx_agg")

  test("every query has an oracle (or is explicitly rows-only)") {
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet).diff(rowsOnly)
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
