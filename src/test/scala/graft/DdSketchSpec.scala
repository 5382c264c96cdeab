package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDSketch laws beyond the oracle's bound booleans: the relative-error
  * guarantee against the exact order statistic, partitioning invariance
  * (merge order cannot move the estimate), and the rank convention
  * matching percentile_disc.
  */
class DdSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sketch(values: Seq[Double], alpha: Double, parts: Int): (Long, Option[Double], Option[Double], Option[Double]) = {
    import spark.implicits._
    graft.functions.DdSketch.register(spark)
    val row = values.toDF("v").repartition(parts)
      .agg(expr(s"dd_sketch(v, $alpha)").as("sk"))
      .select(col("sk.n"), col("sk.p50"), col("sk.p95"), col("sk.p99")).head()
    def opt(i: Int) = if (row.isNullAt(i)) None else Some(row.getDouble(i))
    (row.getLong(0), opt(1), opt(2), opt(3))
  }

  /** percentile_disc rank: 1-based max(1, ceil(q*n)). */
  private def exactDisc(sorted: IndexedSeq[Double], q: Double): Double =
    sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)

  test("estimates land within relative alpha of the exact order statistic, " +
      "for every partitioning, and are partitioning-invariant") {
    val rnd = new scala.util.Random(7)
    // log-uniform positives across 5 decades — exercises many buckets
    val data = Seq.fill(5000)(math.exp(rnd.nextDouble() * math.log(1e5)))
    val sorted = data.sorted.toIndexedSeq
    val alpha = 0.01
    val results = Seq(1, 8, 32).map(parts => sketch(data, alpha, parts))
    for ((n, p50, p95, p99) <- results) {
      assert(n == 5000)
      for ((est, q) <- Seq(p50 -> 0.5, p95 -> 0.95, p99 -> 0.99)) {
        val ex = exactDisc(sorted, q)
        assert(math.abs(est.get - ex) <= alpha * 1.001 * ex,
          s"q=$q est=${est.get} exact=$ex")
      }
    }
    // bucket counts are a multiset function: merge order can't move output
    assert(results.distinct.size == 1, s"partitioning moved the estimate: $results")
  }

  test("rank convention matches percentile_disc on a tiny explicit multiset") {
    // 10 values; p50 rank = ceil(0.5*10) = 5 -> 50.0; p99 rank=10 -> 100.0
    val data = (1 to 10).map(_ * 10.0)
    val (n, p50, _, p99) = sketch(data, alpha = 0.001, parts = 3)
    assert(n == 10)
    assert(math.abs(p50.get - 50.0) <= 0.002 * 50.0, s"p50=$p50")
    assert(math.abs(p99.get - 100.0) <= 0.002 * 100.0, s"p99=$p99")
  }

  test("non-positive values count toward n and rank below every positive " +
      "bucket; an all-nonpositive stream estimates 0.0; empty input is NULL") {
    val (n, p50, p95, _) = sketch(Seq(-5.0, 0.0, 0.0, 1000.0), 0.01, 2)
    assert(n == 4)
    assert(p50.get == 0.0, s"median of 3 nonpositives + one positive: $p50")
    assert(math.abs(p95.get - 1000.0) <= 0.011 * 1000.0, s"p95=$p95")
    val (n0, q50, _, _) = sketch(Seq(-1.0, -2.0), 0.01, 1)
    assert(n0 == 2 && q50.get == 0.0)
    import spark.implicits._
    graft.functions.DdSketch.register(spark)
    val empty = Seq.empty[Double].toDF("v")
      .agg(expr("dd_sketch(v, 0.01)").as("sk")).select(col("sk.p50")).head()
    assert(empty.isNullAt(0), "empty input must yield NULL quantiles")
  }

  test("the aggregate plans with a map-side partial (no raw-row shuffle)") {
    import spark.implicits._
    graft.functions.DdSketch.register(spark)
    val plan = (1 to 100).map(_.toDouble).toDF("v")
      .withColumn("g", (col("v") % 4).cast("int"))
      .groupBy(col("g")).agg(expr("dd_sketch(v, 0.01)"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs partial_dd_sketch below the exchange
    assert(plan.contains("partial_dd_sketch"), plan)
  }
}
