package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SortedIntersectCount

/** sorted_intersect_count: parity with the built-in array_intersect on
  * sorted distinct arrays, codegen execution, analysis-time type errors.
  * (Generators sampled under a fixed seed — no scalatest-scalacheck
  * bridge in the offline cache.)
  */
class SortedIntersectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(202L + i)))

  test("matches size(array_intersect) on random sorted arrays, " +
      "duplicates included (distinct-value semantics)") {
    SortedIntersectCount.register(spark)
    // small value range forces duplicate runs inside the arrays
    val gen = Gen.listOf(Gen.chooseNum(-30L, 30L))
    val cases = samples(gen.flatMap(a => gen.map(b => (a, b))), 60)
    val rows = cases.map { case (a, b) => (a.sorted, b.sorted) }
      .toDF("a", "b")
      .select(
        expr("sorted_intersect_count(a, b)").as("merge"),
        size(array_intersect($"a", $"b")).cast("long").as("builtin"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null on null input; executes inside whole-stage codegen") {
    SortedIntersectCount.register(spark)
    val nullRow = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]])).toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)").as("c"))
    assert(nullRow.head().isNullAt(0))
    // non-foldable input (range-derived arrays) so the expression cannot
    // be constant-folded away before reaching codegen
    val df = spark.range(4)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id") + 1, col("id") + 2).as("b"))
      .select(expr("sorted_intersect_count(a, b)").as("c"))
    assert(df.collect().forall(_.getLong(0) == 1L))
    // "*(n)" prefixes mark whole-stage-codegen stages in the simple plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("optimizer rule rewrites size(array_intersect(sort_array, sort_array)) " +
      "to the native merge") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteSortedIntersect
    val df = spark.range(8)
      .select(array(col("id"), col("id") + 2).as("a"),
        array(col("id") + 2, col("id") + 4).as("b"))
      .select(size(array_intersect(sort_array(col("a")), sort_array(col("b"))))
        .as("n"))
    assert(df.queryExecution.optimizedPlan.toString
      .contains("sorted_intersect_count"), "rule did not fire:\n" +
      df.queryExecution.optimizedPlan.toString)
    assert(df.collect().forall(_.getInt(0) == 1))
  }

  test("rule leaves unsorted or non-bigint inputs untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteSortedIntersect
    val plain = spark.range(4)
      .select(array(col("id")).as("a"), array(col("id")).as("b"))
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(!plain.queryExecution.optimizedPlan.toString
      .contains("sorted_intersect_count"))
    assert(plain.collect().forall(_.getInt(0) == 1))
  }

  test("GraftExtensions installs end-to-end via spark.sql.extensions: a " +
      "clean newSession() resolves the functions from plain SQL and the " +
      "rewrite rule fires") {
    // TestSpark's context is built with
    // spark.sql.extensions=graft.GraftExtensions — the production
    // `--conf` path, class loaded by name via reflection. newSession()
    // builds a FRESH SessionState (empty temp registry: programmatic
    // register() calls made by other suites on their session do not
    // leak here), so resolution below can only come from the installed
    // extensions.
    val fresh = spark.newSession()
    val n = fresh.sql(
      "SELECT sorted_intersect_count(array(1L,2L,3L), array(2L,3L,4L)) AS n")
      .head().getLong(0)
    assert(n == 2L)
    val cos = fresh.sql(
      "SELECT cosine_similarity(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)
    // a SQL user writing the idiomatic built-in form gets the native
    // merge via the injected optimizer rule (non-foldable input so
    // constant folding cannot pre-empt the rewrite)
    val df = fresh.sql(
      """SELECT size(array_intersect(sort_array(array(id, id + 2)),
        |                            sort_array(array(id + 2, id + 4)))) AS n
        |FROM range(8)""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("sorted_intersect_count"),
      s"rule did not fire in the extensions-installed session:\n${df.queryExecution.optimizedPlan}")
    assert(df.collect().forall(_.getInt(0) == 1))
  }

  test("non-bigint arrays are rejected at analysis time") {
    SortedIntersectCount.register(spark)
    val err = intercept[Exception] {
      Seq((Seq("x"), Seq("y"))).toDF("a", "b")
        .select(expr("sorted_intersect_count(a, b)")).head()
    }
    assert(err.getMessage.contains("sorted_intersect_count") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
