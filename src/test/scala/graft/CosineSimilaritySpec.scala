package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CosineSimilarity

/** The custom codegen'd expression must agree with the pure built-in
  * composition (zip_with + aggregate) — the fallback form from SURVEY.md
  * §4 — and handle nulls/zero vectors.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("matches zip_with+aggregate composition on real embeddings") {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, TestSpark.sfDir).limit(50)
    val pairs = e.as("a").crossJoin(e.as("b")).limit(500)
      .select(
        expr("cosine_similarity(a.embedding, b.embedding)").as("native"),
        expr("""
          aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
          / (sqrt(aggregate(a.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
             * sqrt(aggregate(b.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        """).as("builtin"))
    val maxDiff = pairs.select(max(abs(col("native") - col("builtin")))).head().getDouble(0)
    assert(maxDiff < 1e-12, s"native vs builtin diverged by $maxDiff")
  }

  test("GraftExtensions installs the function into a session-extensions registry") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register without throwing
  }

  test("null inputs, length mismatch and zero vectors yield null") {
    CosineSimilarity.register(spark)
    val df = spark.sql("""
      SELECT
        cosine_similarity(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS null_in,
        cosine_similarity(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS mismatch,
        cosine_similarity(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS zero_norm,
        cosine_similarity(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
                          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS self_sim
    """)
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-15)
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, TestSpark.sfDir).limit(5)
    val df = e.as("a").crossJoin(e.as("b"))
      .select(expr("cosine_similarity(a.embedding, b.embedding)").as("s"))
    df.collect() // materialize so AQE's final (actually-executed) plan is inspected
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // formatted mode marks whole-stage-codegen operators with [codegen id : N]
    assert(formatted.contains("[codegen id :"), s"no codegen span in:\n$formatted")
    assert(formatted.linesIterator.exists(l =>
      l.contains("Project") && l.contains("codegen") ||
        l.trim.startsWith("(11)") && l.contains("codegen")) ||
      formatted.contains("* Project"), s"scoring projection not codegen'd:\n$formatted")
  }
}
