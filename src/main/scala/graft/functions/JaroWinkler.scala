package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity between two string
  * columns — the fuzzy-match kernel for record linkage (near-identical
  * names/titles that exact and edit-distance dedup both misprice: JW
  * weights agreeing prefixes, which is how human-entered duplicates
  * differ).
  *
  * Chosen per the extension-operator preference order (SURVEY.md §4):
  * there is no built-in composition for JW (unlike Levenshtein, which
  * Spark ships), and a UDF would box both strings per pair; this
  * expression runs the classic two-pass kernel (match flags within the
  * ⌊max/2⌋−1 window, then transposition count over matched order) as one
  * static-dispatch call that whole-stage codegen inlines into the join
  * loop. The kernel allocates two boolean scratch arrays of the string
  * lengths — bounded by the name-column width, not the data.
  *
  * Semantics pinned to the textbook definition as implemented by DuckDB's
  * `jaro_winkler_similarity` (the differential oracle): similarity 0.0
  * when either side is empty (even both — DuckDB returns 0, not 1),
  * Winkler prefix boost `jw = j + 0.1·min(4, prefix)·(1 − j)` applied
  * only when the Jaro base exceeds 0.7. Matching operates on UTF-16 code
  * units; identical to byte-wise for ASCII keys (the linkage columns
  * here), documented divergence for non-BMP text.
  *
  * Null contract: null if either input is null (BinaryExpression default).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Single static call — the JIT inlines the kernel; keeping the body
    // out of the generated source keeps the codegen method small (the
    // 8k-bytecode JIT cliff) while staying inside WholeStageCodegen.
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The Jaro–Winkler kernel (static so generated code can call it). */
  def similarity(u1: UTF8String, u2: UTF8String): Double = {
    val a = u1.toString
    val b = u2.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars compared in order; t = the count of
    // positions where they disagree, halved with INTEGER division —
    // DuckDB (rapidfuzz) floors the odd case (3 mismatches -> t = 1),
    // where the fractional-t reading of the textbook would use 1.5;
    // verified bit-exact against DuckDB on the full fixture catalog
    val halfT = {
      var c = 0
      var k = 0
      i = 0
      while (i < l1) {
        if (m1(i)) {
          while (!m2(k)) k += 1
          if (a.charAt(i) != b.charAt(k)) c += 1
          k += 1
        }
        i += 1
      }
      c
    }
    val m = matches.toDouble
    val t = (halfT / 2).toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + 0.1 * prefix * (1.0 - jaro)
  }

  /** Idempotently register `jaro_winkler(a, b)` for SQL/expr use in this
    * session (also injected via GraftExtensions).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => {
        require(exprs.length == 2,
          s"jaro_winkler(a, b) takes exactly 2 arguments, got ${exprs.length}")
        JaroWinkler(exprs.head, exprs(1))
      },
      "built-in")
}
