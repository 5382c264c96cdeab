package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| (DISTINCT common values) for two
  * SORTED array<bigint> columns via a fused two-pointer merge —
  * O(|A|+|B|) with zero allocation, inside whole-stage codegen.
  *
  * This is the hot inner operation of near-dup verification
  * (graft.operators.DedupOps.verifyJaccard): `array_intersect` builds a
  * hash set per row per side; for the sorted shingle-hash sets the dedup
  * pipeline produces (`sort_array(collect_list(...))`), the merge needs
  * no structure at all. Inputs MUST be sorted ascending. On a matched
  * value both pointers advance past the entire equal run, so duplicate
  * elements count ONCE — exactly `size(array_intersect(a, b))` set
  * semantics, which is what lets [[graft.plans.RewriteSortedIntersect]]
  * substitute this expression in arbitrary user plans.
  *
  * Null contract: null if either input is null (BinaryExpression default).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) {
        c += 1
        // skip the full equal run on both sides: distinct-value count
        while (i < nx && x.getLong(i) == xv) i += 1
        while (j < ny && y.getLong(j) == yv) j += 1
      }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long ${ev.value}_c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) {
         |    ${ev.value}_c++;
         |    while ($i < $nx && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $ny && $b.getLong($j) == $yv) { $j++; }
         |  }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}_c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Idempotently register `sorted_intersect_count(a, b)` for SQL/expr
    * use in this session.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => {
        require(exprs.length == 2,
          s"sorted_intersect_count(a, b) takes exactly 2 arguments, got ${exprs.length}")
        SortedIntersectCount(exprs.head, exprs(1))
      },
      "built-in")
}
