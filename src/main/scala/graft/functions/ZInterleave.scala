package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the Morton (Z-order) interleave of the
  * low [[ZInterleave.Bits]] bits of two bigint keys — bit i of `a` lands
  * at z-bit 2i, bit i of `b` at 2i+1.
  *
  * This is the multi-dimensional clustering key behind data-layout
  * optimization (Delta/Iceberg OPTIMIZE ZORDER BY): sorting a table by
  * the interleaved key makes file-level min/max ranges narrow in BOTH
  * dimensions simultaneously, so a predicate on EITHER column prunes
  * files — a plain sort clusters only its leading column. 16 bits per
  * dimension (a 32-bit z-value) is enough for file-count-scale bucket
  * spaces; callers range-bucket or range-partition on the z-value.
  *
  * Codegen'd fixed-bound loop, zero allocation, null-if-either-null
  * (BinaryExpression default).
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_interleave16 requires (bigint, bigint), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "z_interleave16"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < ZInterleave.Bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    java.lang.Long.valueOf(z)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < ${ZInterleave.Bits}; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}

object ZInterleave {
  /** Bits taken from each dimension (z-values span 2*Bits bits). */
  val Bits = 16

  /** Idempotently register `z_interleave16(a, b)` for SQL/expr use in
    * this session (also injectable via GraftExtensions).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave16",
      exprs => {
        require(exprs.length == 2,
          s"z_interleave16(a, b) takes exactly 2 arguments, got ${exprs.length}")
        ZInterleave(exprs.head, exprs(1))
      },
      "built-in")
}
