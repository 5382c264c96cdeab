package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Cast, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.SortedIntersectCount

/** Optimizer rule: `size(array_intersect(sort_array(a), sort_array(b)))`
  * over non-null bigint arrays -> the native two-pointer
  * [[graft.functions.SortedIntersectCount]] merge.
  *
  * The built-in pair builds a hash set per row per side to compute an
  * intersection ARRAY that the caller immediately reduces to its size;
  * when both inputs are provably sorted (explicit ascending
  * `sort_array`) the merge computes the count directly with zero
  * allocation. Users who write the idiomatic built-in form get the
  * native expression for free when the engine's extensions are installed
  * (`spark.sql.extensions=graft.GraftExtensions`, or
  * `spark.experimental.extraOptimizations` for an existing session).
  *
  * Guards: both sides ascending `sort_array`, both element types bigint
  * with containsNull=false (the merge reads primitive longs). The merge
  * counts DISTINCT common values — identical to `array_intersect` set
  * semantics even when inputs contain duplicate runs — and the
  * replacement is wrapped in a cast back to `size`'s result type, so the
  * rewrite never changes results or schema.
  */
object RewriteSortedIntersect extends Rule[LogicalPlan] {

  private def sortedLongs(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e match {
      case SortArray(base, Literal(true, _)) =>
        base.dataType == ArrayType(LongType, containsNull = false)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // under legacy sizeOfNull (ANSI off), size(NULL) = -1 while the
      // merge returns NULL — only rewrite when a NULL input is provably
      // impossible, so the substitution can never change results
      case s @ Size(ArrayIntersect(l, r), _) if sortedLongs(l) && sortedLongs(r) &&
          (!SQLConf.get.legacySizeOfNull || (!l.nullable && !r.nullable)) =>
        Cast(SortedIntersectCount(l, r), s.dataType)
    }
}
