package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join — the full whole-operator extension tier (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `graft.GraftExtensions`), next to the composed formulation in
  * [[graft.operators.JoinOps.asOfJoin]].
  *
  * Physical shape: both sides hash-cluster on the key and sort within
  * partitions by (key, time) — the SAME two exchanges the composed
  * union+window plan pays — but the match itself is a single forward
  * merge per partition: the right cursor never backs up, holds exactly
  * ONE candidate row, and each left row is emitted with the latest right
  * row at `rightTs <= leftTs`. The composed plan instead materializes a
  * unioned (left+right) sort run and drags a `last(_, ignoreNulls)`
  * running-window state through it; the merge does strictly less work
  * per row and holds O(1) state per partition — on a 100 TB fact side
  * that is the difference between sorting |L|+|R| rows and sorting the
  * two sides separately with no union materialization.
  *
  * Matching contract (identical to the composed operator and DuckDB's
  * `ASOF LEFT JOIN ... ON l.ts >= r.ts`): inclusive `rightTs <= leftTs`;
  * a left row with no prior right row gets nulls; NULL keys and NULL
  * times never match. Among right rows tied on (key, time) the surviving
  * row follows partition sort order — same caveat as the composed form;
  * deduplicate the right side first when ties are possible.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(lk, lt, rk, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Partition-local forward-merge as-of join. EnsureRequirements supplies
  * the hash clustering and the (key, time) sort on both children from
  * the declared requirements — the operator itself is pure iterator
  * logic with one held row.
  */
case class AsOfJoinExec(
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil,
      SortOrder(rightKey, Ascending) :: SortOrder(rightTs, Ascending) :: Nil)

  // left rows pass through in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nRight = right.output.size
    val (lOut, rOut, outAttrs) = (left.output, right.output, output)
    val (lk0, lt0, rk0, rt0) = (leftKey, leftTs, rightKey, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyB = BindReferences.bindReference(lk0, lOut)
      val lTsB = BindReferences.bindReference(lt0, lOut)
      val rKeyB = BindReferences.bindReference(rk0, rOut)
      val rTsB = BindReferences.bindReference(rt0, rOut)
      // bind against NULLABLE copies of the right attributes: unmatched
      // rows feed an all-null row, and a reference bound non-nullable
      // would skip the null check and read garbage zeros
      val proj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression),
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val rBuf = rIter.buffered
      // the single piece of merge state: the latest matching right row
      // for the key currently under the cursor (copied — child rows are
      // reused mutable buffers)
      var held: InternalRow = null
      var heldKey: Any = null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyB.eval(l)
          val lt = lTsB.eval(l)
          if (lk == null || lt == null) {
            // NULL key/time never matches; the cursor does not move
            return proj(joined(l, nullRight))
          }
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val rk = rKeyB.eval(rBuf.head)
            if (rk == null) {
              rBuf.next() // null right keys sort first and never match
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) {
                rBuf.next(); held = null; heldKey = null // stale key
              } else if (c == 0) {
                val rt = rTsB.eval(rBuf.head)
                if (rt == null) rBuf.next() // null time never matches
                else if (tsOrd.compare(rt, lt) <= 0) {
                  held = rBuf.next().copy(); heldKey = rk
                } else scanning = false // future row: stop, don't consume
              } else scanning = false // right is ahead; left must catch up
            }
          }
          val matched = heldKey != null && keyOrd.compare(heldKey, lk) == 0
          proj(joined(l, if (matched) held else nullRight))
        }
      }
    }
  }
}

/** Public entry for the native operator. */
object NativeAsOf {
  /** As-of join `left` to the latest `right` row with equal `key` and
    * `rightTs <= leftTs`. Right columns come back prefixed `r_` (the
    * rename also mints fresh attribute ids, which makes self-joins over
    * the same scan unambiguous without relying on analyzer
    * deduplication for a node it does not know).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val renamed = right.select(
      right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = renamed.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    org.apache.spark.sql.graft.GraftSqlShim.ofRows(left.sparkSession,
      AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, key), attr(lPlan, leftTs),
        attr(rPlan, s"r_$key"), attr(rPlan, s"r_$rightTs")))
  }
}
