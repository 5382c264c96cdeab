package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning,
  RangePartitioning, RoundRobinPartitioning, SinglePartition}
import org.apache.spark.sql.execution.{FileSourceScanExec, InputAdapter,
  SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec,
  SortMergeJoinExec}
import org.apache.spark.sql.execution.streaming.operators.stateful.join.StreamingSymmetricHashJoinExec

/** Normalized physical-plan fingerprints — the host-noise-free perf
  * tripwire. Wall time and shuffle bytes both vary run-to-run (CPU
  * steal, AQE coalescing, listener races: 22 false time flags and 3
  * false shuffle flags in the r12 driver run), but the PLAN — join
  * strategies, exchange/partitioning structure, pushed filters, read
  * schemas, aggregate modes, codegen spans — is a pure function of the
  * code + data scale. A fingerprint diff is therefore a real plan
  * regression, never noise.
  *
  * Normalization strips everything host- or run-dependent:
  *  - expression IDs (`#123`) and per-run plan ids,
  *  - partition COUNTS (shuffle.partitions differs across hosts; AQE
  *    coalesces differently run-to-run) while keeping partitioning KEYS,
  *  - AQE shuffle-read specs (coalesce/skew splits are stats-dependent),
  *  - digits in scan path basenames (session-staged substrate dirs are
  *    `graft-stage-<random>`; the TABLE name part stays),
  *  - codegen stage numbering (the SPAN structure — which operators sit
  *    under a WholeStageCodegen — is kept via tree position).
  *
  * The whitelist direction matters: tokens are BUILT from chosen fields
  * (never from blacklist-regexing a full explain dump), so a new noisy
  * detail in some operator's string rendering cannot leak in.
  */
object PlanFingerprint {

  private def norm(s: String): String =
    s.replaceAll("#\\d+L?", "")
      .replaceAll("plan_id=\\d+", "")
      // strip dotted qualifier chains (catalog.db.table.col -> col):
      // registered bucketed tables embed a hash of their layout — which
      // includes the bucket count, a host-shape knob — in the TABLE
      // name, and key attributes carry the full qualifier
      .replaceAll("[A-Za-z_][A-Za-z0-9_]*\\.", "")
      .replaceAll("\\s+", " ").trim

  private def pathToken(name: String): String =
    name.replaceAll("[0-9]+", "N")

  private def partitioningToken(p: Any): String = p match {
    case h: HashPartitioning =>
      // key SET, sorted: the count-distinct Expand rewrite emits its
      // grouping keys in nondeterministic order run-to-run, and hash
      // co-partitioning is order-insensitive anyway
      s"hash(${h.expressions.map(e => norm(e.sql)).sorted.mkString(",")})"
    case r: RangePartitioning =>
      s"range(${r.ordering.map(o =>
        norm(o.child.sql) + ":" + o.direction.sql).mkString(",")})"
    case _: RoundRobinPartitioning => "roundrobin"
    case SinglePartition => "single"
    case other => norm(other.getClass.getSimpleName)
  }

  /** One token for a node, or None for transparent wrappers that only
    * add run-varying structure (InputAdapter, query-stage shells).
    *
    * `scrubScanPaths` is the streaming-micro-batch mode: a drive's scan
    * locations are run-scoped harness temp dirs holding per-batch
    * part-file lists (random UUID basenames), so the location collapses
    * to a constant and only the read schema / pushdown state remains —
    * checkpoint dirs, state-store paths and batch ids never enter any
    * token (whitelist construction).
    */
  private def token(p: SparkPlan, scrubScanPaths: Boolean): Option[String] = p match {
    case _: InputAdapter => None
    case _: QueryStageExec => None
    case _: AdaptiveSparkPlanExec => None
    case _: WholeStageCodegenExec => Some("WSCG")
    case _: AQEShuffleReadExec => Some("AQEShuffleRead")
    case s: FileSourceScanExec =>
      val loc =
        if (scrubScanPaths) "stream-files"
        else s.relation.location.rootPaths.map(p => pathToken(p.getName))
          .sorted.mkString(",")
      val pushed = norm(s.metadata.getOrElse("PushedFilters", ""))
      val parts = norm(s.metadata.getOrElse("PartitionFilters", ""))
      val cols = s.requiredSchema.fieldNames.mkString(",")
      Some(s"ScanParquet[$loc cols=$cols pushed=$pushed part=$parts]")
    case j: StreamingSymmetricHashJoinExec =>
      // the streaming join's type + key sets are the load-bearing shape
      // (nodeName alone would miss the r13-#1 negative control: a
      // changed join type must flag)
      Some(s"StreamSymJoin[${j.joinType}," +
        s"${j.leftKeys.map(k => norm(k.sql)).mkString(",")}|" +
        s"${j.rightKeys.map(k => norm(k.sql)).mkString(",")}]")
    case b: BatchScanExec =>
      // DSv2 (the JSONL connector): the scan's own description carries
      // its pushdown state; digits normalized for staged dirs
      Some(s"BatchScan[${pathToken(norm(b.scan.description()))}]")
    case e: ShuffleExchangeExec =>
      Some(s"Exchange[${partitioningToken(e.outputPartitioning)}]")
    case e: BroadcastExchangeExec =>
      Some(s"BroadcastExchange[${norm(e.mode.getClass.getSimpleName)}]")
    case _: ReusedExchangeExec => Some("ReusedExchange")
    case j: SortMergeJoinExec =>
      Some(s"SMJ[${j.joinType},${j.leftKeys.map(k => norm(k.sql)).mkString(",")}|" +
        s"${j.rightKeys.map(k => norm(k.sql)).mkString(",")}]")
    case j: BroadcastHashJoinExec =>
      Some(s"BHJ[${j.joinType},${j.buildSide}," +
        s"${j.leftKeys.map(k => norm(k.sql)).mkString(",")}|" +
        s"${j.rightKeys.map(k => norm(k.sql)).mkString(",")}]")
    case j: ShuffledHashJoinExec =>
      Some(s"SHJ[${j.joinType},${j.buildSide}," +
        s"${j.leftKeys.map(k => norm(k.sql)).mkString(",")}|" +
        s"${j.rightKeys.map(k => norm(k.sql)).mkString(",")}]")
    case j: BroadcastNestedLoopJoinExec =>
      Some(s"BNLJ[${j.joinType},${j.buildSide}]")
    case _: CartesianProductExec => Some("Cartesian")
    case a: BaseAggregateExec =>
      val modes = a.aggregateExpressions.map(_.mode.toString).distinct
        .sorted.mkString(",")
      val funcs = a.aggregateExpressions
        .map(_.aggregateFunction.prettyName).sorted.mkString(",")
      // sorted for the same Expand-rewrite reason as partitioningToken
      val keys = a.groupingExpressions.map(g => norm(g.sql)).sorted.mkString(",")
      Some(s"${p.nodeName}[modes=$modes funcs=$funcs keys=$keys]")
    case other => Some(norm(other.nodeName))
  }

  /** Resolve AQE wrappers to the plan that actually ran. */
  private def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case other => other.children
  }

  /** Preorder token walk with depth markers (tree shape is part of the
    * fingerprint) + each node's subquery plans.
    */
  def tokens(plan: SparkPlan, depth: Int = 0,
      scrubScanPaths: Boolean = false): Seq[String] = {
    val self = token(plan, scrubScanPaths).map(t => s"$depth:$t").toSeq
    val subs = plan.subqueries.zipWithIndex.flatMap { case (sq, i) =>
      s"$depth:subquery$i" +: tokens(sq, depth + 1, scrubScanPaths)
    }
    val kids = unwrap(plan) match {
      case Seq(inner) if token(plan, scrubScanPaths).isEmpty =>
        tokens(inner, depth, scrubScanPaths) // transparent wrapper: no depth bump
      case cs => cs.flatMap(c => tokens(c, depth + 1, scrubScanPaths))
    }
    self ++ subs ++ kids
  }

  private def hashTokens(toks: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(toks.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Fingerprint of a DataFrame's INITIAL physical plan (pre-AQE
    * runtime replan) — BY DESIGN, not by accident (ADVICE r13 #2
    * resolution): r14 tried executing each df's own QueryExecution to
    * capture AQE's FINAL plan, and 3/501 queries (dedup_exact_substr,
    * sim_bitext_margin, sim_bitext_margin_ann) fingerprinted
    * DIFFERENTLY between two identical-code, identical-data runs — the
    * runtime SMJ->BHJ conversion flips on measured (compressed) shuffle
    * sizes near the broadcast threshold, which vary run-to-run with
    * partition layout. A channel whose premise is "any diff is a real
    * regression" cannot include a run-varying axis, so the tripwire
    * pins the deterministic initial plan (342/342 stable across
    * local[8]/local[32] and iteration orders, r13) and deliberately
    * does not see runtime-only replans. Static plan changes — pushdown
    * loss, planner join-strategy changes, key/partitioning changes —
    * all land in the initial plan (PlanFingerprintSpec's negative
    * controls). Callers warm substrates with an action first; which
    * action doesn't matter, the initial plan is fixed at analysis.
    */
  def fingerprint(df: DataFrame): String =
    hashTokens(tokens(df.queryExecution.executedPlan))

  /** Fingerprint of a streaming micro-batch physical plan
    * (`StreamExecution.lastExecution.executedPlan`), with run-scoped
    * scan file lists scrubbed — see `token`'s scrubScanPaths note.
    * State-partition counts never enter (partitioningToken keeps KEYS,
    * not counts), so the host-shape knob cannot flag; streaming join
    * types and key sets do.
    */
  def fingerprintStreaming(plan: SparkPlan): String =
    hashTokens(tokens(plan, scrubScanPaths = true))

  /** Full normalized token list (debug artifact for diffing two
    * fingerprints by eye).
    */
  def debugTokens(df: DataFrame): String =
    tokens(df.queryExecution.executedPlan).mkString("\n")
}
