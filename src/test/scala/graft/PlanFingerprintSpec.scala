package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.PlanFingerprint

/** Contract of the plan-fingerprint tripwire (VERDICT r12 #1): a
  * fingerprint must be (a) STABLE — identical across independent
  * builds/executions of the same query in the same data scale, else
  * the tripwire cries wolf like the wall-time one did — and (b)
  * SENSITIVE — a real plan regression (the negative controls: a
  * de-pushed filter, a changed join strategy) must change it.
  */
class PlanFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def fpOf(df: org.apache.spark.sql.DataFrame): String = {
    df.count()
    PlanFingerprint.fingerprint(df)
  }

  test("stable: two independent executions fingerprint identically") {
    for (name <- Seq("q1_pricing_summary", "q_filter_pushdown",
        "q_broadcast_join", "dedup_exact", "curation_funnel")) {
      val fn = SparkEntry.queries(name)
      val a = fpOf(fn(spark, dir))
      spark.catalog.clearCache()
      val b = fpOf(fn(spark, dir))
      assert(a == b, s"$name fingerprint unstable across executions")
    }
  }

  test("negative control: a deliberately de-pushed filter IS flagged") {
    import org.apache.spark.sql.functions.{col, expr}
    // the regression being simulated is a CODE change that stops the
    // predicate reaching the scan: the semantically-identical arithmetic
    // form defeats the parquet filter translator, so PushedFilters loses
    // the GreaterThan entry — the fingerprint must move
    val pushed = fpOf(spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_discount") > 0.08)
      .select(col("l_orderkey"), col("l_discount")))
    val depushed = fpOf(spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(expr("l_discount + cast(0.0 as double) > 0.08"))
      .select(col("l_orderkey"), col("l_discount")))
    assert(pushed != depushed,
      "de-pushed filter not visible in the fingerprint")
  }

  test("negative control: a join-strategy change IS flagged") {
    import org.apache.spark.sql.functions.col
    def q(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"$dir/lineitem.parquet")
        .join(s.read.parquet(s"$dir/nation.parquet"),
          col("l_suppkey") === col("n_nationkey"))
        .groupBy(col("n_name")).count()
    val broadcast = fpOf(q(spark))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val smj = fpOf(q(s2))
    assert(broadcast != smj,
      "BHJ->SMJ strategy change not visible in the fingerprint")
  }

  test("insensitive to partition-count knobs (the host-varying axis)") {
    import org.apache.spark.sql.functions.col
    def q(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag")).count()
    val base = fpOf(q(spark))
    // a different shuffle.partitions (the local[N]-dependent default)
    // must NOT move the fingerprint — that is what made shuffle bytes
    // host-noisy
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    val other = fpOf(q(s2))
    assert(base == other,
      "fingerprint depends on shuffle partition count — host-noisy")
  }
}
