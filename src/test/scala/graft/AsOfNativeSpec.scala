package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.JoinOps
import graft.plans.NativeAsOf

/** The native whole-operator as-of join (custom LogicalPlan + strategy +
  * forward-merge exec) against the composed union+window formulation —
  * two independent implementations of one contract.
  */
class AsOfNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("native and composed as-of joins agree row-for-row on the fixture") {
    val native = JoinOps.qAsofNative(spark, dir).collect().toSeq
    val composed = JoinOps.qAsofJoin(spark, dir)
      .select("event_id", "user_id", "purchase_us", "click_us", "gap_sec",
        "click_value").collect().toSeq
    assert(native.size == composed.size)
    native.zip(composed).foreach { case (n, c) =>
      assert(n == c, s"native $n != composed $c")
    }
  }

  test("native plan: AsOfJoinExec with exactly two exchanges, no window, " +
      "no union") {
    val df = JoinOps.qAsofNative(spark, dir)
    df.collect()
    // the adaptive plan string prints final AND initial plans — audit the
    // final one only
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into native plan:\n$plan")
    assert(!plan.contains("Union"), s"union leaked into native plan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly 2 shuffle exchanges:\n$plan")
  }

  test("randomized differential: native == composed over adversarial " +
      "key/time collisions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // dense key space -> every key has both sides; unique (key, ts) on
    // the right so the match is well-defined under ties ACROSS sides
    val leftRows = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(50).toLong))
    val rightAll = rnd.shuffle(
      (for (k <- 0 until 12; t <- 0 until 50) yield (k.toLong, t.toLong)).toVector)
      .take(300).map { case (k, t) => (k, t, k * 1000 + t) }
    val l = leftRows.toDF("id", "k", "ts")
    val r = rightAll.toDF("k", "ts", "payload")
    val native = NativeAsOf.asOfJoin(l, r, "k", "ts", "ts")
      .select(col("id"), col("r_ts"), col("r_payload"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet
    val composed = JoinOps.asOfJoin(l, r, "k", "ts", "ts")
      .select(col("id"), col("asof.ts"), col("asof.payload"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet
    assert(native == composed)
    // and against a brute-force oracle
    val rByKey = rightAll.groupBy(_._1)
    leftRows.foreach { case (id, k, ts) =>
      val expect = rByKey.getOrElse(k, Vector.empty)
        .filter(_._2 <= ts).sortBy(_._2).lastOption
      val got = native.find(_._1 == id).get
      assert(got._2 == expect.map(_._2) && got._3 == expect.map(_._3),
        s"left($id, $k, $ts): got $got expected $expect")
    }
  }

  test("null keys and null times never match; empty right side yields all " +
      "nulls") {
    import spark.implicits._
    val l = Seq((1L, Option(1L), Option(10L)), (2L, None, Option(10L)),
      (3L, Option(1L), None)).toDF("id", "k", "ts")
    val r = Seq((Option(1L), Option(5L), "a"), (None, Option(1L), "nullkey"),
      (Option(1L), None, "nullts")).toDF("k", "ts", "v")
    val out = NativeAsOf.asOfJoin(l, r, "k", "ts", "ts")
      .select(col("id"), col("r_v")).collect()
      .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(out(1L).contains("a"), "valid match lost")
    assert(out(2L).isEmpty, "null left key matched")
    assert(out(3L).isEmpty, "null left time matched")
    val empty = NativeAsOf.asOfJoin(l,
      r.filter(lit(false)), "k", "ts", "ts")
      .select(col("id"), col("r_v")).collect()
    assert(empty.length == 3 && empty.forall(_.isNullAt(1)))
  }
}
