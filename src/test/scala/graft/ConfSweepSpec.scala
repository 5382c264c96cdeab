package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Engine-conf invariance sweep — the BATCH analogue of
  * [[RocksDbSweepSpec]]: query results must not depend on which
  * execution machinery Spark picks. Two variants against the session
  * default (AQE on, whole-stage codegen on):
  *
  *  - '''AQE off''': adaptive re-planning (partition coalescing, skew
  *    splits, runtime broadcast conversion) changes plan shape and
  *    aggregation order; values must survive to the rounded precision
  *    the oracles already pin.
  *  - '''codegen off''' (`wholeStage=false` + `factoryMode=NO_CODEGEN`):
  *    forces the INTERPRETED eval path of every expression — this is
  *    the global parity check for the custom Catalyst expressions
  *    (`cosine_similarity`, `jaro_winkler`, `sorted_intersect_count`,
  *    `z_interleave`): `doGenCode` and `eval`/`nullSafeEval` must agree
  *    everywhere they run, not only on JaroWinklerSpec's fixtures.
  *
  * Targets: a cross-family slice of the oracle-checked QueryFuzz seeds
  * (every 4th registered seed — non-vacuous by registration) plus the
  * named queries whose hot path runs the custom expressions. Doubles
  * compare with 1e-6 relative tolerance: AQE changes partial-sum
  * order, and float addition is not associative — exact equality would
  * test IEEE ordering, not correctness.
  */
class ConfSweepSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def underConf(pairs: (String, String)*)(f: => Array[Row])
      : Array[Row] = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def sameRows(tag: String, a: Array[Row], b: Array[Row]): Unit = {
    assert(a.length == b.length, s"$tag: ${a.length} vs ${b.length} rows")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x.length == y.length, s"$tag row $i arity")
      (0 until x.length).foreach { c =>
        (x.get(c), y.get(c)) match {
          case (d1: Double, d2: Double) =>
            val tol = 1e-6 * math.max(1.0, math.max(math.abs(d1),
              math.abs(d2)))
            assert(math.abs(d1 - d2) <= tol,
              s"$tag row $i col $c: $d1 vs $d2")
          case (f1: Float, f2: Float) =>
            assert(math.abs(f1 - f2) <= 1e-4 * math.max(1.0f,
              math.abs(f1)), s"$tag row $i col $c: $f1 vs $f2")
          case (v1, v2) =>
            assert(v1 == v2, s"$tag row $i col $c: $v1 vs $v2")
        }
      }
    }
  }

  private val AqeOff = Seq("spark.sql.adaptive.enabled" -> "false")
  private val CodegenOff = Seq(
    "spark.sql.codegen.wholeStage" -> "false",
    "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")

  private def sweep(name: String,
      build: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Unit = {
    val base = build(spark, dir).collect()
    assert(base.nonEmpty, s"$name: vacuous baseline")
    val noAqe = underConf(AqeOff: _*)(build(spark, dir).collect())
    sameRows(s"$name/aqe-off", base, noAqe)
    val noGen = underConf(CodegenOff: _*)(build(spark, dir).collect())
    sameRows(s"$name/codegen-off", base, noGen)
  }

  // every 4th registered fuzz seed — spans all twelve batch families
  private val fuzzSlice = graft.fuzz.QueryFuzz.registeredSeeds
    .zipWithIndex.collect { case (s, i) if i % 4 == 0 => s }

  fuzzSlice.foreach { s =>
    test(s"fuzz seed $s is invariant under AQE-off and codegen-off") {
      sweep(s"fuzz_q$s", graft.fuzz.QueryFuzz.generate(s).build)
    }
  }

  // named queries whose hot path is a custom Catalyst expression:
  // jaro_winkler (fuzzy linkage), sorted_intersect_count (n-gram
  // jaccard), cosine_similarity (embedding dedup + IVF top-k)
  Seq("dedup_fuzzy_linkage", "dedup_ngram_jaccard", "dedup_embedding",
      "sim_ivf_topk").foreach { q =>
    test(s"$q is invariant under AQE-off and codegen-off " +
        "(interpreted eval parity for the custom expressions)") {
      sweep(q, SparkEntry.queries(q))
    }
  }
}
