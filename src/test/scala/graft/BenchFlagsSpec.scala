package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchFlags

/** Contract of the two-channel regression tripwire's calibration rules
  * (VERDICT r13 #1) — pure-function tests, no Spark session. The
  * synthetic round pairs replay the observed driver-run noise shapes:
  * r12 (22 false batch time flags), r13 (9 false streaming flags at
  * 1.5–2.8x with a 1.018 batch scalar that modeled none of it).
  */
class BenchFlagsSpec extends AnyFunSuite {

  private val noPlans = Map.empty[String, String]
  private val noCounts = Map.empty[String, Long]

  /** A realistic drive population: names d00..dNN, baseline seconds
    * spread over the observed 2.5–13 s band, deterministic.
    */
  private def drives(n: Int): Map[String, Double] =
    (0 until n).map(i => f"d$i%02d" -> (2.5 + (i * 7919 % 100) / 9.5)).toMap

  test("uniform streaming host inflation is absorbed by the stream scalar") {
    val prev = drives(30)
    val now = prev.map { case (k, v) => k -> v * 1.8 } // loaded host
    val r = BenchFlags.compute(now, prev, streaming = prev.keySet,
      noCounts, noCounts, noPlans, noPlans)
    assert(r.timeFlags.isEmpty,
      s"uniform 1.8x inflation must not flag: ${r.timeFlags.map(_.name)}")
    assert(r.streamScalar > 1.7 && r.streamScalar < 1.9)
    // ADVICE r13 #4: the masking is itself a visible signal
    assert(r.noiseAlert && r.rawStreamTimeFlags > 20)
  }

  test("a single genuinely regressed drive flags through a quiet host") {
    val prev = drives(30)
    val now = prev.map { case (k, v) =>
      k -> (if (k == "d07") v * 3.0 else v * 1.03)
    }
    val r = BenchFlags.compute(now, prev, streaming = prev.keySet,
      noCounts, noCounts, noPlans, noPlans)
    assert(r.timeFlags.map(_.name) == Seq("d07"))
    assert(!r.noiseAlert)
  }

  test("wave-count-invariant slowdown normalizes away (r13 #1b)") {
    // d05 doubled its wall time because its wave plan gained twice the
    // micro-batches — more work, not a per-batch regression
    val prev = drives(30)
    val now = prev.map { case (k, v) =>
      k -> (if (k == "d05") v * 2.0 else v)
    }
    val prevC = prev.keys.map(_ -> 8L).toMap
    val nowC = prevC + ("d05" -> 16L)
    val r = BenchFlags.compute(now, prev, streaming = prev.keySet,
      nowC, prevC, noPlans, noPlans)
    assert(r.timeFlags.isEmpty,
      "batch-count-proportional slowdown must not flag")
    // ...but the SAME slowdown with an unchanged batch count is real
    val r2 = BenchFlags.compute(now, prev, streaming = prev.keySet,
      prevC, prevC, noPlans, noPlans)
    assert(r2.timeFlags.map(_.name) == Seq("d05"))
    // one-sided counts (baseline predates the channel) fall back to raw
    val r3 = BenchFlags.compute(now, prev, streaming = prev.keySet,
      nowC, noCounts, noPlans, noPlans)
    assert(r3.timeFlags.map(_.name) == Seq("d05"),
      "one-sided batch counts must not be used for normalization")
  }

  test("streaming and batch calibrate independently") {
    // the r13 driver shape: batch quiet (scalar ~1.0), streaming
    // broadly inflated — the batch scalar must not leak into the
    // streaming channel or vice versa
    val batchPrev = (0 until 25).map(i => f"b$i%02d" -> (0.05 + i * 0.04)).toMap
    val streamPrev = drives(25)
    val now = batchPrev ++ streamPrev.map { case (k, v) => k -> v * 1.6 }
    val r = BenchFlags.compute(now, batchPrev ++ streamPrev,
      streaming = streamPrev.keySet, noCounts, noCounts, noPlans, noPlans)
    assert(r.batchScalar < 1.05 && r.streamScalar > 1.5)
    assert(r.timeFlags.isEmpty)
  }

  test("r13 driver-run replay: the streaming wolf-cries drop to <= 2") {
    // the streaming drives the r13 driver run flagged ("plan":"n/a"),
    // real prev/now seconds (BENCH_r13.json); the background population
    // models the same run's broad mid-range inflation (its batch flags
    // sat at 1.7-2.9x on a 1.018 scalar): ratios cycling 1.45/1.55/1.65,
    // median 1.55
    val flagged = Map(
      "fuzz_m13002" -> (2.72, 4.657), "fuzz_m19013" -> (4.761, 10.362),
      "fuzz_m41013" -> (5.277, 10.288), "fuzz_q12000" -> (3.301, 5.522),
      "fuzz_q13500" -> (4.842, 13.473), "fuzz_q40503" -> (4.886, 7.617),
      "fuzz_q41500" -> (3.301, 6.991), "fuzz_r40503" -> (4.292, 7.2))
    val background = (0 until 120).map { i =>
      val ratio = Seq(1.45, 1.55, 1.65)(i % 3)
      (f"bg$i%03d", (2.5 + (i * 7919 % 100) / 9.5, 0.0)) match {
        case (k, (p, _)) => k -> (p, p * ratio)
      }
    }.toMap
    val all = flagged ++ background
    val prev = all.map { case (k, (p, _)) => k -> p }
    val now = all.map { case (k, (_, n)) => k -> n }
    val r = BenchFlags.compute(now, prev, streaming = all.keySet,
      noCounts, noCounts, noPlans, noPlans)
    assert(r.timeFlags.size <= 2,
      s"r13 replay still cries wolf: ${r.timeFlags.map(_.name)}")
    assert(r.noiseAlert, "a 1.55x-median host must raise the noise alert")
  }

  test("plan flags diff fingerprints and annotate time flags") {
    val prev = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val now = Map("a" -> 3.0, "b" -> 1.0, "c" -> 1.0)
    val prevPlans = Map("a" -> "fp1", "b" -> "fp2", "c" -> "FAILED")
    val nowPlans = Map("a" -> "fp1", "b" -> "fp2x", "c" -> "fp3")
    val r = BenchFlags.compute(now, prev, Set.empty,
      noCounts, noCounts, nowPlans, prevPlans)
    // a's time flag carries plan:"same" (triage: host noise by
    // construction); b diffs as a plan flag; c's FAILED baseline is inert
    assert(r.timeFlags.map(f => f.name -> f.planNote) == Seq("a" -> "same"))
    assert(r.planFlags.map(f => f.name) == Seq("b"))
  }

  test("failed queries and sub-floor times never flag") {
    val prev = Map("x" -> 2.0, "y" -> 0.1, "z" -> 2.0)
    val now = Map("x" -> -1.0, "y" -> 0.4, "z" -> 2.1) // x failed, y tiny
    val r = BenchFlags.compute(now, prev, Set.empty,
      noCounts, noCounts, noPlans, noPlans)
    assert(r.timeFlags.isEmpty)
  }
}
