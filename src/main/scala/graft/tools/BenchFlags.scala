package graft.tools

/** Pure computation of Bench's regression flags — extracted so the
  * tripwire's calibration rules are unit-testable against synthetic
  * round pairs (BenchFlagsSpec replays the r13 driver-vs-committed
  * shapes) instead of living only inside a 15-minute bench run.
  *
  * Two channels, each split by query class:
  *
  *  - TIME, host-calibrated per CLASS. Batch queries calibrate on the
  *    median now/prev ratio of the 20 fastest-at-baseline shared BATCH
  *    queries (scheduling-overhead-dominated, so they track host load,
  *    not plan changes). Streaming drives get a SEPARATE scalar from
  *    the 20 fastest shared drives — their noise axes (state-store
  *    commit latency, trigger scheduling) do not correlate with the
  *    batch ones (the r13 driver run: batch scalar 1.018, yet 9 drives
  *    at 1.6–2.8x, all host noise). Each drive's time is first
  *    normalized by its recorded micro-batch count (when both rounds
  *    recorded one), so a drive that legitimately gained waves reads as
  *    more work, not a per-batch regression. Scalars are floored at 1.0
  *    — a fast host must not widen the tripwire beyond its design.
  *
  *  - PLAN: fingerprint diff vs the committed manifest. Deterministic
  *    for fixed code+data, so any diff is a real regression; each time
  *    flag carries its plan status ("same" on a loaded host = noise by
  *    construction).
  *
  * ADVICE r13 #4: the scalar can mask a uniform constant-factor
  * regression (it would inflate the calibration set too), so the raw
  * UNCALIBRATED flag counts and both scalars are first-class outputs —
  * a scalar over [[NoiseAlertThreshold]] on a supposedly quiet host is
  * itself a reviewed signal ([[Result.noiseAlert]]).
  */
object BenchFlags {

  /** A calibration scalar above this on a QUIET host means either real
    * uniform regression or a mis-set baseline — surfaced as
    * `noise_alert` in the bench summary, never auto-suppressed.
    */
  val NoiseAlertThreshold = 1.3

  case class TimeFlag(name: String, prev: Double, now: Double,
      planNote: String)
  case class PlanFlag(name: String, prev: String, now: String)
  case class Result(timeFlags: Seq[TimeFlag], planFlags: Seq[PlanFlag],
      batchScalar: Double, streamScalar: Double,
      rawBatchTimeFlags: Int, rawStreamTimeFlags: Int) {
    def noiseAlert: Boolean =
      batchScalar > NoiseAlertThreshold || streamScalar > NoiseAlertThreshold
  }

  /** now/prev wall seconds (now: -1 = failed), the streaming-drive name
    * set, per-drive micro-batch counts for both rounds (empty maps for
    * baselines predating the channel), and plan fingerprints for both
    * rounds.
    */
  def compute(now: Map[String, Double], prev: Map[String, Double],
      streaming: Set[String],
      nowBatches: Map[String, Long], prevBatches: Map[String, Long],
      nowPlans: Map[String, String],
      prevPlans: Map[String, String]): Result = {

    // per-batch normalization only when BOTH rounds recorded a count —
    // one-sided division would manufacture a fake flag (or mask a real
    // one) on the first run after the channel ships
    def normPair(k: String, n: Double, p: Double): (Double, Double) =
      (nowBatches.get(k), prevBatches.get(k)) match {
        case (Some(nb), Some(pb)) if nb > 0 && pb > 0 => (n / nb, p / pb)
        case _ => (n, p)
      }

    def shared(isStream: Boolean): Seq[String] =
      now.keysIterator.filter { k =>
        streaming.contains(k) == isStream &&
          now(k) >= 0 && prev.getOrElse(k, -1.0) > 0
      }.toSeq.sorted

    def scalar(isStream: Boolean): Double = {
      val fastest = shared(isStream).sortBy(prev).take(20)
      val ratios = fastest.map { k =>
        val (n, p) = normPair(k, now(k), prev(k)); n / p
      }.sorted
      if (ratios.isEmpty) 1.0 else math.max(1.0, ratios(ratios.size / 2))
    }

    val batchScalar = scalar(isStream = false)
    val streamScalar = scalar(isStream = true)

    def flags(isStream: Boolean, cal: Double): Seq[String] =
      shared(isStream).filter { k =>
        val (n, p) = normPair(k, now(k), prev(k))
        // the absolute floor stays on RAW wall time: a 0.1 s drive
        // cannot page a human no matter its normalized ratio
        now(k) >= 0.5 && n > 1.5 * cal * p
      }

    def planNote(k: String): String =
      (nowPlans.get(k), prevPlans.get(k)) match {
        case (Some(a), Some(b)) if b != "FAILED" =>
          if (a == b) "same" else "changed"
        case _ => "n/a"
      }

    val timeFlags =
      (flags(isStream = false, batchScalar) ++
        flags(isStream = true, streamScalar)).sorted
        .map(k => TimeFlag(k, prev(k), now(k), planNote(k)))
    val planFlags = nowPlans.toSeq.sortBy(_._1).collect {
      case (k, fp) if prevPlans.get(k).exists(p => p != "FAILED" && p != fp) =>
        PlanFlag(k, prevPlans(k), fp)
    }
    Result(timeFlags, planFlags, batchScalar, streamScalar,
      rawBatchTimeFlags = flags(isStream = false, 1.0).size,
      rawStreamTimeFlags = flags(isStream = true, 1.0).size)
  }
}
