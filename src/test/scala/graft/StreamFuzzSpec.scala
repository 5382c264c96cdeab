package graft

import graft.fuzz.StreamFuzz
import org.scalatest.funsuite.AnyFunSuite

/** Differential sweep of the streaming fuzz families: each seed's REAL
  * micro-batch drive (file-source waves, watermark machinery, state
  * stores) must byte-match its in-Spark batch twin — the lagged-
  * watermark replay [[StreamFuzz.aggTwin]]/[[StreamFuzz.quotaTwin]].
  * The driver's DuckDB gate checks the registered seeds against an
  * independent engine; this suite widens the seed range (including
  * seeds NOT registered in SparkEntry) so generator changes are
  * exercised beyond the curated eight.
  */
class StreamFuzzSpec extends AnyFunSuite {
  import StreamFuzz.DriveCfg
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def check(seed: Long,
      twin: Long => (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame,
      cfg: DriveCfg = DriveCfg()): Unit = {
    val drive = StreamFuzz.generate(seed, cfg).build(spark, dir).collect()
    val batch = twin(seed)(spark, dir).collect()
    assert(drive.length == batch.length,
      s"seed $seed: drive ${drive.length} rows vs twin ${batch.length}")
    assert(drive.nonEmpty, s"seed $seed: vacuous (0 rows)")
    drive.zip(batch).zipWithIndex.foreach { case ((d, b), i) =>
      assert(d == b, s"seed $seed row $i: drive $d != twin $b")
    }
  }

  // seed→twin dispatch lives in StreamFuzz.twinFor (single source,
  // shared with RocksDbSweepSpec / FuzzSeedScan / JoinJoinProbe)
  private def twinFor(seed: Long): Long => (org.apache.spark.sql.SparkSession,
      String) => org.apache.spark.sql.DataFrame =
    _ => StreamFuzz.twinFor(seed)

  // registered + unregistered seeds, both families, both carvings.
  // Every per-family list below runs its first TWO seeds by default and
  // the full list under SPARK_GRAFT_FULL_SWEEPS=1 (TestSpark.sweep —
  // VERDICT r15 #2: the suite outgrew the driver's test budget, and an
  // expired run gives the driver NO test signal at all).
  TestSpark.sweep(Seq(12000L, 12002L, 12004L, 12005L), 2).foreach { s =>
    test(s"agg drive matches batch twin (seed $s, ${StreamFuzz.aggP(s)})") {
      check(s, StreamFuzz.aggTwin)
    }
  }

  TestSpark.sweep(Seq(12500L, 12501L, 12504L, 12505L), 2).foreach { s =>
    test(s"quota drive matches batch twin (seed $s, ${StreamFuzz.quotaP(s)})") {
      check(s, StreamFuzz.quotaTwin)
    }
  }

  TestSpark.sweep(Seq(13000L, 13002L, 13005L, 13006L), 2).foreach { s =>
    test(s"session drive matches staged-replay twin " +
        s"(seed $s, ${StreamFuzz.sessionP(s)})") {
      check(s, StreamFuzz.sessionTwin)
    }
  }

  TestSpark.sweep(Seq(13500L, 13502L, 13503L, 13504L), 2).foreach { s =>
    test(s"interval-join drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.joinP(s)})") {
      check(s, StreamFuzz.joinTwin)
    }
  }

  TestSpark.sweep(Seq(14000L, 14002L, 14004L, 14005L), 2).foreach { s =>
    test(s"streaming-dedup drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.dedupP(s)})") {
      check(s, StreamFuzz.dedupTwin)
    }
  }

  TestSpark.sweep(Seq(14500L, 14502L, 14504L, 14505L), 2).foreach { s =>
    test(s"streaming TTL-dedup (withinWatermark) drive matches batch " +
        s"twin (seed $s, ${StreamFuzz.dedupWmP(s)})") {
      check(s, StreamFuzz.dedupWmTwin)
    }
  }

  // 15009 not 15005: the left_semi rendering of 15005 is vacuous at the
  // suite's sf0.001 (8 semi rows at sf0.01, 0 here — the 24 h shuffle
  // delay thins kept clicks below the 1 h match window's density floor)
  TestSpark.sweep(Seq(15000L, 15001L, 15004L, 15009L), 2).foreach { s =>
    test(s"stream-stream ${StreamFuzz.joinPExt(s).joinType} join drive " +
        s"matches batch twin (seed $s, ${StreamFuzz.joinPExt(s)})") {
      check(s, StreamFuzz.joinExtTwin)
    }
  }

  // 15509/15510 not 15503: that rendering is vacuous at the suite's
  // sf0.001 (4 chain rows at sf0.01, 0 here — the 72 h shuffle delay
  // starves the 10 min join window); it stays OUT of the registered set
  TestSpark.sweep(Seq(15500L, 15502L, 15509L, 15510L), 2).foreach { s =>
    test(s"chained join->window-agg drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.chainP(s)})") {
      check(s, StreamFuzz.chainTwin)
    }
  }

  // registered (16000/16005/16010) + unregistered 16007; three of the
  // four carry DIFFERENT per-branch delays — the family's point
  TestSpark.sweep(Seq(16000L, 16005L, 16007L, 16010L), 2).foreach { s =>
    test(s"union dual-watermark agg drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.unionP(s)})") {
      check(s, StreamFuzz.unionTwin)
    }
  }

  TestSpark.sweep(Seq(16500L, 16501L, 16502L, 16503L), 2).foreach { s =>
    test(s"windowed-agg-over-agg drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.aggAggP(s)})") {
      check(s, StreamFuzz.aggAggTwin)
    }
  }

  TestSpark.sweep(Seq(17001L, 17004L, 17005L, 17007L), 2).foreach { s =>
    test(s"three-op chain (join->fine agg->coarse agg) drive matches " +
        s"batch twin (seed $s, ${StreamFuzz.chain3P(s)})") {
      check(s, StreamFuzz.chain3Twin)
    }
  }

  // registered (17502/17506/17510/17515) + unregistered 17508; both
  // carvings, delays from 0 to 72 h, and the jitter seeds carry the
  // heaviest bucket suppression (256 suppressed views at sf0.01 for
  // 17502) — the family's point is admission THROUGH the re-declared
  // output watermark
  TestSpark.sweep(Seq(17502L, 17506L, 17508L, 17510L, 17515L), 2).foreach { s =>
    test(s"tws-admit -> stream-stream join drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.twsJoinP(s)})") {
      check(s, StreamFuzz.twsJoinTwin)
    }
  }

  // registered (18003/18005/18007/18009) + unregistered 18011; both
  // carvings, delays 0-72 h, dedup buckets 1 h-24 h, rollup multiples
  // 2/4/8 — the dedup->agg composition's point is the DISTINCT set
  // feeding the window rollup through the untouched watermark
  TestSpark.sweep(Seq(18003L, 18005L, 18007L, 18009L, 18011L), 2).foreach { s =>
    test(s"dedup -> windowed-agg drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.dedupAggP(s)})") {
      check(s, StreamFuzz.dedupAggTwin)
    }
  }

  TestSpark.sweep(Seq(18503L, 18504L, 18508L, 18515L, 18516L), 2).foreach { s =>
    test(s"join -> join drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.joinJoinP(s)})") {
      check(s, StreamFuzz.joinJoinTwin)
    }
  }

  TestSpark.sweep(Seq(19000L, 19002L, 19004L, 19008L, 19013L), 2).foreach { s =>
    test(s"dedup -> join drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.dedupJoinP(s)})") {
      check(s, StreamFuzz.dedupJoinTwin)
    }
  }

  TestSpark.sweep(Seq(19500L, 19502L, 19508L, 19510L, 19514L), 2).foreach { s =>
    test(s"agg x agg -> window join drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.aggJoinP(s)})") {
      check(s, StreamFuzz.aggJoinTwin)
    }
  }

  TestSpark.sweep(Seq(40000L, 40004L, 40006L, 40007L, 40010L), 2).foreach { s =>
    test(s"agg x agg -> LEFT OUTER window join drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.aggJoinOuterP(s)})") {
      check(s, StreamFuzz.aggJoinOuterTwin)
    }
  }

  TestSpark.sweep(Seq(40500L, 40503L, 40507L, 40508L, 40513L), 2).foreach { s =>
    test(s"dual-delay union -> interval join drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.unionJoinP(s)})") {
      check(s, StreamFuzz.unionJoinTwin)
    }
  }

  TestSpark.sweep(Seq(41000L, 41003L, 41007L, 41008L, 41013L), 2).foreach { s =>
    test(s"tws admission -> windowed agg drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.twsAggP(s)})") {
      check(s, StreamFuzz.twsAggTwin)
    }
  }

  TestSpark.sweep(Seq(41500L, 41502L, 41507L, 41510L, 41515L), 2).foreach { s =>
    test(s"dedup -> session_window drive matches staged-replay twin " +
        s"(seed $s, ${StreamFuzz.dedupSessP(s)})") {
      check(s, StreamFuzz.dedupSessTwin)
    }
  }

  TestSpark.sweep(Seq(42001L, 42004L, 42010L, 42012L, 42014L), 2).foreach { s =>
    test(s"interval join -> dedup drive matches batch twin " +
        s"(seed $s, ${StreamFuzz.joinDedupP(s)})") {
      check(s, StreamFuzz.joinDedupTwin)
    }
  }

  TestSpark.sweep(Seq(42500L, 42503L, 42505L, 42509L, 42514L), 2).foreach { s =>
    test(s"session_window -> tumbling rollup drive matches " +
        s"replay-plus-GROUP-BY twin (seed $s, ${StreamFuzz.sessRollupP(s)})") {
      check(s, StreamFuzz.sessRollupTwin)
    }
  }

  // ---- harness-knob invariance: seeds from every family re-driven at a SECOND
  // partition config (3 state partitions, 2 salted files per wave) must
  // still match their twins — keyed streaming state is partition-count-
  // and file-layout-invariant, and a released wave stays one micro-batch
  // however many files carry it. (The registered fuzz_m* renderings put
  // one seed per family under the driver's DuckDB gate as well.)
  private val MpCfg =
    DriveCfg(tag = "mp", filesPerWave = 2, statePartitions = Some(3))

  TestSpark.sweepEvery(
    Seq(12000L, 12002L, 12004L, 12005L, 12500L, 12501L, 12504L, 12505L,
      13000L, 13002L, 13005L, 13006L, 13500L, 13502L, 13503L, 13504L,
      14000L, 14005L, 14500L, 14505L, 15000L, 15011L, 15500L, 15509L,
      16000L, 16010L, 16500L, 16503L, 17004L, 17007L, 17506L, 17515L,
      18003L, 18009L, 18504L, 18515L, 19002L, 19013L, 19500L, 19508L,
      40000L, 40007L, 40500L, 40513L, 41000L, 41007L, 41500L, 41507L,
      42004L, 42012L, 42500L, 42509L), 2)
    .foreach { s =>
      test(s"drive output invariant at 3 state partitions x 2 files/wave " +
          s"(seed $s)") {
        check(s, twinFor(s), MpCfg)
      }
    }

  // ---- crash-recovery: kill the query right after releasing the wave
  // past the midpoint (its batch un-awaited), resume from the checkpoint
  // into the exactly-once file sink — the finalized output must equal the
  // uninterrupted rendering's twin. One seed per family; the registered
  // fuzz_r* renderings additionally face the DuckDB oracle.
  TestSpark.sweepEvery(StreamFuzz.restartSeeds, 2).foreach { s =>
    test(s"mid-stream kill + checkpoint resume preserves output (seed $s)") {
      check(s, twinFor(s), DriveCfg(tag = "rt", restart = true))
    }
  }
}
