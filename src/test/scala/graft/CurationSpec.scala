package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

/** Semantic invariants for the round-3 curation operators, beyond the
  * DuckDB oracle hash check.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("source-priority dedup: survivor has the minimal (source, doc_id) " +
      "of its duplicate group; groups agree with exact dedup") {
    val rows = DedupOps.dedupSourcePriority(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byCanon = rows.groupBy(_._3)
    byCanon.foreach { case (canon, members) =>
      val best = members.map(m => (m._2, m._1)).min // (source, doc_id)
      assert(best._2 == canon,
        s"canonical $canon is not the min-(source,doc_id) member $best")
      assert(members.count(_._4 == 1L) == 1, s"group $canon survivor count != 1")
    }
    // same GROUPS as exact dedup (only the survivor choice differs):
    // group count must match dedup_exact's row count
    val exactGroups = DedupOps.dedupExact(spark, dir).count()
    assert(byCanon.size.toLong == exactGroups)
  }

  test("mixture rebalancing: over-represented languages shrink toward the " +
      "equal share, under-represented ones pass through whole") {
    val before = Tables.documents(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = TextOps.sampleMixture(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val share = before.values.sum.toDouble / before.size
    before.foreach { case (lang, n) =>
      val kept = after.getOrElse(lang, 0L)
      if (n <= share) assert(kept == n, s"$lang under share but sampled")
      else {
        // kept count concentrates near the equal share (hash residues are
        // uniform; 3x slack for the small fixture)
        assert(kept < n, s"$lang over share but not down-sampled ($kept of $n)")
        assert(kept <= 3 * share, s"$lang kept $kept vs share $share")
      }
    }
  }

  test("perplexity proxy: every nll is positive and finite") {
    val scored = TextOps.textPerplexity(spark, dir)
      .select("doc_id", "nll").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(scored.nonEmpty)
    scored.foreach { case (id, nll) =>
      assert(nll > 0.0 && !nll.isNaN && !nll.isInfinite, s"doc $id nll=$nll")
    }
  }

  test("boilerplate fraction is a ratio in [0,1] consistent with its counts") {
    val rows = DedupOps.textBoilerplate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles"); val c = r.getAs[Long]("n_common")
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(c >= 0 && c <= n)
      assert(math.abs(ratio - c.toDouble / n) < 1e-3)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("source scorecard reconciles with the manifest and the corpus") {
    import org.apache.spark.sql.functions.{col, sum}
    val stats = TextOps.curationSourceStats(spark, TestSpark.sfDirMid)
    val totals = stats.agg(
      sum(col("n_docs")), sum(col("n_dups")), sum(col("n_kept"))).head()
    val corpus = Tables.documents(spark, TestSpark.sfDirMid).count()
    val manifest = TextOps.corpusCuration(spark, TestSpark.sfDirMid).count()
    // every document is attributed to exactly one source
    assert(totals.getLong(0) == corpus,
      s"scorecard covers ${totals.getLong(0)} of $corpus docs")
    // kept rows are EXACTLY the manifest (same predicates, so the
    // scorecard can't drift from what curation actually emits)
    assert(totals.getLong(2) == manifest,
      s"scorecard n_kept ${totals.getLong(2)} != manifest rows $manifest")
    // duplicates are non-survivors: kept <= survivors <= docs per source
    val bad = stats.filter(col("n_kept") > col("n_docs") - col("n_dups")).count()
    assert(bad == 0, "a source keeps more rows than it has survivors")
  }

  test("word entropy obeys its information bounds: 0 <= H <= ln(distinct), " +
      "and a one-word doc scores exactly 0") {
    import org.apache.spark.sql.functions.{col, log => ln}
    import spark.implicits._
    val ent = TextOps.textWordEntropy(spark, TestSpark.sfDir)
    // the 1e-9 rounding nudge can lift a bound by at most 1e-4
    val bad = ent.filter(col("entropy") < -1e-4 ||
      col("entropy") > ln(col("n_distinct")) + 1e-4).count()
    assert(bad == 0, s"$bad docs violate 0 <= H <= ln(n_distinct)")
    assert(ent.count() == Tables.documents(spark, TestSpark.sfDir).count())

    val dir = java.nio.file.Files.createTempDirectory("entropy").toString
    Seq((1L, "spam spam spam spam spam", "en", "s0", 24L),
        (2L, "one two three four five", "en", "s0", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = TextOps.textWordEntropy(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L)._2 == 0.0, s"degenerate doc entropy ${m(1L)._2} != 0")
    // uniform distribution hits the ln(n_distinct) ceiling exactly
    assert(math.abs(m(2L)._2 - math.log(5)) < 1e-3,
      s"uniform doc entropy ${m(2L)._2} != ln(5)")
  }

  test("compression ratio separates looped text from diverse text, " +
      "deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val looped = Seq.fill(200)("spam").mkString(" ")
    val diverse = Seq.tabulate(200)(i =>
      f"w${(i * 2654435761L) % 99991}%x").mkString(" ")
    val df = Seq((1L, looped), (2L, diverse)).toDF("doc_id", "text")
    val out = TextOps.withCompressionRatio(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < 0.1, s"looped text ratio ${out(1L)} not tiny")
    assert(out(2L) > 3 * out(1L),
      s"diverse ${out(2L)} vs looped ${out(1L)} — no separation")
    out.values.foreach(r => assert(r > 0.0 && r <= 1.2, s"ratio $r out of band"))
    // deterministic across invocations (per-partition deflater reset)
    val again = TextOps.withCompressionRatio(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == again, "compression ratio not deterministic")
  }

  test("train/val/test split partitions the corpus near 80/10/10 and a " +
      "doc's split never depends on what else is in the corpus") {
    import org.apache.spark.sql.functions.col
    val full = TextOps.sampleSplit(spark, TestSpark.sfDirMid)
    val n = full.count()
    assert(n == Tables.documents(spark, TestSpark.sfDirMid).count(),
      "split dropped or duplicated documents")
    val frac = full.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08 &&
      math.abs(frac("val") - 0.1) < 0.05 && math.abs(frac("test") - 0.1) < 0.05,
      s"split fractions far from 80/10/10: $frac")
    // growth-stability: recompute over HALF the corpus — every shared
    // doc keeps its split (hash of the id, not of the population)
    val dir = java.nio.file.Files.createTempDirectory("split").toString
    Tables.documents(spark, TestSpark.sfDirMid)
      .filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val half = TextOps.sampleSplit(spark, dir)
    val moved = half.as("h")
      .join(full.as("f"), Seq("doc_id"))
      .filter(col("h.split") =!= col("f.split")).count()
    assert(moved == 0, s"$moved docs changed split when the corpus shrank")
  }

  test("quality percentile gate keeps exactly the NTILE arithmetic per " +
      "language, and never keeps a worse doc than it drops") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.sfDirMid
    val kept = TextOps.sampleQualityPercentile(spark, dir)
    val all = TextOps.withQuality(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("quality"))
    val perLang = all.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptPerLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      // NTILE gives the first (n mod 10) tiers one extra row; tiers
      // 1..3 therefore hold exactly this many
      val expect = TextOps.QualityTierKeep * (n / TextOps.QualityTierCount) +
        math.min(n % TextOps.QualityTierCount, TextOps.QualityTierKeep)
      assert(keptPerLang.getOrElse(lang, 0L) == expect,
        s"$lang: kept ${keptPerLang.getOrElse(lang, 0L)}, NTILE says $expect of $n")
    }
    // order soundness: per lang, the worst kept quality >= best dropped
    // (equality allowed — ties at the boundary break on doc_id)
    val dropped = all.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val keptMin = kept.groupBy("lang")
      .agg(org.apache.spark.sql.functions.min("quality").as("kmin"))
    val dropMax = dropped.groupBy("lang")
      .agg(org.apache.spark.sql.functions.max("quality").as("dmax"))
    val bad = keptMin.join(dropMax, "lang")
      .filter(col("dmax") > col("kmin") + 1e-9).count()
    assert(bad == 0, "a dropped doc outranks a kept one in the same lang")
  }

  test("gopher rules: each failure mode trips exactly its own rule") {
    import spark.implicits._
    // distinct words -> rep3/top2 stay clean unless deliberately looped
    val good = ((0 until 60).map(i => s"word$i") ++ Seq("the", "a"))
      .mkString(" ")                                  // passes everything
    val short = ((0 until 20).map(i => s"word$i") ++ Seq("the", "a"))
      .mkString(" ")                                  // fails r_wordcount only
    val looped = ("the a " + "spark " * 58).trim      // 60 words, one looped
    val nostop = (0 until 60).map(i => s"word$i").mkString(" ")
    val rows = TextOps.withGopherRules(
      Seq((1L, good), (2L, short), (3L, looped), (4L, nostop))
        .toDF("doc_id", "text"))
      .select("doc_id", "r_wordcount", "r_wordlen", "r_alpha", "r_stop",
        "r_top2", "r_rep3", "keep")
      .collect().map(r => r.getLong(0) ->
        (1 until 8).map(r.getLong).toList).toMap
    assert(rows(1L) == List(1, 1, 1, 1, 1, 1, 1), s"good doc: ${rows(1L)}")
    // short doc: word count fails, nothing else
    assert(rows(2L) == List(0, 1, 1, 1, 1, 1, 0), s"short doc: ${rows(2L)}")
    // looped doc: the repetition rules fail (top-2-gram share + dup
    // 3-grams); word count and stop rule are fine
    assert(rows(3L).head == 1 && rows(3L)(3) == 1, s"looped doc: ${rows(3L)}")
    assert(rows(3L)(4) == 0 && rows(3L)(5) == 0 && rows(3L).last == 0,
      s"looped doc should fail r_top2 + r_rep3: ${rows(3L)}")
    // no-stopword doc: only the stop rule fails
    assert(rows(4L) == List(1, 1, 1, 0, 1, 1, 0), s"nostop doc: ${rows(4L)}")
  }

  test("hashed classifier: score is the mean token weight — repetition-" +
      "invariant, averages across tokens, bounded in [-1, 1]") {
    import spark.implicits._
    def scores(docs: Seq[(Long, String)]): Map[Long, Double] =
      TextOps.withClassifierScore(docs.toDF("doc_id", "text"))
        .select("doc_id", "cls_score")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s = scores(Seq(
      (1L, "alpha"), (2L, "alpha alpha alpha"),      // same mean weight
      (3L, "beta"), (4L, "alpha beta")))             // mean of 1 and 3
    // repeating a token cannot move a mean-of-weights score
    assert(math.abs(s(1L) - s(2L)) < 1e-9, s"repetition moved score: $s")
    // two-token doc averages its tokens' single-token scores (same
    // +1e-9-then-round policy applied to the averaged raw value)
    val expected = BigDecimal((s(1L) - 1e-9 + (s(3L) - 1e-9)) / 2 + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(s(4L) - expected) < 2e-4,
      s"mixed doc not the mean: ${s(4L)} vs $expected")
    // corpus-wide bound: integer weights in [-100, 100] over any doc
    val all = TextOps.textClassifierScore(spark, dir)
      .select("cls_score").collect().map(_.getDouble(0))
    assert(all.forall(v => v >= -1.0 && v <= 1.0),
      "score escaped [-1, 1]")
  }

  test("langid confusion: cells partition the classified docs and each " +
      "row's rates sum to one") {
    val rows = TextOps.textLangidConfusion(spark, dir).collect()
    assert(rows.nonEmpty)
    val classified = TextOps.textLangId(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == classified,
      "confusion cells must partition the classified docs")
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, rs) =>
      val s = rs.map(_.getAs[Double]("rate")).sum
      assert(math.abs(s - 1.0) < 1e-2, s"rates for $l sum to $s")
    }
    rows.foreach(r => assert(r.getAs[Boolean]("is_diagonal") ==
      (r.getAs[String]("lang") == r.getAs[String]("predicted")), r.toString))
  }
}
