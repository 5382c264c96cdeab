package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Laws for the two-stage Matryoshka rerank and the margin-based bitext
  * miner that the DuckDB hash-compare cannot express on its own.
  */
class RerankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("matryoshka rerank: per-rank sims are dominated by brute-force " +
      "(a shortlist search can never beat the exact search), and ranks " +
      "are dense 1..k descending") {
    val rer = SimilarityOps.simMatryoshkaRerank(spark, dir)
      .select(col("query_id"), col("rk"), col("sim")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val brute = SimilarityOps.simTopkBruteforce(spark, dir)
      .select(col("query_id"), col("rk"), col("sim")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rer.keySet == brute.keySet, "same (query, rank) grid")
    // exact search dominates at every rank: rerank only sees the
    // shortlist, so its i-th best can't exceed the true i-th best
    rer.foreach { case (k, s) =>
      assert(s <= brute(k) + 1e-9, s"rank $k: rerank $s > brute ${brute(k)}")
    }
    val perQuery = rer.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    perQuery.foreach { case (q, rks) =>
      assert(rks == (1L to SimilarityOps.TopK.toLong), s"query $q ranks $rks")
    }
  }

  test("matryoshka rerank finds most of the true neighbors on this " +
      "corpus (prefix recall sanity)") {
    val rer = SimilarityOps.simMatryoshkaRerank(spark, dir)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilarityOps.simTopkBruteforce(spark, dir)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (rer & brute).size.toDouble / brute.size
    // isotropic fixture: a 16/64-dim prefix over a 50-of-499 shortlist
    // still recovers a solid fraction of the exact top-5; this guards
    // against the coarse stage degenerating to noise (e.g. slicing bug)
    assert(recall >= 0.3, s"recall $recall collapsed")
  }

  test("bitext margin: one best candidate per source vector, margins " +
      "finite, accepted flag consistent with the threshold") {
    val out = SimilarityOps.simBitextMargin(spark, dir).collect()
    val xs = out.map(_.getLong(0))
    assert(xs.distinct.length == xs.length, "duplicate x_id rows")
    out.foreach { r =>
      val margin = r.getDouble(3)
      assert(!margin.isNaN && !margin.isInfinite, s"margin $margin")
      assert(r.getBoolean(4) == (margin >= SimilarityOps.BitextThreshold),
        s"accepted flag disagrees with margin $margin")
    }
  }

  test("bitext margin deflates hub scores: margin ordering differs from " +
      "raw cosine ordering for at least one source (the rescale does " +
      "real work on this corpus)") {
    import spark.implicits._
    val best = SimilarityOps.simBitextMargin(spark, dir)
      .select(col("x_id"), col("y_id")).as[(Long, Long)].collect().toMap
    // raw-cosine best per x, same tiebreak
    val emb = Tables.embeddings(spark, dir)
    graft.functions.CosineSimilarity.register(spark)
    val x = emb.filter(col("label") === 0 &&
        col("vec_id") < SimilarityOps.BitextSrcIds)
      .select(col("vec_id").as("x_id"), col("embedding").as("x_emb"))
    val y = emb.filter(col("label") === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("y_emb"))
    val rawBest = x.join(y)
      .select(col("x_id"), col("y_id"),
        round(expr("cosine_similarity(x_emb, y_emb)"), 6).as("sim"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("x_id"))
          .orderBy(col("sim").desc, col("y_id"))))
      .filter(col("rk") === 1)
      .select(col("x_id"), col("y_id")).as[(Long, Long)].collect().toMap
    assert(best.keySet == rawBest.keySet)
    assert(best.exists { case (k, v) => rawBest(k) != v },
      "margin rescale never changed any winner — suspicious for a hubby corpus")
  }

  test("mmr rerank: greedy laws — rank-1 is the relevance argmax, picks " +
      "are distinct, step scores decay, and diversity actually bites") {
    val mmr = SimilarityOps.simMmrRerank(spark, dir).collect()
    val byQ = mmr.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    val bf = SimilarityOps.simTopkBruteforce(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    var diverged = false
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == Seq(1L, 2L, 3L), s"q$q")
      val picks = sorted.map(_.getAs[Long]("vec_id"))
      assert(picks.distinct.length == 3, s"repeated pick at q$q")
      val brute = bf(q).sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("vec_id"))
      assert(picks.head == brute.head,
        s"rank-1 must be the pure relevance argmax at q$q")
      // growing penalty set + shrinking pool => step scores cannot rise
      assert(sorted(1).getAs[Double]("mmr") >= sorted(2).getAs[Double]("mmr") - 1e-9,
        s"step-3 score beats step-2 at q$q")
      if (picks.toSeq != brute.take(3).toSeq) diverged = true
    }
    assert(diverged, "MMR never diverged from plain top-3 — penalty inert")
  }

  test("hybrid rrf: fused ranks are dense, scores reassemble from the " +
      "member ranks, and both lists contribute") {
    val rows = SimilarityOps.simHybridRrf(spark, dir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ==
        (1L to sorted.length).toSeq, s"ranks not dense at q$q")
      sorted.foreach { r =>
        val d = Option(r.getAs[java.lang.Long]("rank_d")).map(_.toLong)
        val l = Option(r.getAs[java.lang.Long]("rank_l")).map(_.toLong)
        assert(d.nonEmpty || l.nonEmpty, s"hit in neither list: $r")
        val expect = d.map(x => 1.0 / (SimilarityOps.RrfK + x)).getOrElse(0.0) +
          l.map(x => 1.0 / (SimilarityOps.RrfK + x)).getOrElse(0.0)
        assert(math.abs(r.getAs[Double]("rrf") - expect) < 2e-6,
          s"rrf does not reassemble from member ranks: $r")
      }
    }
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("rank_d"))),
      "no lexical-only hit in any top list — dense list swallowed the fusion")
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("rank_l"))),
      "no dense-only hit in any top list — lexical list swallowed the fusion")
  }

  test("filtered top-k: pre-filter semantics — every hit satisfies the " +
      "predicate, k is never starved, and the exact search dominates") {
    val filtered = SimilarityOps.simFilteredTopk(spark, dir).collect()
    val en = Tables.documents(spark, dir)
      .filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(filtered.length ==
      SimilarityOps.NumQueries * SimilarityOps.TopK,
      "pre-filter search must return full k per query (no starvation)")
    filtered.foreach(r => assert(en(r.getAs[Long]("vec_id")),
      s"hit escapes the lang predicate: $r"))
    val bfBest = SimilarityOps.simTopkBruteforce(spark, dir)
      .filter(col("rk") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("sim")).toMap
    filtered.filter(_.getAs[Long]("rk") == 1).foreach { r =>
      assert(r.getAs[Double]("sim") <= bfBest(r.getAs[Long]("query_id")) + 1e-9,
        s"filtered best beats the unrestricted best: $r")
    }
  }
}
