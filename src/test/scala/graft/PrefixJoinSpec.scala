package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps

/** Certifies the prefix-filter losslessness claim of `dedup_prefix_join`
  * on randomized data (the fixture oracle proves it on one corpus; this
  * proves it on corpora the fixture never exercises): for seeded random
  * documents with injected near-dup twins, the prefix-filtered join must
  * return EXACTLY the pairs the brute-force all-pairs Jaccard finds —
  * same pairs, same rounded values. Any false negative from a prefix
  * length off-by-one (the classic AllPairs bug class) fails here.
  */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shingles(text: String): Set[String] = {
    val t = text.split(" ")
    if (t.length < 3) Set.empty
    else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
  }

  test("prefix-filtered join equals brute-force exact Jaccard on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"w$i")
    val base = (0 until 60).map { i =>
      val n = 10 + rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // inject twins: light tail edits keep Jaccard near 1; heavier edits
    // scatter pairs around the 0.6 threshold so both filter sides carry
    // real cases
    val twins = base.take(20).zipWithIndex.map { case ((id, text), k) =>
      val toks = text.split(" ").toBuffer
      (0 until (k % 6)).foreach { _ =>
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      }
      (100L + id, toks.mkString(" "))
    }
    val docs = base ++ twins
    val dir = java.nio.file.Files.createTempDirectory("graft_pj").toString
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = DedupOps.dedupPrefixJoin(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap

    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      ni = (sa intersect sb).size
      if 8L * ni >= 3L * (sa.size + sb.size)
    } yield {
      val j = ni.toDouble / (sa.size + sb.size - ni)
      (ia, ib) -> (ni.toLong, math.rint((j + 1e-9) * 1e4) / 1e4)
    }).toMap

    assert(expected.nonEmpty, "test corpus produced no qualifying pairs")
    assert(expected.exists(_._2._2 < 0.95),
      "test corpus has no pairs near the threshold — edits too light")
    assert(got.keySet == expected.keySet,
      s"pair sets differ; missing=${expected.keySet.diff(got.keySet)} " +
        s"extra=${got.keySet.diff(expected.keySet)}")
    expected.foreach { case (k, (ni, j)) =>
      assert(got(k)._1 == ni, s"pair $k n_inter ${got(k)._1} != $ni")
      assert(math.abs(got(k)._2 - j) < 1e-9, s"pair $k jaccard ${got(k)._2} != $j")
    }
  }
}
