package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Dedup family invariants beyond the per-query DuckDB oracle. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("minhash-LSH pairs are a subset of exact jaccard pairs (verification step)") {
    val jac = DedupOps.dedupNgramJaccard(spark, TestSpark.sfDir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.dedupMinhashLsh(spark, TestSpark.sfDir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(jac), s"LSH produced non-verified pairs: ${lsh.diff(jac)}")
    assert(lsh.nonEmpty, "LSH found no candidate pairs on the fixture corpus")
    val recall = lsh.size.toDouble / jac.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8 (found ${lsh.size}/${jac.size})")
  }

  test("exactDedup (dropDuplicates) keeps one row per key") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val deduped = DedupOps.exactDedup(docs, Seq("lang"))
    assert(deduped.count() == docs.select("lang").distinct().count())
  }

  test("clusters: both ends of every near-dup pair share a canonical id, " +
      "which is the cluster minimum") {
    val clusters = DedupOps.dedupClusters(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = DedupOps.dedupNgramJaccard(spark, TestSpark.sfDir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1,
        s"pair ($a,$b) split across clusters ${clusters(a)._1}/${clusters(b)._1}")
    }
    // canonical = min member; sizes consistent; non-dup docs are singletons
    val byCluster = clusters.groupBy(_._2._1)
    byCluster.foreach { case (canon, members) =>
      assert(members.keys.min == canon, s"cluster $canon canonical not the min")
      assert(members.values.map(_._2).toSet == Set(members.size.toLong))
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.collect { case (d, (c, sz)) if !paired.contains(d) =>
      assert(c == d && sz == 1L, s"unpaired doc $d in cluster $c size $sz")
    }
  }

  test("clusters on a pair-free corpus: every doc is its own singleton " +
      "(no NPE on the empty label sum)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nodup").toString
    Seq((1L, "alpha beta gamma delta", "en", "s0", 22L),
        (2L, "epsilon zeta eta theta", "en", "s1", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.dedupClusters(spark, dir).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "singleton not self-canonical")
      assert(r.getLong(2) == 1L && r.getLong(3) == 1L)
    }
  }

  test("incremental dedup: a new doc finds its batch-verified near-dup " +
      "partners plus its own exact copy, with matching jaccard") {
    val pairs = DedupOps.dedupNgramJaccard(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    val (da, db, jac) = pairs.head
    // replay the corpus doc `db` as a new arrival
    val newDocs = Tables.documents(spark, TestSpark.sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === db)
    val hits = DedupOps.dedupIncremental(spark, TestSpark.sfDir, newDocs)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(hits.get(db).contains(1.0), s"self copy not reported as exact: $hits")
    assert(hits.get(da).contains(jac),
      s"batch partner $da (jaccard $jac) missing or different: $hits")
    // incremental must not invent pairs the batch pipeline rejects:
    // every reported corpus partner (minus self) is a batch pair of db
    val batchPartners = pairs.collect {
      case (a, b, _) if a == db => b
      case (a, b, _) if b == db => a
    }.toSet
    assert((hits.keySet - db).subsetOf(batchPartners),
      s"extra partners: ${hits.keySet - db -- batchPartners}")
  }

  test("near-dup pairs sit far below the random simhash hamming baseline") {
    val fp = DedupOps.dedupSimhash(spark, TestSpark.sfDir)
    val jac = DedupOps.dedupNgramJaccard(spark, TestSpark.sfDir)
    val joined = jac.join(fp.withColumnRenamed("doc_id", "da").withColumnRenamed("simhash", "ha"), "da")
      .join(fp.withColumnRenamed("doc_id", "db").withColumnRenamed("simhash", "hb"), "db")
      .select(expr("bit_count(ha ^ hb)").as("hamming"))
    // unrelated 48-bit fingerprints differ in ~24 bits; near-dups must be
    // well under half that (simhash is lossy, so not a hard <= threshold)
    val stats = joined.agg(max(col("hamming")).as("mx"), avg(col("hamming")).as("av")).head()
    assert(stats.getInt(0) <= 15, s"near-dup pair at hamming ${stats.getInt(0)} (random ~24)")
    assert(stats.getDouble(1) <= 8.0, s"mean near-dup hamming ${stats.getDouble(1)} too high")
  }

  test("containment dominates jaccard on every verified pair (C >= J in " +
      "both directions) and stays in (0, 1]") {
    // math law: C(a->b) = i/|a| >= i/(|a|+|b|-i) = J, so every Jaccard
    // pair must appear in the containment output in BOTH directions when
    // the thresholds align (0.8 fixture pairs are near-identical twins)
    val jac = DedupOps.dedupNgramJaccard(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cont = DedupOps.dedupContainment(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cont.nonEmpty, "containment found no pairs on the fixture")
    cont.values.foreach(c => assert(c > 0.0 && c <= 1.0001, s"containment $c out of range"))
    jac.foreach { case ((a, b), j) =>
      if (j >= DedupOps.ContainmentThreshold) {
        for (dir <- Seq((a, b), (b, a))) {
          assert(cont.contains(dir), s"jaccard pair $dir (j=$j) missing from containment")
          assert(cont(dir) >= j - 1e-4,
            s"containment ${cont(dir)} below jaccard $j for $dir — violates C >= J")
        }
      }
    }
  }

  test("snapshot diff classifies added/removed/changed exactly and stays " +
      "silent on unchanged docs") {
    import spark.implicits._
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val d = DedupOps.diffSnapshots(prev, cur)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      s"unexpected diff: $d")
  }

  test("containment is asymmetric where set sizes differ: a short doc " +
      "inside a long one is flagged in one direction only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    // doc 2 = a verbatim chunk of doc 1 plus nothing else; doc 1 has 4x
    // the shingles, so C(2->1) = 1.0 but C(1->2) = |S2|/|S1| ~ 0.26 and
    // J ~ 0.26 — under BOTH thresholds. Words are globally unique so
    // every shingle is rare (df <= cap) and the pair clears the
    // MinSharedRareShingles floor.
    val longText = (0 until 80).map(i => s"w$i").mkString(" ")
    val shortText = (20 until 40).map(i => s"w$i").mkString(" ")
    Seq((1L, longText, "en", "s0", longText.length.toLong),
        (2L, shortText, "en", "s1", shortText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.dedupContainment(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.contains((2L, 1L)), s"contained doc not flagged: $out")
    assert(math.abs(out((2L, 1L)) - 1.0) < 1e-6,
      s"full inclusion should score 1.0, got ${out((2L, 1L))}")
    assert(!out.contains((1L, 2L)),
      s"container doc wrongly flagged as contained: $out")
    // and the symmetric jaccard query must MISS this pair entirely —
    // the gap containment exists to close
    val j = DedupOps.dedupNgramJaccard(spark, dir).count()
    assert(j == 0, s"jaccard unexpectedly caught the small-in-big pair ($j rows)")
  }

  test("cdc chunking is edit-local: inserting one token preserves every " +
      "chunk except the edited one") {
    import spark.implicits._
    // 200 tokens from a 31-word-ish vocabulary (repeats matter: boundary
    // tokens recur, giving many chunks) — then insert ONE token mid-doc
    val words = Array("join", "hash", "row", "batch", "scan", "filter",
      "merge", "order", "the", "a", "table", "key", "data", "group")
    val toks = (0 until 200).map(i => words(i * 7 % words.length))
    val edited = (toks.take(100) :+ "INSERTED") ++ toks.drop(100)
    val docs = Seq((1L, toks.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val ch = DedupOps.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val c1 = ch.filter(_._1 == 1L).map(_._2)
    val c2 = ch.filter(_._1 == 2L).map(_._2)
    assert(c1.length >= 10, s"expected many chunks, got ${c1.length}")
    // chunks re-join to the exact original text (lossless chunking)
    assert(c1.mkString(" ") == toks.mkString(" "), "chunking lost content")
    // the edit may split or extend the chunk it lands in, but every other
    // chunk occurrence is hash-identical: at most 1 original chunk is
    // missing from the edited doc's multiset, and at most 2 new chunks
    // appear (the edited chunk's two halves if INSERTED is a boundary)
    def multiset(a: Seq[String]) = a.groupBy(identity).map { case (k, v) => k -> v.size }
    val m1 = multiset(c1); val m2 = multiset(c2)
    val lost = m1.map { case (k, v) => math.max(0, v - m2.getOrElse(k, 0)) }.sum
    val gained = m2.map { case (k, v) => math.max(0, v - m1.getOrElse(k, 0)) }.sum
    assert(lost <= 1, s"edit changed $lost original chunks (expected <= 1)")
    assert(gained <= 2, s"edit introduced $gained new chunks (expected <= 2)")
  }
}
