package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JaroWinkler
import graft.operators.DedupOps

/** Laws for the native Jaro–Winkler expression: textbook fixtures (values
  * pinned to DuckDB's jaro_winkler_similarity, the differential oracle),
  * metric properties on generated strings (explicit fixed-seed sampling —
  * no scalatest-scalacheck bridge in the offline cache), kernel-vs-codegen
  * parity, and the linkage query's report invariants.
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))

  test("textbook fixtures match DuckDB's jaro_winkler_similarity") {
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but prefix 0
      ("arnab", "aranb", 0.9466666666666665),
      ("abcdefgh", "hgfedcba", 0.5),
      ("ABC", "ABC", 1.0),
      ("", "ABC", 0.0),
      ("", "", 0.0), // DuckDB convention: empty-empty is 0, not 1
      ("A", "B", 0.0))
    cases.foreach { case (a, b, expected) =>
      assert(math.abs(jw(a, b) - expected) < 1e-12,
        s"jw('$a','$b') = ${jw(a, b)}, want $expected")
    }
  }

  test("metric laws on generated ASCII strings: symmetry, bounds, identity") {
    val word = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val pairs = samples(Gen.zip(word, word), 300)
    assert(pairs.length >= 250)
    pairs.foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range: jw('$a','$b') = $s")
      assert(s == jw(b, a), s"asymmetric on ('$a','$b')")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"identity on '$a'")
    }
  }

  test("interpreted kernel and whole-stage codegen agree on the full " +
      "fixture name catalog") {
    import spark.implicits._
    val names = Tables.part(spark, dir).select($"p_name").distinct()
      .as[String].collect().sorted
    assert(names.length > 10)
    val pairs = for (a <- names; b <- names) yield (a, b)
    val viaSql = pairs.toSeq.toDF("a", "b")
      .withColumn("jw", expr("jaro_winkler(a, b)"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(viaSql((a, b)) == jw(a, b), s"codegen diverges on ('$a','$b')")
    }
  }

  test("fuzzy linkage: pairs are canonical near-misses with consistent " +
      "part counts") {
    val rows = DedupOps.dedupFuzzyLinkage(spark, dir).collect()
    assert(rows.nonEmpty, "fixture must surface near-miss name pairs")
    val counts = Tables.part(spark, dir).groupBy(col("p_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (n1, n2) = (r.getAs[String]("n1"), r.getAs[String]("n2"))
      assert(n1 < n2, s"pair not canonical: $r")
      val s = r.getAs[Double]("jw")
      assert(s >= 0.8 && s < 1.0, s"score outside near-miss band: $r")
      assert(r.getAs[Long]("parts1") == counts(n1), r.toString)
      assert(r.getAs[Long]("parts2") == counts(n2), r.toString)
    }
  }
}
