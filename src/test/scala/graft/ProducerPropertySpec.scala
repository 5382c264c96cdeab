package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WeatherOps

/** Property tests (SURVEY.md §5.2.3): the producer-side fold (A1/P5/P7,
  * weather_stream.py:124-138) and the JSON round-trip law on the message
  * schema. ScalaCheck generators sampled under a fixed seed (no
  * scalatest-scalacheck bridge in the offline cache, so sampling is
  * explicit — still generative, fully deterministic).
  */
class ProducerPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val precipGen = Gen.chooseNum(0.0, 10.0).map(v => math.round(v * 1e6) / 1e6)
  private val minutelyGen = Gen.listOfN(61,
    Gen.option(precipGen)).map(_.zipWithIndex.map { case (p, i) => (1736532000L + 60L * i, p) })

  test("array fold == reference sum with missing->0 default and 5-dp round") {
    samples(minutelyGen, 25).foreach { minutely =>
      val expected = BigDecimal(minutely.map(_._2.getOrElse(0.0)).sum)
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      val df = Seq(minutely).toDF("minutely")
        .select(round(aggregate(col("minutely"), lit(0.0d),
          (acc, m) => acc + coalesce(m.getField("_2"), lit(0.0d))), 5).as("total"))
      val got = df.head().getDouble(0)
      assert(math.abs(got - expected) <= 1e-9, s"fold=$got reference=$expected")
    }
  }

  test("to_json . from_json = id on the message schema") {
    val msgGen = for {
      ts <- Gen.chooseNum(0L, 4102444800L)
      precip <- precipGen
      lat <- Gen.chooseNum(-90.0, 90.0)
      lon <- Gen.chooseNum(-180.0, 180.0)
    } yield (ts.toString, precip, lat, lon)
    val msgs = samples(msgGen, 200).toList
    val df = msgs.toDF("timestamp", "total_precipitation", "lat", "lon")
      .select(to_json(struct(col("timestamp"), col("total_precipitation"),
        struct(col("lat"), col("lon")).as("location"))).as("value"))
    val back = WeatherOps.flatten(WeatherOps.parseJson(WeatherOps.castValueAsString(df)))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(back.toSeq.sorted == msgs.sorted)
  }
}
