package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZInterleave

/** Laws for the Morton-interleave expression and the clustering property
  * it exists for: bucketing a z-sorted layout keeps BOTH dimensions'
  * per-bucket ranges narrow, while a single-column sort leaves the other
  * dimension's ranges at full width (no pruning).
  */
class ZInterleaveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ref(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    z
  }

  test("bit placement, masking, null propagation") {
    import spark.implicits._
    ZInterleave.register(spark)
    val rows = Seq(
      (1L, 0L), (0L, 1L), (3L, 3L), (0xFFFFL, 0L), (0L, 0xFFFFL),
      (65536L + 7L, 9L), (12345L, 54321L))
      .toDF("x", "y")
      .withColumn("z", expr("z_interleave16(x, y)"))
      .collect()
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == ref(x & 0xFFFFL, y & 0xFFFFL),
        s"z($x, $y) = $z, expected ${ref(x & 0xFFFFL, y & 0xFFFFL)}")
    }
    assert(rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 0L)
      .get.getLong(2) == 1L)
    assert(rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
      .get.getLong(2) == 2L)
    assert(rows.find(r => r.getLong(0) == 3L)
      .get.getLong(2) == 15L)
    val withNull = Seq((Some(1L), Option.empty[Long]))
      .toDF("x", "y").withColumn("z", expr("z_interleave16(x, y)"))
      .collect()
    assert(withNull.head.isNullAt(2), "null input must give null z")
  }

  test("z-sorted buckets stay narrow in BOTH dims; x-sorted ones do not") {
    import spark.implicits._
    ZInterleave.register(spark)
    // a full 64x64 grid, bucketed into 64 equal "files" of 64 rows
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .withColumn("z", expr("z_interleave16(x, y)"))
    def meanSpans(ordered: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = ordered
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("ord"))))
        .withColumn("file", expr("(rn - 1) div 64"))
        .groupBy(col("file"))
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .agg(avg(col("sx")), avg(col("sy"))).head()
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (zx, zy) = meanSpans(grid.withColumn("ord", col("z")))
    // 64 rows of a z-curve cover an 8x8 tile: spans ~7, allow slack
    assert(zx <= 16 && zy <= 16,
      f"z-order bucket spans too wide: x $zx%.1f, y $zy%.1f")
    val (sx, sy) = meanSpans(grid
      .withColumn("ord", col("x") * 64 + col("y")))
    // lexicographic (x, y) sort: each file nails x but y spans the world
    assert(sy >= 48,
      f"x-sorted layout should leave y unclustered, got y span $sy%.1f")
    assert(zy < sy / 2,
      f"z-order must beat single-column sort on the non-leading dim " +
        f"($zy%.1f vs $sy%.1f)")
  }
}
