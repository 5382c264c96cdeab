package graft.fuzz

import java.util.Random
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Randomized differential testing of the relational core: a seeded
  * generator produces filter/join/aggregate query trees and renders each
  * tree in lockstep as (a) a DataFrame plan and (b) a single SQL string
  * in the dialect intersection of Spark SQL and DuckDB. QueryFuzzSpec
  * executes both renderings in Spark and asserts identical results for
  * 100+ seeds; a fixed sample of seeds is additionally registered in
  * [[graft.SparkEntry]], where the driver runs the SAME SQL in DuckDB —
  * cross-engine semantics drift that the hand-written queries don't
  * exercise shows up as a hash mismatch there.
  *
  * Dialect-intersection rules (the same constraints the hand-written
  * oracles follow): every aggregate is aliased identically on both
  * sides; integer aggregates are CAST to BIGINT (DuckDB SUM(int) widens
  * to HUGEINT, which the driver's hasher serializes differently);
  * double sums are rounded to 2 decimals (absorbs addend-order float
  * noise); no raw date/timestamp outputs.
  */
object QueryFuzz {

  /** Column inventory per table (driver-generated star schema). */
  private case class T(name: String, ints: Seq[String], doubles: Seq[String],
      strings: Seq[String])

  private val tables = Seq(
    T("region", Seq("r_regionkey"), Nil, Seq("r_name")),
    T("nation", Seq("n_nationkey", "n_regionkey"), Nil, Seq("n_name")),
    T("customer", Seq("c_custkey", "c_nationkey"), Seq("c_acctbal"),
      Seq("c_mktsegment")),
    T("supplier", Seq("s_suppkey", "s_nationkey"), Seq("s_acctbal"), Nil),
    T("part", Seq("p_partkey", "p_size"), Seq("p_retailprice"),
      Seq("p_brand", "p_type")),
    T("orders", Seq("o_orderkey", "o_custkey"), Seq("o_totalprice"),
      Seq("o_orderstatus", "o_orderpriority")),
    T("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq("l_returnflag", "l_linestatus")))

  /** FK edges: (left table, right table, left col, right col). */
  private val fks = Seq(
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
    ("nation", "region", "n_regionkey", "r_regionkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"))

  /** Threshold candidates per double column, inside each column's data
    * range so comparisons split rows instead of selecting all/none.
    */
  private val doubleCuts: Map[String, Seq[Double]] = Map(
    "c_acctbal" -> Seq(-500.0, 0.0, 2000.0),
    "s_acctbal" -> Seq(-500.0, 0.0, 2000.0),
    "p_retailprice" -> Seq(1000.0, 1250.0, 1500.0),
    "o_totalprice" -> Seq(50000.0, 100000.0, 200000.0),
    "l_quantity" -> Seq(10.0, 25.0, 40.0),
    "l_extendedprice" -> Seq(10000.0, 30000.0, 60000.0),
    "l_discount" -> Seq(0.02, 0.05, 0.08))

  /** One generated query: the shared SQL text and the DataFrame twin. */
  case class Gen(seed: Long, sql: String,
      build: (SparkSession, String) => DataFrame)

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

  /** A single predicate over the given column inventory (int modulo class
    * or double cut) rendered in both dialects — shared by the window /
    * semi-join / union shapes. The classic shape keeps its own inline
    * copy so its random stream stays byte-identical to earlier rounds.
    */
  private def predOn(rnd: Random, ints: Seq[String],
      doubles: Seq[String]): (String, Column) =
    if (doubles.nonEmpty && rnd.nextBoolean()) {
      val c = pick(rnd, doubles)
      val cut = pick(rnd, doubleCuts(c))
      if (rnd.nextBoolean()) (s"$c >= $cut", col(c) >= cut)
      else (s"$c <= $cut", col(c) <= cut)
    } else {
      val c = pick(rnd, ints)
      val m = 2 + rnd.nextInt(4)
      val r = rnd.nextInt(m)
      (s"$c % $m = $r", col(c) % m === r)
    }

  /** A group key over the inventory (string column or int modulo class). */
  private def keyOn(rnd: Random, ints: Seq[String], strings: Seq[String],
      alias: String): (String, Column) =
    if (strings.nonEmpty && rnd.nextBoolean()) {
      val c = pick(rnd, strings)
      (s"$c AS $alias", col(c).as(alias))
    } else {
      val c = pick(rnd, ints)
      val m = 2 + rnd.nextInt(6)
      (s"CAST($c % $m AS BIGINT) AS $alias", (col(c) % m).cast("long").as(alias))
    }

  /** Window shape: rank + lag over a generated partition, top-K rows per
    * partition. Single table; rank determinism comes from the id
    * tiebreak inside the OVER ordering.
    */
  private def genWindow(seed: Long, rnd: Random): Gen = {
    import org.apache.spark.sql.expressions.Window
    val t = pick(rnd, tables)
    val id = t.ints.head
    // bare (unaliased) partition expression: the alias belongs to the
    // projection, not the window spec
    val (pkSql, pkCol) =
      if (t.strings.nonEmpty && rnd.nextBoolean()) {
        val c = pick(rnd, t.strings); (c, col(c))
      } else {
        val c = pick(rnd, t.ints)
        val m = 2 + rnd.nextInt(6)
        (s"CAST($c % $m AS BIGINT)", (col(c) % m).cast("long"))
      }
    val (ovSql, ovCol) =
      if (t.doubles.nonEmpty && rnd.nextBoolean()) {
        val c = pick(rnd, t.doubles); (c, col(c))
      } else { val c = pick(rnd, t.ints); (c, col(c)) }
    val k = 3 + rnd.nextInt(3)
    val withPred = rnd.nextBoolean()
    val (predSql, predCol) =
      if (withPred) predOn(rnd, t.ints, t.doubles) else ("", lit(true))
    val whereSql = if (withPred) s" WHERE $predSql" else ""
    val over = s"OVER (PARTITION BY $pkSql ORDER BY $ovSql DESC NULLS LAST, $id)"
    val sql =
      s"""SELECT k0, id, rnk, lg FROM (
         |  SELECT $pkSql AS k0, CAST($id AS BIGINT) AS id,
         |         CAST(rank() $over AS BIGINT) AS rnk,
         |         CAST(lag($id, 1, -1) $over AS BIGINT) AS lg
         |  FROM ${t.name}$whereSql) sub
         |WHERE rnk <= $k
         |ORDER BY k0 NULLS FIRST, rnk, id""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(pkCol)
        .orderBy(ovCol.desc_nulls_last, col(id))
      Tables.table(spark, dir, t.name)
        .filter(predCol)
        .select(pkCol.as("k0"), col(id).cast("long").as("id"),
          rank().over(w).cast("long").as("rnk"),
          lag(col(id), 1, -1).over(w).cast("long").as("lg"))
        .filter(col("rnk") <= k)
        .orderBy(col("k0").asc_nulls_first, col("rnk"), col("id"))
    }
    Gen(seed, sql, build)
  }

  /** Semi-join shape: EXISTS / IN / NOT EXISTS against a filtered child
    * along an FK edge, aggregated on the parent. NOT IN is deliberately
    * excluded (its null semantics are a well-known trap, and FK columns
    * are non-null here anyway — NOT EXISTS covers the anti case).
    */
  private def genSemi(seed: Long, rnd: Random): Gen = {
    val (childName, parentName, fkCol, pkCol) = pick(rnd, fks)
    val parent = tables.find(_.name == parentName).get
    val child = tables.find(_.name == childName).get
    val (predSql, predCol) = predOn(rnd, child.ints, child.doubles)
    val form = rnd.nextInt(3) // 0 = EXISTS, 1 = IN, 2 = NOT EXISTS
    val (k0Sql, k0Col) = keyOn(rnd, parent.ints, parent.strings, "k0")
    val sumCol = pick(rnd, parent.ints)
    val whereSql = form match {
      case 0 => s"EXISTS (SELECT 1 FROM $childName WHERE $fkCol = $pkCol AND $predSql)"
      case 1 => s"$pkCol IN (SELECT $fkCol FROM $childName WHERE $predSql)"
      case _ => s"NOT EXISTS (SELECT 1 FROM $childName WHERE $fkCol = $pkCol AND $predSql)"
    }
    val sql =
      s"""SELECT $k0Sql, COUNT(*) AS a_cnt, CAST(SUM($sumCol) AS BIGINT) AS a0
         |FROM $parentName WHERE $whereSql GROUP BY k0""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val sub = Tables.table(spark, dir, childName).filter(predCol)
      val joinType = if (form == 2) "left_anti" else "left_semi"
      Tables.table(spark, dir, parentName)
        .join(sub, col(pkCol) === col(fkCol), joinType)
        .groupBy(k0Col)
        .agg(count(lit(1)).as("a_cnt"), sum(col(sumCol)).cast("long").as("a0"))
    }
    Gen(seed, sql, build)
  }

  /** Union shape: UNION ALL of two differently-filtered branches over the
    * same table, aggregated on top (bag semantics — overlapping rows must
    * count twice in both engines).
    */
  private def genUnion(seed: Long, rnd: Random): Gen = {
    val t = pick(rnd, tables)
    val (p1Sql, p1Col) = predOn(rnd, t.ints, t.doubles)
    val (p2Sql, p2Col) = predOn(rnd, t.ints, t.doubles)
    val (kSqlAliased, kCol) = keyOn(rnd, t.ints, t.strings, "k0")
    val x = pick(rnd, t.ints)
    val sql =
      s"""SELECT k0, COUNT(*) AS a_cnt, CAST(SUM(x) AS BIGINT) AS a0 FROM (
         |  SELECT $kSqlAliased, $x AS x FROM ${t.name} WHERE $p1Sql
         |  UNION ALL
         |  SELECT $kSqlAliased, $x AS x FROM ${t.name} WHERE $p2Sql) u
         |GROUP BY k0""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      def branch(p: Column) = Tables.table(spark, dir, t.name)
        .filter(p).select(kCol, col(x).as("x"))
      branch(p1Col).unionAll(branch(p2Col))
        .groupBy(col("k0"))
        .agg(count(lit(1)).as("a_cnt"), sum(col("x")).cast("long").as("a0"))
    }
    Gen(seed, sql, build)
  }

  /** ROLLUP/CUBE shape: hierarchical aggregation over two generated keys,
    * exercising the NULL-producing grouping branches and GROUPING()
    * disambiguation — the null-semantics family most likely to drift
    * between engines. Keys are computed in a subquery so both renderings
    * group the same expressions; output is fully ordered with explicit
    * NULLS FIRST (the grouping branches emit NULL keys by construction).
    */
  private def genRollup(seed: Long, rnd: Random): Gen = {
    val t = pick(rnd, tables)
    val (k0Sql, k0Col) = keyOn(rnd, t.ints, t.strings, "k0")
    val (k1Sql, k1Col) = keyOn(rnd, t.ints, t.strings, "k1")
    val x = pick(rnd, t.ints)
    val withPred = rnd.nextBoolean()
    val (predSql, predCol) =
      if (withPred) predOn(rnd, t.ints, t.doubles) else ("", lit(true))
    val whereSql = if (withPred) s" WHERE $predSql" else ""
    val cube = rnd.nextBoolean()
    val form = if (cube) "CUBE" else "ROLLUP"
    val sql =
      s"""SELECT k0, k1, CAST(GROUPING(k0) AS BIGINT) AS g0,
         |       CAST(GROUPING(k1) AS BIGINT) AS g1,
         |       COUNT(*) AS a_cnt, CAST(SUM(x) AS BIGINT) AS a0
         |FROM (SELECT $k0Sql, $k1Sql, $x AS x FROM ${t.name}$whereSql) s
         |GROUP BY $form (k0, k1)
         |ORDER BY g0, g1, k0 NULLS FIRST, k1 NULLS FIRST""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base = Tables.table(spark, dir, t.name).filter(predCol)
        .select(k0Col, k1Col, col(x).as("x"))
      val grouped = if (cube) base.cube(col("k0"), col("k1"))
                    else base.rollup(col("k0"), col("k1"))
      grouped
        .agg(grouping(col("k0")).cast("long").as("g0"),
          grouping(col("k1")).cast("long").as("g1"),
          count(lit(1)).as("a_cnt"), sum(col("x")).cast("long").as("a0"))
        .select(col("k0"), col("k1"), col("g0"), col("g1"),
          col("a_cnt"), col("a0"))
        .orderBy(col("g0"), col("g1"),
          col("k0").asc_nulls_first, col("k1").asc_nulls_first)
    }
    Gen(seed, sql, build)
  }

  /** Outer-join-feeding-aggregates shape: LEFT or FULL join along an FK
    * with the nullable side HALVED by a filter (FK edges always match, so
    * the filter is what manufactures unmatched rows), grouped on a key
    * from the NULL-producing side with COUNT(*) vs null-skipping
    * COUNT(col) and SUM over a nullable column — the aggregate/NULL
    * interactions engines most often disagree on.
    */
  private def genOuterAgg(seed: Long, rnd: Random): Gen = {
    val (childName, parentName, fkCol, pkCol) = pick(rnd, fks)
    val parent = tables.find(_.name == parentName).get
    val full = rnd.nextInt(3) == 0
    val joinSql = if (full) "FULL JOIN" else "LEFT JOIN"
    val joinType = if (full) "full" else "left"
    // group key over the NULLABLE parent side: unmatched child rows fall
    // in the NULL group (string key) or propagate NULL through the modulo
    val (k0Sql, k0Col) = keyOn(rnd, parent.ints, parent.strings, "k0")
    val sumCol = pick(rnd, parent.ints)
    val sql =
      s"""SELECT $k0Sql, COUNT(*) AS a_cnt,
         |       COUNT($pkCol) AS a_nn,
         |       CAST(SUM($sumCol) AS BIGINT) AS a0
         |FROM $childName $joinSql
         |  (SELECT * FROM $parentName WHERE $pkCol % 2 = 0) $parentName
         |  ON $fkCol = $pkCol
         |GROUP BY k0""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val right = Tables.table(spark, dir, parentName)
        .filter(col(pkCol) % 2 === 0)
      Tables.table(spark, dir, childName)
        .join(right, col(fkCol) === col(pkCol), joinType)
        .groupBy(k0Col)
        .agg(count(lit(1)).as("a_cnt"), count(col(pkCol)).as("a_nn"),
          sum(col(sumCol)).cast("long").as("a0"))
    }
    Gen(seed, sql, build)
  }

  /** Explicit NULLS FIRST/LAST under LIMIT: a left join manufactures a
    * nullable sort column, the ORDER BY direction and null placement are
    * both generated and rendered EXPLICITLY in both dialects (Spark and
    * DuckDB have opposite defaults), and ordering covers every output
    * column so duplicate rows are interchangeable under the LIMIT.
    */
  private def genNullsLimit(seed: Long, rnd: Random): Gen = {
    val (childName, parentName, fkCol, pkCol) = pick(rnd, fks)
    val child = tables.find(_.name == childName).get
    val baseKey = child.ints.head
    val desc = rnd.nextBoolean()
    val nullsFirst = rnd.nextBoolean()
    val dirSql = (if (desc) "DESC" else "ASC") +
      (if (nullsFirst) " NULLS FIRST" else " NULLS LAST")
    val sql =
      s"""SELECT CAST($baseKey AS BIGINT) AS k0, CAST($pkCol AS BIGINT) AS v
         |FROM $childName LEFT JOIN
         |  (SELECT * FROM $parentName WHERE $pkCol % 2 = 0) $parentName
         |  ON $fkCol = $pkCol
         |ORDER BY v $dirSql, k0 LIMIT 50""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val vSort = (desc, nullsFirst) match {
        case (true, true) => col("v").desc_nulls_first
        case (true, false) => col("v").desc_nulls_last
        case (false, true) => col("v").asc_nulls_first
        case (false, false) => col("v").asc_nulls_last
      }
      val right = Tables.table(spark, dir, parentName)
        .filter(col(pkCol) % 2 === 0)
      Tables.table(spark, dir, childName)
        .join(right, col(fkCol) === col(pkCol), "left")
        .select(col(baseKey).cast("long").as("k0"),
          col(pkCol).cast("long").as("v"))
        .orderBy(vSort, col("k0"))
        .limit(50)
    }
    Gen(seed, sql, build)
  }

  /** Conditional-aggregation shape: COUNT(DISTINCT) next to CASE-gated
    * SUM/COUNT aggregates under a HAVING floor — the
    * distinct-vs-conditional-vs-null-skipping aggregate triangle, plus
    * HAVING's evaluation order (a post-aggregate filter must not push
    * below the aggregate). Predicate, key, columns, and the HAVING
    * threshold are all generated; the DataFrame side carries the row
    * count as a temporary column and drops it after the filter — the
    * plan Spark compiles HAVING to.
    */
  private def genCondAgg(seed: Long, rnd: Random): Gen = {
    val t = pick(rnd, tables)
    val (k0Sql, k0Col) = keyOn(rnd, t.ints, t.strings, "k0")
    val x = pick(rnd, t.ints)
    val d = pick(rnd, t.ints)
    val (predSql, predCol) = predOn(rnd, t.ints, t.doubles)
    val minRows = 1 + rnd.nextInt(3)
    val sql =
      s"""SELECT k0,
         |       CAST(COUNT(DISTINCT d) AS BIGINT) AS n_d,
         |       CAST(SUM(CASE WHEN p THEN x ELSE 0 END) AS BIGINT) AS s_cond,
         |       CAST(COUNT(CASE WHEN p THEN 1 END) AS BIGINT) AS n_cond
         |FROM (SELECT $k0Sql, $x AS x, $d AS d, ($predSql) AS p FROM ${t.name}) s
         |GROUP BY k0 HAVING COUNT(*) >= $minRows
         |ORDER BY k0 NULLS LAST""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      Tables.table(spark, dir, t.name)
        .select(k0Col, col(x).as("x"), col(d).as("d"), predCol.as("p"))
        .groupBy(col("k0"))
        .agg(countDistinct(col("d")).cast("long").as("n_d"),
          sum(when(col("p"), col("x")).otherwise(0)).cast("long").as("s_cond"),
          count(when(col("p"), lit(1))).as("n_cond"),
          count(lit(1)).as("n_rows"))
        .filter(col("n_rows") >= minRows)
        .select(col("k0"), col("n_d"), col("s_cond"), col("n_cond"))
        .orderBy(col("k0").asc_nulls_last)
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the null-semantics shapes: seeds below it render
    * byte-identically to earlier rounds (their random streams are
    * untouched), seeds at or above it route to the rollup/outer-agg/
    * nulls-limit generators.
    */
  val NullShapeSeedFloor = 1000L

  /** Seed floor for the r5 conditional-aggregation shape — its own
    * disjoint range for the same reason as [[NullShapeSeedFloor]]: no
    * earlier seed's rendering may change.
    */
  val CondAggSeedFloor = 2000L

  /** Calendar-bucketing shape: GROUP BY date_trunc at a generated
    * granularity (year/quarter/month/week/day) under an optional
    * timestamp-literal range predicate — calendar arithmetic (week
    * start, quarter boundaries, month lengths) is where engines
    * classically drift, and the bucket key is rendered as a formatted
    * STRING in both dialects so the comparison is text-exact rather
    * than at the mercy of timestamp binary encodings.
    */
  private def genDateTrunc(seed: Long, rnd: Random): Gen = {
    val g = pick(rnd, Seq("year", "quarter", "month", "week", "day"))
    val year = 1995 + rnd.nextInt(6)
    val withPred = rnd.nextBoolean()
    val whereSql =
      if (withPred) s"\nWHERE o_orderdate >= TIMESTAMP '$year-01-01 00:00:00'" else ""
    // the bucket renders as CAST(CAST(.. AS DATE) AS STRING) — the
    // date->ISO-string spelling BOTH dialects share (strftime is
    // DuckDB-only, date_format is Spark-only, bare VARCHAR needs a
    // length in Spark's parser, and DuckDB aliases STRING to VARCHAR;
    // the in-Spark sweep runs this text too)
    val sql =
      s"""SELECT CAST(CAST(date_trunc('$g', o_orderdate) AS DATE) AS STRING) AS k0,
         |       COUNT(*) AS a_cnt, CAST(SUM(o_custkey) AS BIGINT) AS a0
         |FROM orders$whereSql
         |GROUP BY k0 ORDER BY k0""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base0 = Tables.table(spark, dir, "orders")
      val base = if (withPred)
        base0.filter(col("o_orderdate") >=
          to_timestamp(lit(s"$year-01-01 00:00:00")))
      else base0
      base
        .groupBy(date_trunc(g, col("o_orderdate")).cast("date").cast("string")
          .as("k0"))
        .agg(count(lit(1)).as("a_cnt"),
          sum(col("o_custkey")).cast("long").as("a0"))
        .orderBy(col("k0"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the calendar-bucketing shape (disjoint range, same
    * rendering-stability contract as the other floors).
    */
  val DateTruncSeedFloor = 3000L

  /** String-function shape: a generated case/substr/reverse transform as
    * the group key under an optional LIKE predicate — collation,
    * 1-based substring indexing, and pattern-match semantics are the
    * string-layer divergences engines accumulate; every function used
    * (lower/upper/substr/reverse/length/LIKE) has identical spelling in
    * both dialects.
    */
  private def genString(seed: Long, rnd: Random): Gen = {
    val withStrings = tables.filter(_.strings.nonEmpty)
    val t = pick(rnd, withStrings)
    val s = pick(rnd, t.strings)
    val (keySql, keyCol) = rnd.nextInt(4) match {
      case 0 => (s"lower($s)", lower(col(s)))
      case 1 => (s"upper($s)", upper(col(s)))
      case 2 =>
        val m = 1 + rnd.nextInt(4)
        (s"substr($s, 1, $m)", substring(col(s), 1, m))
      case _ => (s"reverse($s)", reverse(col(s)))
    }
    val withPred = rnd.nextBoolean()
    val ch = ('a' + rnd.nextInt(5)).toChar
    val whereSql = if (withPred) s"\nWHERE $s LIKE '%$ch%'" else ""
    val sql =
      s"""SELECT $keySql AS k0, COUNT(*) AS a_cnt,
         |       CAST(SUM(length($s)) AS BIGINT) AS a0
         |FROM ${t.name}$whereSql
         |GROUP BY k0 ORDER BY k0 NULLS LAST""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base0 = Tables.table(spark, dir, t.name)
      val base = if (withPred) base0.filter(col(s).like(s"%$ch%")) else base0
      base.groupBy(keyCol.as("k0"))
        .agg(count(lit(1)).as("a_cnt"),
          sum(length(col(s))).cast("long").as("a0"))
        .orderBy(col("k0").asc_nulls_last)
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the string-function shape. */
  val StringSeedFloor = 4000L

  /** Ordered-set-aggregate shape: percentile_disc at a generated
    * fraction WITHIN GROUP over a generated numeric column, beside
    * count/min/max, under an optional predicate. The DISCRETE
    * percentile picks an actual data value, so both engines agree
    * bit-for-bit with no interpolation arithmetic — what this family
    * guards is the boundary-index convention itself (ceil(p*n) vs
    * first-cumulative->=p), which silently drifts between engines at
    * exactly the generated fractions. Identical SQL spelling in both
    * dialects (percentile_disc WITHIN GROUP is PostgreSQL syntax both
    * parsers accept).
    */
  private def genPercentile(seed: Long, rnd: Random): Gen = {
    val t = pick(rnd, tables)
    val v = pick(rnd, t.ints ++ t.doubles)
    val p = pick(rnd, Seq("0.1", "0.25", "0.5", "0.75", "0.9"))
    val (k0Sql, k0Col) = keyOn(rnd, t.ints, t.strings, "k0")
    val withPred = rnd.nextBoolean()
    val (predSql, predCol) = predOn(rnd, t.ints, t.doubles)
    val whereSql = if (withPred) s" WHERE $predSql" else ""
    val sql =
      s"""SELECT k0, COUNT(*) AS a_cnt,
         |       CAST(percentile_disc($p) WITHIN GROUP (ORDER BY v) AS DOUBLE) AS a_p,
         |       CAST(MIN(v) AS DOUBLE) AS a_min,
         |       CAST(MAX(v) AS DOUBLE) AS a_max
         |FROM (SELECT $k0Sql, $v AS v FROM ${t.name}$whereSql) s
         |GROUP BY k0 ORDER BY k0 NULLS LAST""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base0 = Tables.table(spark, dir, t.name)
      val base = if (withPred) base0.filter(predCol) else base0
      base.select(k0Col, col(v).as("v"))
        .groupBy(col("k0"))
        .agg(count(lit(1)).as("a_cnt"),
          expr(s"CAST(percentile_disc($p) WITHIN GROUP (ORDER BY v) AS DOUBLE)")
            .as("a_p"),
          min(col("v")).cast("double").as("a_min"),
          max(col("v")).cast("double").as("a_max"))
        .orderBy(col("k0").asc_nulls_last)
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the ordered-set-aggregate shape. */
  val PercentileSeedFloor = 5000L

  /** Interval-arithmetic shape: GROUP BY the month of a timestamp
    * shifted by a generated ±INTERVAL n {DAY|MONTH|YEAR} — month-end
    * clamping (Jan 31 + 1 month), leap-day year-shifts, and the
    * shift-then-truncate composition are the calendar-arithmetic
    * divergences this family guards; both dialects spell
    * `ts + INTERVAL n UNIT` and `date_trunc('month', ..)` identically
    * and the key renders as an ISO date string.
    */
  private def genInterval(seed: Long, rnd: Random): Gen = {
    val (tName, c) = pick(rnd, Seq("orders" -> "o_orderdate",
      "lineitem" -> "l_shipdate"))
    val n = 1 + rnd.nextInt(11)
    val u = pick(rnd, Seq("DAY", "MONTH", "YEAR"))
    val op = if (rnd.nextBoolean()) "+" else "-"
    val withPred = rnd.nextBoolean()
    val year = 1995 + rnd.nextInt(6)
    val whereSql =
      if (withPred) s"\nWHERE $c < TIMESTAMP '$year-07-01 00:00:00'" else ""
    val sql =
      s"""SELECT CAST(CAST(date_trunc('month', $c $op INTERVAL $n $u) AS DATE) AS STRING) AS k0,
         |       COUNT(*) AS a_cnt
         |FROM $tName$whereSql
         |GROUP BY k0 ORDER BY k0""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base0 = Tables.table(spark, dir, tName)
      val base = if (withPred)
        base0.filter(col(c) < to_timestamp(lit(s"$year-07-01 00:00:00")))
      else base0
      val shifted = expr(s"$c $op INTERVAL $n $u")
      base.groupBy(date_trunc("month", shifted).cast("date").cast("string")
          .as("k0"))
        .agg(count(lit(1)).as("a_cnt"))
        .orderBy(col("k0"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the interval-arithmetic shape. */
  val IntervalSeedFloor = 6000L

  /** Moving-aggregate shape: SUM/MIN/MAX/COUNT over a generated
    * `ROWS BETWEEN n PRECEDING AND CURRENT ROW` frame — ROWS frames are
    * physical-order-sensitive, so the ORDER BY carries the table's
    * unique id as tiebreak (total order = cross-engine determinism);
    * what the family guards is frame-boundary indexing (off-by-one at
    * partition starts) and null handling inside sliding frames.
    */
  private def genMovingAgg(seed: Long, rnd: Random): Gen = {
    // lineitem's leading int (l_orderkey) is not unique — (v, id) must
    // be a TOTAL order or ROWS-frame sums become tie-order-dependent
    val t = pick(rnd, tables.filter(_.name != "lineitem"))
    val id = t.ints.head
    val v = pick(rnd, t.ints)
    val n = 1 + rnd.nextInt(6)
    val (k0Sql, k0Col) = keyOn(rnd, t.ints, t.strings, "k0")
    val aggKind = rnd.nextInt(3)
    val aggSql = aggKind match {
      case 0 => "CAST(SUM(v) OVER w AS BIGINT)"
      case 1 => "MIN(v) OVER w"
      case _ => "MAX(v) OVER w"
    }
    def aggOver(w: org.apache.spark.sql.expressions.WindowSpec): Column =
      aggKind match {
        // the cast must wrap the WINDOWED column — casting the bare
        // aggregate first detaches it from the OVER clause
        case 0 => sum(col("v")).over(w).cast("long")
        case 1 => min(col("v")).over(w)
        case _ => max(col("v")).over(w)
      }
    val sql =
      s"""SELECT id, k0, v, $aggSql AS a0,
         |       CAST(COUNT(*) OVER w AS BIGINT) AS a_cnt
         |FROM (SELECT $id AS id, $k0Sql, $v AS v FROM ${t.name}) s
         |WINDOW w AS (PARTITION BY k0 ORDER BY v, id
         |             ROWS BETWEEN $n PRECEDING AND CURRENT ROW)
         |ORDER BY id""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("k0")).orderBy(col("v"), col("id"))
        .rowsBetween(-n, Window.currentRow)
      Tables.table(spark, dir, t.name)
        .select(col(id).as("id"), k0Col, col(v).as("v"))
        .select(col("id"), col("k0"), col("v"),
          aggOver(w).as("a0"),
          count(lit(1)).over(w).as("a_cnt"))
        .orderBy(col("id"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the moving-aggregate shape. */
  val MovingAggSeedFloor = 7000L

  /** RANGE-frame window shape: value-based frames (`RANGE BETWEEN n
    * PRECEDING AND m FOLLOWING` over an integer ordering column), the
    * frame semantics the nearest as-of join builds on. What the family
    * guards: a RANGE frame is defined by ORDER-COLUMN VALUE, so (a) all
    * peers of the current row's value are always inside the frame —
    * tie order can never move an aggregate (unlike ROWS frames, which
    * need a total order) — and (b) the boundary arithmetic is inclusive
    * on both ends. Offsets are generated; frames cover preceding-only,
    * straddling, and following-only.
    */
  private def genRangeFrame(seed: Long, rnd: Random): Gen = {
    val t = pick(rnd, tables.filter(_.name != "lineitem"))
    val id = t.ints.head
    val v = pick(rnd, t.ints)
    val n = 1 + rnd.nextInt(40)
    val m = 1 + rnd.nextInt(40)
    val (k0Sql, k0Col) = keyOn(rnd, t.ints, t.strings, "k0")
    val (frameSql, lo, hi) = rnd.nextInt(3) match {
      case 0 => (s"RANGE BETWEEN $n PRECEDING AND CURRENT ROW",
        -n.toLong, 0L)
      case 1 => (s"RANGE BETWEEN $n PRECEDING AND $m FOLLOWING",
        -n.toLong, m.toLong)
      case _ => (s"RANGE BETWEEN CURRENT ROW AND $m FOLLOWING",
        0L, m.toLong)
    }
    val aggKind = rnd.nextInt(3)
    val aggSql = aggKind match {
      case 0 => "CAST(SUM(v) OVER w AS BIGINT)"
      case 1 => "MIN(v) OVER w"
      case _ => "MAX(v) OVER w"
    }
    def aggOver(w: org.apache.spark.sql.expressions.WindowSpec): Column =
      aggKind match {
        case 0 => sum(col("v")).over(w).cast("long")
        case 1 => min(col("v")).over(w)
        case _ => max(col("v")).over(w)
      }
    val sql =
      s"""SELECT id, k0, v, $aggSql AS a0,
         |       CAST(COUNT(*) OVER w AS BIGINT) AS a_cnt
         |FROM (SELECT $id AS id, $k0Sql, $v AS v FROM ${t.name}) s
         |WINDOW w AS (PARTITION BY k0 ORDER BY v $frameSql)
         |ORDER BY id""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("k0")).orderBy(col("v"))
        .rangeBetween(lo, hi)
      Tables.table(spark, dir, t.name)
        .select(col(id).as("id"), k0Col, col(v).as("v"))
        .select(col("id"), col("k0"), col("v"),
          aggOver(w).as("a0"),
          count(lit(1)).over(w).as("a_cnt"))
        .orderBy(col("id"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the RANGE-frame window shape. */
  val RangeFrameSeedFloor = 10000L

  /** Correlated-scalar-subquery shape: the SQL text puts a correlated
    * scalar subquery (COUNT plus one of SUM/MIN/MAX over a filtered
    * child, correlated on the FK) in the SELECT list, while the
    * DataFrame twin is the MANUALLY DECORRELATED plan — child
    * pre-aggregated on the FK, left-joined to the parent, COUNT
    * coalesced to 0. What the family guards is exactly that equivalence:
    * Catalyst's own subquery decorrelation must agree with the hand
    * rewrite on empty-group semantics — a missing child group is
    * COUNT() = 0 but SUM/MIN/MAX = NULL — and on never dropping or
    * duplicating parent rows (the parent key is unique, so output
    * cardinality is exactly |parent|). The decorrelated shape is also
    * the 100 TB plan: one key-space-bounded child aggregate + one
    * broadcastable join, instead of a per-row subquery probe.
    */
  private def genScalarSub(seed: Long, rnd: Random): Gen = {
    val (pt, ct, pk, fk) = pick(rnd, Seq(
      ("nation", "customer", "n_nationkey", "c_nationkey"),
      ("nation", "supplier", "n_nationkey", "s_nationkey"),
      ("region", "nation", "r_regionkey", "n_regionkey"),
      ("customer", "orders", "c_custkey", "o_custkey"),
      ("orders", "lineitem", "o_orderkey", "l_orderkey"),
      ("part", "lineitem", "p_partkey", "l_partkey")))
    val child = tables.find(_.name == ct).get
    // child predicate: a double cut when available, else an int modulo
    val (predSql, predCol) =
      if (child.doubles.nonEmpty && rnd.nextBoolean()) {
        val c = pick(rnd, child.doubles)
        val cut = pick(rnd, doubleCuts(c))
        if (rnd.nextBoolean()) (s"c.$c >= $cut", col(c) >= cut)
        else (s"c.$c <= $cut", col(c) <= cut)
      } else {
        val c = pick(rnd, child.ints)
        val m = 2 + rnd.nextInt(4)
        val r = rnd.nextInt(m)
        (s"c.$c % $m = $r", col(c) % m === r)
      }
    val ac = pick(rnd, child.ints)
    val (aggSql, aggCol) = rnd.nextInt(3) match {
      case 0 => (s"CAST(SUM(c.$ac) AS BIGINT)", sum(col(ac)).cast("long"))
      case 1 => (s"CAST(MIN(c.$ac) AS BIGINT)", min(col(ac)).cast("long"))
      case _ => (s"CAST(MAX(c.$ac) AS BIGINT)", max(col(ac)).cast("long"))
    }
    val sql =
      s"""SELECT CAST(p.$pk AS BIGINT) AS k0,
         |       CAST((SELECT COUNT(*) FROM $ct c
         |             WHERE c.$fk = p.$pk AND $predSql) AS BIGINT) AS a0,
         |       (SELECT $aggSql FROM $ct c
         |        WHERE c.$fk = p.$pk AND $predSql) AS a1
         |FROM $pt p
         |ORDER BY k0""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val agg = Tables.table(spark, dir, ct)
        .filter(predCol)
        .groupBy(col(fk))
        .agg(count(lit(1)).as("cnt"), aggCol.as("ag"))
      Tables.table(spark, dir, pt)
        .join(agg, col(pk) === col(fk), "left")
        .select(col(pk).cast("long").as("k0"),
          coalesce(col("cnt"), lit(0L)).as("a0"),
          col("ag").as("a1"))
        .orderBy(col("k0"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the correlated-scalar-subquery shape. */
  val ScalarSubSeedFloor = 11000L

  /** Set-operation shape: INTERSECT / EXCEPT, DISTINCT and ALL, between
    * two projections of one table — side A under an optional predicate,
    * side B additionally halved on another column, with NULLIF-punched
    * keys. What the family guards: set operations compare NULL = NULL
    * as EQUAL (null-safe equality — the opposite of join-key semantics
    * fuzzed at 8000+), and the ALL variants keep bag multiplicities
    * (min(m1, m2) for INTERSECT ALL, m1 - m2 clamped at 0 for EXCEPT
    * ALL) where the DISTINCT forms collapse them. Identical SQL
    * spelling in both dialects; the DataFrame twin maps to
    * intersect/intersectAll/except/exceptAll. Seed floor 20000 — the
    * 12000-17999 range belongs to StreamFuzz (shared fuzz_q namespace).
    */
  private def genSetOp(seed: Long, rnd: Random): Gen = {
    val t = pick(rnd, tables.filter(_.ints.size >= 2))
    val kcol = pick(rnd, t.ints)
    val vcol = pick(rnd, t.ints)
    val hcol = pick(rnd, t.ints.filter(_ != kcol) match {
      case Nil => t.ints; case xs => xs
    })
    val m = 2 + rnd.nextInt(5)
    val m2 = 2 + rnd.nextInt(7)
    val r = rnd.nextInt(m)
    val op = pick(rnd, Seq("INTERSECT", "INTERSECT ALL", "EXCEPT",
      "EXCEPT ALL"))
    val withPred = rnd.nextBoolean()
    val (predSql, predCol) = predOn(rnd, t.ints, t.doubles)
    val whereA = if (withPred) s" WHERE $predSql" else ""
    val whereB = if (withPred) s" WHERE ($predSql) AND $hcol % 2 = 0"
      else s" WHERE $hcol % 2 = 0"
    val proj = s"NULLIF($kcol % $m, $r) AS k, $vcol % $m2 AS v"
    val sql =
      s"""WITH a AS (SELECT $proj FROM ${t.name}$whereA),
         |b AS (SELECT $proj FROM ${t.name}$whereB)
         |SELECT k, v FROM a
         |$op
         |SELECT k, v FROM b
         |ORDER BY k NULLS LAST, v NULLS LAST""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base = Tables.table(spark, dir, t.name)
      def side(extraHalf: Boolean): DataFrame = {
        val f0 = if (withPred) base.filter(predCol) else base
        val f = if (extraHalf) f0.filter(col(hcol) % 2 === 0) else f0
        f.select(expr(s"NULLIF($kcol % $m, $r)").as("k"),
          (col(vcol) % m2).as("v"))
      }
      val a = side(extraHalf = false); val b = side(extraHalf = true)
      val res = op match {
        case "INTERSECT" => a.intersect(b)
        case "INTERSECT ALL" => a.intersectAll(b)
        case "EXCEPT" => a.except(b)
        case _ => a.exceptAll(b)
      }
      res.orderBy(col("k").asc_nulls_last, col("v").asc_nulls_last)
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the set-operation shape (skips past StreamFuzz's
    * 12000-17999 block — fuzz_q names share one namespace).
    */
  val SetOpSeedFloor = 20000L

  /** Join-null-semantics shape: LEFT / RIGHT / FULL outer joins over an
    * FK edge where NULLIF punches null KEYS into one or both sides and
    * an optional halved right side manufactures unmatched rows. What
    * the family guards: null join keys never match (each null-key row
    * surfaces as its own unmatched row under FULL, not as a join
    * partner), outer-side NULL fills survive into aggregates, and
    * COUNT(col) vs COUNT(*) disagree exactly on the padded side. Keys
    * join on the REAL FK columns (bounded dimension multiplicity), so
    * the shape never manufactures a many-to-many explosion.
    */
  private def genJoinNulls(seed: Long, rnd: Random): Gen = {
    val (lt, rt, lc, rc, dom) = pick(rnd, Seq(
      ("customer", "nation", "c_nationkey", "n_nationkey", 25),
      ("supplier", "nation", "s_nationkey", "n_nationkey", 25),
      ("nation", "region", "n_regionkey", "r_regionkey", 5)))
    val lid = tables.find(_.name == lt).get.ints.head
    val rid = tables.find(_.name == rt).get.ints.head
    val nullL = rnd.nextInt(dom)
    val nullR = rnd.nextInt(dom)
    val halveRight = rnd.nextBoolean()
    val (joinSql, joinType) = rnd.nextInt(3) match {
      case 0 => ("FULL JOIN", "full")
      case 1 => ("LEFT JOIN", "left")
      case _ => ("RIGHT JOIN", "right")
    }
    val rightWhere = if (halveRight) s" WHERE $rc % 2 = 0" else ""
    val sql =
      s"""SELECT CAST(COALESCE(lk, rk, -1) AS BIGINT) AS k,
         |       CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(COUNT(lv) AS BIGINT) AS n_l,
         |       CAST(COUNT(rv) AS BIGINT) AS n_r
         |FROM (SELECT NULLIF($lc, $nullL) AS lk, $lid AS lv FROM $lt) a
         |$joinSql (SELECT NULLIF($rc, $nullR) AS rk, $rid AS rv
         |          FROM $rt$rightWhere) b
         |  ON lk = rk
         |GROUP BY COALESCE(lk, rk, -1)
         |ORDER BY k""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val a = Tables.table(spark, dir, lt)
        .select(expr(s"NULLIF($lc, $nullL)").as("lk"), col(lid).as("lv"))
      val rbase = Tables.table(spark, dir, rt)
      val rsel = if (halveRight) rbase.filter(col(rc) % 2 === 0) else rbase
      val b = rsel.select(expr(s"NULLIF($rc, $nullR)").as("rk"),
        col(rid).as("rv"))
      a.join(b, a("lk") === b("rk"), joinType)
        .select(coalesce(col("lk"), col("rk"), lit(-1L)).cast("long").as("k"),
          col("lv"), col("rv"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          count(col("lv")).as("n_l"),
          count(col("rv")).as("n_r"))
        .orderBy(col("k"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the join-null-semantics shape. */
  val JoinNullsSeedFloor = 8000L

  /** Event-time bucketing shape over the `events` stream table: GROUP BY
    * a generated calendar bucket of `ts` (day/hour/minute truncation, or
    * an extracted hour/day/month field), optionally crossed with the
    * categorical event_type, under optional time-range and type
    * predicates — the rollup shape every telemetry pipeline runs.
    * Added the round the events fixture silently changed parquet
    * timestamp width: this family differentially pins event-time
    * calendar semantics (truncation boundaries, field extraction,
    * range-literal comparison) between the DataFrame rendering, Spark
    * SQL, and DuckDB. Both dialects spell the bucket through
    * CAST(ts AS TIMESTAMP) and compare it as formatted text, so the
    * check is independent of timestamp binary encodings.
    */
  private def genEventTime(seed: Long, rnd: Random): Gen = {
    val useExtract = rnd.nextInt(3) == 0
    val trunc = pick(rnd, Seq("day", "hour", "minute"))
    val field = pick(rnd, Seq("hour", "day", "month"))
    val (k0Sql, k0Col) =
      if (useExtract)
        (s"CAST(extract($field FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS k0",
          (field match {
            case "hour" => hour(col("ts").cast("timestamp"))
            case "day" => dayofmonth(col("ts").cast("timestamp"))
            case _ => month(col("ts").cast("timestamp"))
          }).cast("long").as("k0"))
      else if (trunc == "day")
        // DuckDB date_trunc('day', ..) yields DATE (Spark: TIMESTAMP);
        // route both through DATE so the text rendering agrees — the
        // same spelling genDateTrunc uses
        (s"CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS STRING) AS k0",
          date_trunc("day", col("ts").cast("timestamp")).cast("date")
            .cast("string").as("k0"))
      else
        (s"CAST(date_trunc('$trunc', CAST(ts AS TIMESTAMP)) AS STRING) AS k0",
          date_trunc(trunc, col("ts").cast("timestamp")).cast("string").as("k0"))
    val withType = rnd.nextBoolean()
    // 2-3 of the fixture's five event types, drawn without replacement,
    // stable order
    val pool = scala.collection.mutable.ArrayBuffer(
      "click", "purchase", "error", "signup", "view")
    val types = (0 until 2 + rnd.nextInt(2))
      .map(_ => pool.remove(rnd.nextInt(pool.size))).sorted
    val typePred = rnd.nextInt(3) == 0
    val timePred = rnd.nextBoolean()
    val fromDay = 2 + rnd.nextInt(8) // events span 2024-01-01..01-30
    val preds = Seq(
      if (typePred) Some(types.mkString("event_type IN ('", "', '", "')"))
      else None,
      if (timePred)
        Some(s"CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-0$fromDay 00:00:00'")
      else None).flatten
    val whereSql = if (preds.isEmpty) "" else preds.mkString("\nWHERE ", " AND ", "")
    val agg = rnd.nextInt(3) match {
      case 0 => s"CAST(SUM(user_id) AS BIGINT) AS a0"
      case 1 => s"ROUND(SUM(value) * (1.0 + 1e-12), 2) AS a0"
      case _ => s"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS a0"
    }
    val keySql = if (withType) s"$k0Sql, event_type AS k1" else k0Sql
    val grpSql = if (withType) "k0, k1" else "k0"
    val sql =
      s"""SELECT $keySql, COUNT(*) AS a_cnt, $agg
         |FROM events$whereSql
         |GROUP BY $grpSql ORDER BY $grpSql""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      var df = Tables.table(spark, dir, "events")
      if (typePred) df = df.filter(col("event_type").isin(types: _*))
      if (timePred) df = df.filter(col("ts").cast("timestamp") >=
        to_timestamp(lit(s"2024-01-0$fromDay 00:00:00")))
      val keys = if (withType) Seq(k0Col, col("event_type").as("k1"))
        else Seq(k0Col)
      val aggCol = agg match {
        case a if a.startsWith("CAST(SUM") =>
          sum(col("user_id")).cast("long").as("a0")
        case a if a.startsWith("ROUND") =>
          round(sum(col("value")) * (lit(1.0) + lit(1e-12)), 2).as("a0")
        case _ => countDistinct(col("user_id")).cast("long").as("a0")
      }
      df.groupBy(keys: _*)
        .agg(count(lit(1)).as("a_cnt"), aggCol)
        .orderBy((if (withType) Seq(col("k0"), col("k1"))
          else Seq(col("k0"))): _*)
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the event-time bucketing shape. */
  val EventTimeSeedFloor = 9000L

  /** Deterministically generate the query tree for `seed`.
    * java.util.Random's LCG is specified, so a seed renders the same
    * query on every JVM.
    *
    * The shape roll uses a SEPARATE derived-seed Random so the classic
    * aggregate/projection shapes consume exactly the same random stream
    * as earlier rounds: 40% of seeds route to the window / semi-join /
    * union generators, the rest to the classic path. Seeds >=
    * [[NullShapeSeedFloor]] route to the r5 null-semantics generators
    * instead (a disjoint seed range so no earlier seed's rendering
    * changes).
    */
  /** Explode/generator shape: per input row, an array `sequence(1, c%m+1)`
    * is exploded and aggregated per generated key — Spark's GenerateExec
    * (the lateral-generator state machine: outer row replication, empty-
    * array elimination, codegen'd explode) under differential test. The
    * shared SQL text carries NO generator at all: it renders the same
    * semantics as an ANSI numbers-table join (`JOIN (SELECT 1 AS u UNION
    * ALL ...) v ON v.u <= c%m+1`), which BOTH Spark SQL and DuckDB parse,
    * while the DataFrame twin uses the real `explode(sequence(...))` —
    * so a generator bug cannot hide behind an identical generator in the
    * oracle. Variants: plain; conditional-empty (the array collapses to
    * [] when a second predicate fails — explode must DROP the row, the
    * numbers join drops it via `u <= 0`); and COUNT(DISTINCT u) beside
    * the sums. Integer aggregates CAST to BIGINT per the dialect rules.
    */
  private def genExplode(seed: Long, rnd: Random): Gen = {
    val t = pick(rnd, tables)
    val ic = pick(rnd, t.ints)
    val m = 3 + rnd.nextInt(5) // array length ranges over 1..m, m in 3..7
    val (keySql, keyCol) = keyOn(rnd, t.ints, t.strings, "k0")
    val withPred = rnd.nextBoolean()
    val (pSql, pCol) = predOn(rnd, t.ints, t.doubles)
    val (p2Sql, p2Col) = predOn(rnd, t.ints, t.doubles) // conditional gate
    val variant = rnd.nextInt(3) // 0 plain, 1 conditional-empty, 2 +distinct
    val nSql = s"$ic % $m + 1"
    val nCol = ((col(ic) % m) + 1).cast("int")
    val numbers = (1 to m)
      .map(i => if (i == 1) s"SELECT 1 AS u" else s"SELECT $i")
      .mkString(" UNION ALL ")
    val onSql =
      if (variant == 1) s"v.u <= CASE WHEN $p2Sql THEN $nSql ELSE 0 END"
      else s"v.u <= $nSql"
    val whereSql = if (withPred) s"\nWHERE $pSql" else ""
    val distinctSql =
      if (variant == 2) ",\n       CAST(COUNT(DISTINCT v.u) AS BIGINT) AS a2"
      else ""
    val sql =
      s"""SELECT $keySql, COUNT(*) AS a_cnt,
         |       CAST(SUM(v.u) AS BIGINT) AS a0,
         |       CAST(MAX(v.u) AS BIGINT) AS a1$distinctSql
         |FROM ${t.name}
         |JOIN ($numbers) v ON $onSql$whereSql
         |GROUP BY k0 ORDER BY k0 NULLS LAST""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base0 = Tables.table(spark, dir, t.name)
      val base = if (withPred) base0.filter(pCol) else base0
      // n <= 0 guard: sequence(1, n) with a non-positive bound generates
      // a DESCENDING array (e.g. [1, 0, -1]) and explode would emit rows
      // the numbers-join oracle (u in 1..m, u <= n) never produces. All
      // current fuzz int columns are non-negative, but the invariant must
      // hold by construction, not by fixture luck.
      val arr = when(nCol >= 1, sequence(lit(1), nCol))
        .otherwise(array().cast("array<int>"))
      val arrCol =
        if (variant == 1) when(p2Col, arr).otherwise(array().cast("array<int>"))
        else arr
      val ex = base.select(keyCol, explode(arrCol).as("u"))
      val aggs = Seq(sum(col("u")).cast("long").as("a0"),
        max(col("u")).cast("long").as("a1")) ++
        (if (variant == 2) Seq(countDistinct(col("u")).cast("long").as("a2"))
         else Nil)
      ex.groupBy(col("k0"))
        .agg(count(lit(1)).as("a_cnt"), aggs: _*)
        .orderBy(col("k0").asc_nulls_last)
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the explode/generator shape. */
  val ExplodeSeedFloor = 21000L

  /** Window-over-outer-join shape: rank / lag / ROWS-frame aggregates
    * computed ON TOP OF a LEFT/RIGHT/FULL outer join whose keys are
    * NULLIF-punched — the null-ordering x frame-boundary interaction no
    * other family crosses (8000+ stops at grouped aggregates over the
    * join; 7000/10000 window over a single clean table). The two engines
    * DEFAULT null ordering differently (Spark ASC = NULLS FIRST, DuckDB
    * ASC = NULLS LAST), so every window ORDER BY spells its placement
    * explicitly; what the family guards is that explicit placement
    * steering outer-padded NULL rows to the right frame end, frame
    * stepping across those rows (SUM/COUNT(col) skip the NULL VALUES
    * while COUNT(*) counts the rows), LAG/LEAD crossing them, and RANK
    * tie collapse on punched keys. The per-row
    * uid = COALESCE(lv, -1 - rv) is a total order (left ids are unique
    * and non-negative; padded right-only rows map to distinct
    * negatives), making ROW_NUMBER/LAG deterministic and the final
    * ORDER BY unique. The partition key lk % p is itself nullable —
    * both engines group the punched rows into one NULL partition.
    */
  private def genWindowOuter(seed: Long, rnd: Random): Gen = {
    val (lt, rt, lc, rc, dom) = pick(rnd, Seq(
      ("customer", "nation", "c_nationkey", "n_nationkey", 25),
      ("supplier", "nation", "s_nationkey", "n_nationkey", 25),
      ("nation", "region", "n_regionkey", "r_regionkey", 5)))
    val lid = tables.find(_.name == lt).get.ints.head
    val rid = tables.find(_.name == rt).get.ints.head
    val nullL = rnd.nextInt(dom)
    val nullR = rnd.nextInt(dom)
    val halveRight = rnd.nextBoolean()
    val (joinSql, joinType) = rnd.nextInt(3) match {
      case 0 => ("FULL JOIN", "full")
      case 1 => ("LEFT JOIN", "left")
      case _ => ("RIGHT JOIN", "right")
    }
    val p = 2 + rnd.nextInt(3)
    val asc = rnd.nextBoolean()
    val nullsFirst = rnd.nextBoolean()
    val ovName = if (rnd.nextBoolean()) "rk" else "lk" // nullable ordering
    val variant = rnd.nextInt(3) // 0 rank+row_number, 1 lag/lead, 2 frame
    val frameK = 1 + rnd.nextInt(3)
    val ovSpec = s"$ovName ${if (asc) "ASC" else "DESC"}" +
      s" NULLS ${if (nullsFirst) "FIRST" else "LAST"}"
    val winSql = variant match {
      case 0 =>
        s"""CAST(RANK() OVER (PARTITION BY pk
           |            ORDER BY $ovSpec) AS BIGINT) AS w0,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY pk
           |            ORDER BY $ovSpec, uid) AS BIGINT) AS w1""".stripMargin
      case 1 =>
        s"""CAST(LAG(rv, 1) OVER (PARTITION BY pk
           |            ORDER BY $ovSpec, uid) AS BIGINT) AS w0,
           |       CAST(LEAD(rv, 1) OVER (PARTITION BY pk
           |            ORDER BY $ovSpec, uid) AS BIGINT) AS w1""".stripMargin
      case _ =>
        val fr = s"PARTITION BY pk ORDER BY $ovSpec, uid ROWS BETWEEN " +
          s"$frameK PRECEDING AND CURRENT ROW"
        s"""CAST(SUM(rv) OVER ($fr) AS BIGINT) AS w0,
           |       CAST(COUNT(rv) OVER ($fr) AS BIGINT) AS w1,
           |       CAST(COUNT(*) OVER ($fr) AS BIGINT) AS w2""".stripMargin
    }
    val rightWhere = if (halveRight) s" WHERE $rc % 2 = 0" else ""
    val sql =
      s"""WITH j AS (
         |  SELECT lk, rk, lv, rv,
         |         CAST(COALESCE(lv, -1 - rv) AS BIGINT) AS uid,
         |         CAST(lk % $p AS BIGINT) AS pk
         |  FROM (SELECT NULLIF($lc, $nullL) AS lk, $lid AS lv FROM $lt) a
         |  $joinSql (SELECT NULLIF($rc, $nullR) AS rk, $rid AS rv
         |            FROM $rt$rightWhere) b
         |    ON lk = rk)
         |SELECT uid, pk, CAST(lk AS BIGINT) AS lk, CAST(rk AS BIGINT) AS rk,
         |       $winSql
         |FROM j
         |ORDER BY uid""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val a = Tables.table(spark, dir, lt)
        .select(expr(s"NULLIF($lc, $nullL)").as("lk"), col(lid).as("lv"))
      val rbase = Tables.table(spark, dir, rt)
      val rsel = if (halveRight) rbase.filter(col(rc) % 2 === 0) else rbase
      val b = rsel.select(expr(s"NULLIF($rc, $nullR)").as("rk"),
        col(rid).as("rv"))
      val j = a.join(b, a("lk") === b("rk"), joinType)
        .select(col("lk"), col("rk"), col("lv"), col("rv"),
          coalesce(col("lv"), lit(-1) - col("rv")).cast("long").as("uid"),
          (col("lk") % p).cast("long").as("pk"))
      val ovCol =
        if (asc) { if (nullsFirst) col(ovName).asc_nulls_first
                   else col(ovName).asc_nulls_last }
        else { if (nullsFirst) col(ovName).desc_nulls_first
               else col(ovName).desc_nulls_last }
      val wTotal = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pk")).orderBy(ovCol, col("uid"))
      val winCols = variant match {
        case 0 =>
          val wTies = org.apache.spark.sql.expressions.Window
            .partitionBy(col("pk")).orderBy(ovCol)
          Seq(rank().over(wTies).cast("long").as("w0"),
            row_number().over(wTotal).cast("long").as("w1"))
        case 1 =>
          Seq(lag(col("rv"), 1).over(wTotal).cast("long").as("w0"),
            lead(col("rv"), 1).over(wTotal).cast("long").as("w1"))
        case _ =>
          val fr = wTotal.rowsBetween(-frameK.toLong, 0L)
          Seq(sum(col("rv")).over(fr).cast("long").as("w0"),
            count(col("rv")).over(fr).cast("long").as("w1"),
            count(lit(1)).over(fr).cast("long").as("w2"))
      }
      j.select(Seq(col("uid"), col("pk"),
        col("lk").cast("long").as("lk"),
        col("rk").cast("long").as("rk")) ++ winCols: _*)
        .orderBy(col("uid"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the window-over-outer-join shape. */
  val WindowOuterSeedFloor = 22000L

  /** LATERAL correlated top-N shape: `JOIN LATERAL (SELECT ... WHERE
    * fk = parent.pk ORDER BY v DESC, uid LIMIT n)` — the classic
    * top-N-per-group spelling, which Spark plans through correlated-
    * subquery DECORRELATION with LIMIT (DecorrelateInnerQuery turning
    * the per-row LIMIT into a partitioned rank) while the DataFrame
    * twin states the window+join form directly — two genuinely
    * different plans for the same semantics, differentially pinned
    * (family 11000 covers correlated scalar aggregates, but not
    * correlated LIMIT, the harder decorrelation). Variants: INNER
    * (childless parents vanish), LEFT ... ON true (childless parents
    * survive with a NULL row — the ORDER BY spells NULLS LAST because
    * the engines default it differently), and CROSS JOIN LATERAL over
    * an AGGREGATE of the top-N subquery (always exactly one lateral
    * row: COUNT 0 / SUM NULL for childless parents — the empty-group
    * split rides through the lateral). The lateral ORDER BY carries a
    * within-group-unique uid tiebreak, so the selected set is
    * deterministic even under value ties; double v columns pass
    * through unmodified (selection, not arithmetic) and the top-N SUM
    * takes the ROUND(x * (1 + 1e-12), 2) nudge.
    */
  private def genLateral(seed: Long, rnd0: Random): Gen = {
    // a raw new Random(seed) correlates its FIRST nextInt(4) across
    // sequential seeds (every scanned seed drew the same edge pair);
    // the scrambled-seed draw the other families use for their variant
    // picks decorrelates it
    val rnd = new Random(seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL)
    // (parent, child, pk, fk, value, within-group-unique uid)
    val (pt, ct, pk, fk, vc, uc) = pick(rnd, Seq(
      ("customer", "orders", "c_custkey", "o_custkey",
        "o_totalprice", "o_orderkey"),
      ("orders", "lineitem", "o_orderkey", "l_orderkey",
        "l_extendedprice", "l_linenumber"),
      ("nation", "customer", "n_nationkey", "c_nationkey",
        "c_acctbal", "c_custkey"),
      ("nation", "supplier", "n_nationkey", "s_nationkey",
        "s_acctbal", "s_suppkey")))
    val n = 1 + rnd.nextInt(3)
    val withPred = rnd.nextBoolean()
    val m = 2 + rnd.nextInt(4)
    val r = rnd.nextInt(m)
    val baseSql = if (withPred)
      s"(SELECT * FROM $pt WHERE $pk % $m = $r)" else pt
    val variant = rnd.nextInt(3) // 0 inner, 1 left, 2 lateral aggregate
    val sql = variant match {
      case 2 =>
        s"""SELECT CAST(c.$pk AS BIGINT) AS key, CAST(t.cnt AS BIGINT) AS a0,
           |       ROUND(t.s * (1.0 + 1e-12), 2) AS a1
           |FROM $baseSql c CROSS JOIN LATERAL (
           |  SELECT COUNT(*) AS cnt, SUM(v) AS s FROM (
           |    SELECT $vc AS v FROM $ct WHERE $fk = c.$pk
           |    ORDER BY $vc DESC, $uc LIMIT $n)) t
           |ORDER BY key""".stripMargin
      case v =>
        val jt = if (v == 0) "JOIN" else "LEFT JOIN"
        s"""SELECT CAST(c.$pk AS BIGINT) AS key, t.v AS v,
           |       CAST(t.uid AS BIGINT) AS uid
           |FROM $baseSql c $jt LATERAL (
           |  SELECT $vc AS v, $uc AS uid FROM $ct
           |  WHERE $fk = c.$pk
           |  ORDER BY $vc DESC, $uc LIMIT $n) t ON true
           |ORDER BY key, uid NULLS LAST""".stripMargin
    }
    val build = (spark: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val base0 = Tables.table(spark, dir, pt)
      val base = (if (withPred) base0.filter(col(pk) % m === r) else base0)
        .select(col(pk).cast("long").as("key"))
      val w = Window.partitionBy(col(fk))
        .orderBy(col(vc).desc, col(uc))
      val top = Tables.table(spark, dir, ct)
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
        .select(col(fk).cast("long").as("fkk"), col(vc).as("v"),
          col(uc).cast("long").as("uid"))
      variant match {
        case 2 =>
          val agg = top.groupBy(col("fkk"))
            .agg(count(lit(1)).as("cnt0"), sum(col("v")).as("s"))
          base.join(agg, col("key") === col("fkk"), "left")
            .select(col("key"),
              coalesce(col("cnt0"), lit(0L)).as("a0"),
              round(col("s") * (lit(1.0) + lit(1e-12)), 2).as("a1"))
            .orderBy(col("key"))
        case v =>
          base.join(top, col("key") === col("fkk"),
              if (v == 0) "inner" else "left")
            .select(col("key"), col("v"), col("uid"))
            .orderBy(col("key"), col("uid").asc_nulls_last)
      }
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the LATERAL correlated top-N shape. */
  val LateralSeedFloor = 23000L

  /** Null-aware anti/semi subquery shapes: `[NOT] IN (subquery)` and
    * correlated `[NOT] EXISTS` with NULLIF-punched keys. Spark plans
    * NOT IN through its null-aware anti join and EXISTS through
    * decorrelated semi/anti joins; the DataFrame twin is a quantifier-
    * free rewrite (LEFT JOIN against the DISTINCT inner keys plus an
    * inner COUNT for the empty-set rule) that executes the three-valued
    * logic EXPLICITLY — a 3VL bug in either engine's subquery planning
    * cannot hide behind an identical subquery on the oracle side.
    *
    * The punched edges pin the rules that differ pairwise:
    *  - variant 0, NOT IN with a punched OUTER key: `NULL NOT IN S` is
    *    never TRUE for non-empty S (punched rows vanish), but `x NOT IN
    *    <empty>` is TRUE for EVERY x including NULL — the 1-in-4
    *    always-empty inner (`pk < 0`) exercises that branch;
    *  - variant 1, IN with a punched INNER key: a NULL in the subquery
    *    list never matches anything — rows whose fk equals the punched
    *    value drop out of the semi join;
    *  - variant 2, NOT EXISTS over a punched correlation: the null key
    *    never equates, so punched rows are KEPT — the exact opposite of
    *    variant 0's NOT IN drop, which is the family's sharpest edge;
    *  - variant 3, EXISTS over a punched correlation: punched rows drop.
    *
    * (`x NOT IN S` with NULLs INSIDE a non-empty S — always-empty
    * output — is pinned by a dedicated QueryFuzzSpec test rather than a
    * seed, since the sweep asserts non-vacuous results.)
    */
  /** Family-17 axes, exposed for the AntiSemiSeedScan labeler (the
    * scanner used to re-derive variant/emptyInner by substring-sniffing
    * the rendered SQL, which any future formatting change would break).
    * Draw order is frozen: table triple, punch, emptyInner, m, r,
    * variant — reordering would re-render every registered seed.
    */
  private[graft] case class AntiSemiP(outer: String, inner: String,
      opk: String, ofk: String, ipk: String, punch: Int,
      emptyInner: Boolean, m: Int, r: Int, variant: Int) {
    def variantName: String = variant match {
      case 0 => "not-in"
      case 1 => "in"
      case 2 => "not-exists"
      case _ => "exists"
    }
  }

  private[graft] def antiSemiP(seed: Long): AntiSemiP = {
    val rnd = new Random(seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL)
    // (outer, inner, outer pk, outer fk, inner pk, punch menu) — punch
    // values chosen to HIT real keys at every SF (nation keys are
    // 0..24; customer keys start at 1)
    val (ot, it, opk, ofk, ipk, punchMenu) = pick(rnd, Seq(
      ("customer", "nation", "c_custkey", "c_nationkey", "n_nationkey",
        0 to 24),
      ("supplier", "nation", "s_suppkey", "s_nationkey", "n_nationkey",
        0 to 24),
      ("orders", "customer", "o_orderkey", "o_custkey", "c_custkey",
        1 to 15)))
    val p = punchMenu(rnd.nextInt(punchMenu.size))
    val emptyInner = rnd.nextInt(4) == 0
    val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
    val variant = rnd.nextInt(4)
    AntiSemiP(ot, it, opk, ofk, ipk, p, emptyInner, m, r, variant)
  }

  private def genAntiSemi(seed: Long, rnd0: Random): Gen = {
    val ap = antiSemiP(seed)
    val (ot, it, opk, ofk, ipk) = (ap.outer, ap.inner, ap.opk, ap.ofk, ap.ipk)
    val p = ap.punch; val emptyInner = ap.emptyInner
    val m = ap.m; val r = ap.r; val variant = ap.variant
    def predSql(q: String) =
      if (emptyInner) s"$q$ipk < 0" else s"$q$ipk % $m = $r"
    val sql = variant match {
      case 0 =>
        s"""SELECT CAST($opk AS BIGINT) AS key,
           |       CAST(NULLIF($ofk, $p) AS BIGINT) AS fkp
           |FROM $ot
           |WHERE NULLIF($ofk, $p) NOT IN
           |  (SELECT $ipk FROM $it WHERE ${predSql("")})
           |ORDER BY key""".stripMargin
      case 1 =>
        s"""SELECT CAST($opk AS BIGINT) AS key, CAST($ofk AS BIGINT) AS fkp
           |FROM $ot
           |WHERE $ofk IN
           |  (SELECT NULLIF($ipk, $p) FROM $it WHERE ${predSql("")})
           |ORDER BY key""".stripMargin
      case 2 =>
        s"""SELECT CAST($opk AS BIGINT) AS key,
           |       CAST(NULLIF($ofk, $p) AS BIGINT) AS fkp
           |FROM $ot o
           |WHERE NOT EXISTS (SELECT 1 FROM $it i
           |  WHERE i.$ipk = NULLIF(o.$ofk, $p) AND ${predSql("i.")})
           |ORDER BY key""".stripMargin
      case _ =>
        s"""SELECT CAST($opk AS BIGINT) AS key,
           |       CAST(NULLIF($ofk, $p) AS BIGINT) AS fkp
           |FROM $ot o
           |WHERE EXISTS (SELECT 1 FROM $it i
           |  WHERE i.$ipk = NULLIF(o.$ofk, $p) AND ${predSql("i.")})
           |ORDER BY key""".stripMargin
    }
    val build = (spark: SparkSession, dir: String) => {
      val inner0 = Tables.table(spark, dir, it)
      val innKeys = (if (emptyInner) inner0.filter(col(ipk) < 0)
        else inner0.filter(col(ipk) % m === r)).select(col(ipk).as("mk"))
      val outer = Tables.table(spark, dir, ot)
        .withColumn("fkp", expr(s"nullif($ofk, $p)"))
      // no broadcast hints: the orders->customer inner side grows with
      // SF (the PlanSpec hygiene rule) — AQE picks the strategy
      val out = variant match {
        case 0 =>
          // x NOT IN S (S null-free: ipk is a key): keep all when S is
          // empty; otherwise keep iff x IS NOT NULL and unmatched
          val cnt = innKeys.agg(count(lit(1)).as("icnt"))
          outer.crossJoin(cnt)
            .join(innKeys.distinct(), col("fkp") === col("mk"), "left")
            .filter(col("icnt") === 0L ||
              (col("fkp").isNotNull && col("mk").isNull))
        case 1 =>
          // x IN (S with NULLIF-punched keys): NULL list entries never
          // match, so the punched key simply leaves the match set
          outer.join(innKeys.filter(col("mk") =!= p).distinct(),
            col(ofk) === col("mk"), "inner")
            .withColumn("fkp", col(ofk))
        case 2 =>
          outer.join(innKeys.distinct(), col("fkp") === col("mk"), "left")
            .filter(col("mk").isNull)
        case _ =>
          outer.join(innKeys.distinct(), col("fkp") === col("mk"), "inner")
      }
      out.select(col(opk).cast("long").as("key"),
          col("fkp").cast("long").as("fkp"))
        .orderBy(col("key"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the null-aware anti/semi subquery shapes. */
  val AntiSemiSeedFloor = 24000L

  /** PIVOT shapes: the DataFrame `groupBy().pivot(col, values).agg(...)`
    * API (with EXPLICIT values — no driver-side distinct pass, the
    * scale-correct form) vs a FILTER-aggregate SQL twin. Spark compiles
    * pivot through PivotFirst / a CASE-projection rewrite; the oracle
    * states the per-cell conditional aggregates directly, so a pivot
    * cell landing in the wrong column, a dropped NULL cell, or an
    * empty-cell 0-vs-NULL divergence cannot hide. Empty cells are NULL
    * in BOTH renderings (pivot yields NULL for absent combinations;
    * `SUM(..) FILTER` over zero rows is NULL) — the family sticks to
    * SUM aggregates for exactly that symmetry. Variants: sum(double)
    * (rounded with the 1e-12 nudge), sum(int) CAST BIGINT, and the
    * two-measure pivot whose columns compose `{value}_{agg alias}`.
    */
  private def genPivot(seed: Long, rnd0: Random): Gen = {
    val rnd = new Random(seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL)
    val (tn, pc, vals) = pick(rnd, Seq(
      ("lineitem", "l_returnflag", Seq("A", "N", "R")),
      ("lineitem", "l_linestatus", Seq("F", "O")),
      ("orders", "o_orderstatus", Seq("F", "O", "P")),
      ("customer", "c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
          "MACHINERY"))))
    val t = tables.find(_.name == tn).get
    val strOpts = t.strings.filterNot(_ == pc)
    val (gkSql, gkCol) =
      if (strOpts.nonEmpty && rnd.nextBoolean()) {
        val c = pick(rnd, strOpts)
        (s"$c AS gk", col(c).as("gk"))
      } else {
        val c = pick(rnd, t.ints)
        val m = 2 + rnd.nextInt(6)
        (s"CAST($c % $m AS BIGINT) AS gk", (col(c) % m).cast("long").as("gk"))
      }
    val withPred = rnd.nextBoolean()
    val (pSql, pCol) = predOn(rnd, t.ints, t.doubles)
    val dc = pick(rnd, t.doubles)
    val ic = pick(rnd, t.ints)
    val variant = rnd.nextInt(3) // 0 sum(double), 1 sum(int), 2 both
    def safe(v: String) = s"p_${v.toLowerCase.take(5)}"
    val cellsSql = vals.flatMap { v =>
      variant match {
        case 0 => Seq(s"ROUND(SUM($dc) FILTER (WHERE $pc = '$v') " +
          s"* (1.0 + 1e-12), 2) AS ${safe(v)}")
        case 1 => Seq(s"CAST(SUM($ic) FILTER (WHERE $pc = '$v') AS BIGINT) " +
          s"AS ${safe(v)}")
        case _ => Seq(
          s"ROUND(SUM($dc) FILTER (WHERE $pc = '$v') * (1.0 + 1e-12), 2) " +
            s"AS ${safe(v)}_sd",
          s"CAST(SUM($ic) FILTER (WHERE $pc = '$v') AS BIGINT) " +
            s"AS ${safe(v)}_si")
      }
    }
    val sql =
      s"""SELECT $gkSql, ${cellsSql.mkString(",\n       ")}
         |FROM $tn${if (withPred) s" WHERE $pSql" else ""}
         |GROUP BY gk ORDER BY gk""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base0 = Tables.table(spark, dir, tn)
      val base = if (withPred) base0.filter(pCol) else base0
      val grouped = base.groupBy(gkCol).pivot(pc, vals)
      val pivoted = variant match {
        case 0 => grouped.agg(
          round(sum(col(dc)) * (lit(1.0) + lit(1e-12)), 2))
        case 1 => grouped.agg(sum(col(ic)).cast("long"))
        case _ => grouped.agg(
          round(sum(col(dc)) * (lit(1.0) + lit(1e-12)), 2).as("sd"),
          sum(col(ic)).cast("long").as("si"))
      }
      val renamed = vals.flatMap { v =>
        if (variant == 2) Seq(col(s"${v}_sd").as(s"${safe(v)}_sd"),
          col(s"${v}_si").as(s"${safe(v)}_si"))
        else Seq(col(v).as(safe(v)))
      }
      pivoted.select(col("gk") +: renamed: _*).orderBy(col("gk"))
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the PIVOT shapes. */
  val PivotSeedFloor = 25000L

  /** GROUPING SETS shapes: explicit (including NON-hierarchical,
    * cross-cutting) set lists with per-key GROUPING() flags, vs a UNION
    * ALL twin of one PLAIN aggregate per set with literal NULL keys and
    * literal flags. The r5 rollup family (seeds 1000+, case 0) pins
    * ROLLUP/CUBE, but its DataFrame twin is `.rollup()`/`.cube()` — the
    * SAME Expand-based plan as the SQL. Here the twin never builds an
    * Expand at all: each grouping set is its own hash aggregate and the
    * results union, so an Expand bug (wrong null-bitmask row, a set
    * dropped or doubled, GROUPING() bit flipped) cannot reproduce on
    * the twin side. Set menus include shapes ROLLUP cannot express
    * (`(k0),(k1)` with no grand total).
    */
  private def genGroupingSets(seed: Long, rnd0: Random): Gen = {
    val rnd = new Random(seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL)
    val t = pick(rnd, tables)
    // inline keyOn variant that also exposes the key's Spark type, so
    // the twin can build a TYPED null literal for aggregated-out keys
    def keyed(alias: String): (String, Column, String) =
      if (t.strings.nonEmpty && rnd.nextBoolean()) {
        val c = pick(rnd, t.strings)
        (s"$c AS $alias", col(c).as(alias), "string")
      } else {
        val c = pick(rnd, t.ints)
        val m = 2 + rnd.nextInt(6)
        (s"CAST($c % $m AS BIGINT) AS $alias",
          (col(c) % m).cast("long").as(alias), "long")
      }
    val (k0Sql, k0Col, k0Ty) = keyed("k0")
    val (k1Sql, k1Col, k1Ty) = keyed("k1")
    val x = pick(rnd, t.ints)
    val withPred = rnd.nextBoolean()
    val (predSql, predCol) = predOn(rnd, t.ints, t.doubles)
    val whereSql = if (withPred) s" WHERE $predSql" else ""
    // each set = the key subset that STAYS grouped; menus cover the
    // rollup-equivalent, cross-cutting, partial, and no-pair shapes
    val sets: Seq[Seq[String]] = pick(rnd, Seq(
      Seq(Seq("k0", "k1"), Seq("k0"), Seq.empty),
      Seq(Seq("k0"), Seq("k1")),
      Seq(Seq("k0", "k1"), Seq("k1")),
      Seq(Seq("k0"), Seq("k1"), Seq.empty)))
    val setsSql = sets.map(_.mkString("(", ", ", ")")).mkString(", ")
    val sql =
      s"""SELECT k0, k1, CAST(GROUPING(k0) AS BIGINT) AS g0,
         |       CAST(GROUPING(k1) AS BIGINT) AS g1,
         |       COUNT(*) AS a_cnt, CAST(SUM(x) AS BIGINT) AS a0
         |FROM (SELECT $k0Sql, $k1Sql, $x AS x FROM ${t.name}$whereSql) s
         |GROUP BY GROUPING SETS ($setsSql)
         |ORDER BY g0, g1, k0 NULLS FIRST, k1 NULLS FIRST""".stripMargin
    val build = (spark: SparkSession, dir: String) => {
      val base0 = Tables.table(spark, dir, t.name)
      val base = (if (withPred) base0.filter(predCol) else base0)
        .select(k0Col, k1Col, col(x).as("x"))
      def nullOf(ty: String) = lit(null).cast(ty)
      val parts = sets.map { s =>
        val agg = if (s.isEmpty)
          base.agg(count(lit(1)).as("a_cnt"),
            sum(col("x")).cast("long").as("a0"))
        else base.groupBy(s.map(col): _*)
          .agg(count(lit(1)).as("a_cnt"),
            sum(col("x")).cast("long").as("a0"))
        agg.select(
          (if (s.contains("k0")) col("k0") else nullOf(k0Ty)).as("k0"),
          (if (s.contains("k1")) col("k1") else nullOf(k1Ty)).as("k1"),
          lit(if (s.contains("k0")) 0L else 1L).as("g0"),
          lit(if (s.contains("k1")) 0L else 1L).as("g1"),
          col("a_cnt"), col("a0"))
      }
      parts.reduce(_.unionAll(_))
        .orderBy(col("g0"), col("g1"),
          col("k0").asc_nulls_first, col("k1").asc_nulls_first)
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the GROUPING SETS shapes. */
  val GroupingSetsSeedFloor = 26000L

  /** Family-20 axes (frozen draw order: table cfg, measure count,
    * subset shuffle, punch index, includeNulls, agg variant, slice
    * m/r — reordering would re-render every registered seed).
    */
  private[graft] case class UnpivotP(table: String, keys: Seq[String],
      measures: Seq[String], punched: String, includeNulls: Boolean,
      agg: Boolean, m: Int, r: Int)

  /** Per-table measure menus: (output alias, SQL expr, punch predicate).
    * Every measure casts to DOUBLE (unpivot requires one common value
    * type); punch predicates are chosen to HIT real rows at every SF so
    * the NULL-handling axis is never vacuous.
    */
  private val unpivotMenu: Seq[(String, Seq[String], Seq[(String, String, String)])] = Seq(
    ("lineitem", Seq("l_orderkey", "l_linenumber"), Seq(
      ("m_qty", "CAST(l_quantity AS DOUBLE)", "l_quantity >= 25.0"),
      ("m_price", "CAST(l_extendedprice AS DOUBLE)",
        "l_extendedprice >= 30000.0"),
      ("m_disc", "CAST(l_discount AS DOUBLE)", "l_discount >= 0.05"),
      ("m_partk", "CAST(l_partkey AS DOUBLE)", "l_partkey % 5 = 0"))),
    ("part", Seq("p_partkey"), Seq(
      ("m_retail", "CAST(p_retailprice AS DOUBLE)",
        "p_retailprice >= 1250.0"),
      ("m_size", "CAST(p_size AS DOUBLE)", "p_size % 5 = 0"))),
    ("customer", Seq("c_custkey"), Seq(
      ("m_bal", "CAST(c_acctbal AS DOUBLE)", "c_acctbal >= 0.0"),
      ("m_natk", "CAST(c_nationkey AS DOUBLE)", "c_nationkey % 5 = 0"))),
    ("orders", Seq("o_orderkey"), Seq(
      ("m_total", "CAST(o_totalprice AS DOUBLE)",
        "o_totalprice >= 100000.0"),
      ("m_custk", "CAST(o_custkey AS DOUBLE)", "o_custkey % 5 = 0"))))

  private[graft] def unpivotP(seed: Long): UnpivotP = {
    val rnd = new Random(seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL)
    val (tn, keys, menu) = pick(rnd, unpivotMenu)
    val k = 2 + rnd.nextInt(menu.size - 1)
    // draw-without-replacement via removal (java.util.Random has no
    // shuffle); order of draws is part of the frozen stream
    val pool = scala.collection.mutable.ArrayBuffer(menu.map(_._1): _*)
    val chosen = Seq.fill(k)(pool.remove(rnd.nextInt(pool.size)))
    val punched = chosen(rnd.nextInt(chosen.size))
    val includeNulls = rnd.nextBoolean()
    val agg = rnd.nextInt(3) == 0
    val m = 4 + rnd.nextInt(5); val r = rnd.nextInt(m)
    UnpivotP(tn, keys, chosen, punched, includeNulls, agg, m, r)
  }

  /** UNPIVOT/stack shapes (family 20): the DataFrame `unpivot` API —
    * planned as ONE scan + Expand — vs a UNION-ALL-of-projections twin
    * that scans once per measure and never builds an Expand. A dropped
    * or duplicated measure column, a mislabeled variable cell, or a
    * NULL-row inclusion bug cannot reproduce on the twin. Axes: 4
    * table/measure menus (2-4 measures, all cast DOUBLE), a CASE-punch
    * turning one measure NULL on a value band (so the NULL axis always
    * has rows), include-vs-drop NULL cells (encoded EXPLICITLY on both
    * sides — Dataset.unpivot keeps NULL cells, so the drop variant adds
    * a filter), an optional per-measure aggregate rollup (COUNT(*)
    * counts kept NULL cells; SUM ignores them in both engines), and a
    * key-modulo slice bounding row-level output.
    */
  private def genUnpivot(seed: Long, rnd0: Random): Gen = {
    val p = unpivotP(seed)
    val menu = unpivotMenu.find(_._1 == p.table).get._3
    def exprOf(name: String): String = {
      val (_, base, punch) = menu.find(_._1 == name).get
      if (name == p.punched) s"CASE WHEN $punch THEN NULL ELSE $base END"
      else base
    }
    val keyAliases = p.keys.indices.map(i => s"k$i")
    val keySql = p.keys.zip(keyAliases)
      .map { case (c, a) => s"CAST($c AS BIGINT) AS $a" }.mkString(", ")
    val slice = s"${p.keys.head} % ${p.m} = ${p.r}"
    val sql =
      if (p.agg) {
        // each branch GROUPs BY its literal measure label (ADVICE r13
        // #3): an ungrouped aggregate emits one row even over ZERO rows
        // (n_rows=0, s_val NULL), while the DataFrame twin's
        // groupBy("measure") emits no row for an empty group — a
        // degenerate all-punched slice under drop-nulls would have been
        // a false differential. Grouped-by-literal drops empty groups
        // in Spark and DuckDB alike, matching the build
        val branches = p.measures.map { mn =>
          val nn = if (p.includeNulls) "" else s" AND ${exprOf(mn)} IS NOT NULL"
          s"""SELECT measure, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |       ROUND(SUM(val) * (1.0 + 1e-12), 2) AS s_val
             |FROM (SELECT '$mn' AS measure, ${exprOf(mn)} AS val
             |      FROM ${p.table} WHERE $slice$nn) b
             |GROUP BY measure""".stripMargin
        }
        s"""SELECT * FROM (
           |${branches.mkString("\nUNION ALL\n")}
           |) u ORDER BY measure""".stripMargin
      } else {
        val branches = p.measures.map { mn =>
          val nn = if (p.includeNulls) "" else s" AND ${exprOf(mn)} IS NOT NULL"
          s"""SELECT $keySql, '$mn' AS measure, ${exprOf(mn)} AS val
             |FROM ${p.table} WHERE $slice$nn""".stripMargin
        }
        s"""SELECT * FROM (
           |${branches.mkString("\nUNION ALL\n")}
           |) u ORDER BY ${keyAliases.mkString(", ")}, measure""".stripMargin
      }
    val build = (spark: SparkSession, dir: String) => {
      val base = Tables.table(spark, dir, p.table)
        .filter(expr(slice))
        .select(p.keys.zip(keyAliases).map { case (c, a) =>
          col(c).cast("long").as(a) } ++
          p.measures.map(mn => expr(exprOf(mn)).as(mn)): _*)
      val up = base.unpivot(keyAliases.map(col).toArray,
        p.measures.map(col).toArray, "measure", "val")
      val kept = if (p.includeNulls) up else up.filter(col("val").isNotNull)
      if (p.agg)
        kept.groupBy(col("measure"))
          .agg(count(lit(1)).as("n_rows"),
            round(sum(col("val")) * (lit(1.0) + lit(1e-12)), 2).as("s_val"))
          .orderBy(col("measure"))
      else
        kept.orderBy(keyAliases.map(col) :+ col("measure"): _*)
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the UNPIVOT/stack shapes. */
  val UnpivotSeedFloor = 27000L

  private[graft] case class DecimalP(table: String, key: String, x: String,
      variant: String, m: Int, r: Int, sm: Int)

  /** Tables/keys/money columns for the DECIMAL family. c_acctbal is the
    * only negative-valued money column — sign-symmetric rounding
    * coverage; the overflow variant draws only from columns whose values
    * STRADDLE the DECIMAL(5,2) bound +-999.99 (o_totalprice would
    * overflow every row — a vacuous NULL column).
    */
  private val decimalMenu: Seq[(String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "l_extendedprice"),
    ("lineitem", "l_orderkey", "l_quantity"),
    ("orders", "o_custkey", "o_totalprice"),
    ("customer", "c_custkey", "c_acctbal"),
    ("part", "p_partkey", "p_retailprice"))
  private val decimalOverflowMenu: Seq[(String, String, String)] = Seq(
    ("customer", "c_custkey", "c_acctbal"),
    ("part", "p_partkey", "p_retailprice"))

  private[graft] def decimalP(seed: Long): DecimalP = {
    val rnd = new Random(seed * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L)
    val variant = Seq("sum", "mul", "downcast", "overflow")(rnd.nextInt(4))
    val (tn, key, x) = variant match {
      case "mul" => ("lineitem", "l_orderkey", "l_extendedprice")
      case "overflow" => pick(rnd, decimalOverflowMenu)
      case _ => pick(rnd, decimalMenu)
    }
    val m = 4 + rnd.nextInt(6)
    val sm = 2 + rnd.nextInt(2)
    val r = rnd.nextInt(sm)
    DecimalP(tn, key, x, variant, m, r, sm)
  }

  /** DECIMAL arithmetic shapes (family 21): grouped aggregates over
    * `CAST(x AS DECIMAL(p,s))` — exact decimal semantics the double
    * fixtures never exercise — vs a BIGINT-CENTS twin that does the
    * same math in scaled integers (`ROUND(x*100)` cents, integer
    * products, integer away-from-zero halving) and only converts to
    * DECIMAL at the final output cast. The two renderings share NO
    * numeric path: a precision/scale propagation bug, a wrong rounding
    * mode, or a lost overflow NULL cannot reproduce on the twin.
    *
    * Variants: `sum` SUM(DECIMAL(12,2)); `mul` SUM(DECIMAL(12,2) *
    * DECIMAL(4,2)) — scale-4 propagation, exact in both engines;
    * `downcast` SUM over a 2dp->1dp scale-reduction cast; `overflow`
    * TRY_CAST(x AS DECIMAL(5,2)) counting overflow NULLs and summing
    * survivors (ANSI-safe in both engines; plain CAST would ERROR in
    * Spark-ANSI and DuckDB alike).
    *
    * Dialect-intersection rules probed before freezing (QueryFuzzSpec
    * pins the excluded axes):
    *  - the FINAL output column is CAST(decimal AS DOUBLE) on both
    *    sides: the r14 driver hash-failed value-identical DECIMAL
    *    outputs whose canonical string carries trailing zeros at scale
    *    (272923255.40 vs the float shortest-repr channel), so DECIMAL
    *    may never be a hash-carrier type — all precision/scale/
    *    rounding/overflow semantics under test stay inside the query,
    *    and the decimal->double conversion is exact-equal to the
    *    twin's cents/100.0 for any |cents| < 2^53 (both are the
    *    correctly-rounded nearest double of the same rational);
    *  - AVG is EXCLUDED: DuckDB types AVG(DECIMAL) as DOUBLE while
    *    Spark yields DECIMAL(16,6) with exact HALF_UP division —
    *    a real result-scale divergence, pinned in QueryFuzzSpec;
    *  - the downcast variant renders its scale reduction as an
    *    EXPLICIT ROUND(dec, 1) (both engines round that half-away-
    *    from-zero, ties included): the naive shared text
    *    `CAST(dec(12,2) AS DECIMAL(12,1))` means HALF_UP in Spark but
    *    TRUNCATE-toward-zero in DuckDB (434249.98 -> 434249.9) —
    *    found by this family's own Verify run at registration, ~44%
    *    of rows diverging; pinned in QueryFuzzSpec;
    *  - double->DECIMAL(...,2) casts agree (both half-away-from-zero,
    *    probed incl. the exactly-representable 0.125 tie).
    */
  private def genDecimal(seed: Long, rnd0: Random): Gen = {
    val p = decimalP(seed)
    val slice = s"${p.key} % ${p.sm} = ${p.r}"
    val grpSql = s"CAST(${p.key} % ${p.m} AS BIGINT)"
    val sql = p.variant match {
      case "sum" =>
        s"""SELECT $grpSql AS grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(CAST(SUM(CAST(${p.x} AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS s_val
           |FROM ${p.table} WHERE $slice GROUP BY 1 ORDER BY grp""".stripMargin
      case "mul" =>
        s"""SELECT $grpSql AS grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(CAST(SUM(CAST(${p.x} AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS DOUBLE) AS s_val
           |FROM ${p.table} WHERE $slice GROUP BY 1 ORDER BY grp""".stripMargin
      case "downcast" =>
        s"""SELECT $grpSql AS grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(CAST(SUM(CAST(ROUND(CAST(${p.x} AS DECIMAL(12,2)), 1) AS DECIMAL(12,1))) AS DECIMAL(18,1)) AS DOUBLE) AS s_val
           |FROM ${p.table} WHERE $slice GROUP BY 1 ORDER BY grp""".stripMargin
      case "overflow" =>
        // n_over counts only NON-NULL inputs that overflow: TRY_CAST(NULL)
        // IS NULL would otherwise count a NULL input as an overflow while
        // the cents twin's (abs > bound) yields NULL and excludes it —
        // a latent false differential if a money column ever carries
        // NULLs (ADVICE r14; vacuously identical on the non-null TPC-H
        // fixtures, so current results are unchanged)
        s"""SELECT $grpSql AS grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(SUM(CASE WHEN ${p.x} IS NOT NULL AND TRY_CAST(${p.x} AS DECIMAL(5,2)) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
           |       CAST(CAST(SUM(TRY_CAST(${p.x} AS DECIMAL(5,2))) AS DECIMAL(18,2)) AS DOUBLE) AS s_val
           |FROM ${p.table} WHERE $slice GROUP BY 1 ORDER BY grp""".stripMargin
    }
    val build = (spark: SparkSession, dir: String) => {
      val base = Tables.table(spark, dir, p.table)
        .filter(expr(slice))
        .withColumn("cents", round(col(p.x) * 100).cast("long"))
      val grpC = (col(p.key) % p.m).cast("long").as("grp")
      p.variant match {
        case "sum" =>
          base.groupBy(grpC)
            .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sc"))
            .select(col("grp"), col("n_rows"),
              (col("sc").cast("double") / 100.0).as("s_val"))
            .orderBy(col("grp"))
        case "mul" =>
          base.withColumn("dc", round(col("l_discount") * 100).cast("long"))
            .groupBy(grpC)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("cents") * col("dc")).as("sp"))
            .select(col("grp"), col("n_rows"),
              (col("sp").cast("double") / 10000.0).as("s_val"))
            .orderBy(col("grp"))
        case "downcast" =>
          // integer away-from-zero halving at the cents->deci boundary:
          // matches HALF_UP / half-away ROUND in both engines, ties
          // included
          base.withColumn("deci", expr("CASE WHEN cents >= 0 " +
              "THEN (cents + 5) DIV 10 ELSE -((-cents + 5) DIV 10) END"))
            .groupBy(grpC)
            .agg(count(lit(1)).as("n_rows"), sum(col("deci")).as("sd"))
            .select(col("grp"), col("n_rows"),
              (col("sd").cast("double") / 10.0).as("s_val"))
            .orderBy(col("grp"))
        case "overflow" =>
          // DECIMAL(5,2) holds +-999.99 = +-99999 cents; a survivor sum
          // over an all-overflow group is NULL on both sides (SUM of
          // all-NULL)
          base.withColumn("over", (abs(col("cents")) > 99999L).cast("int"))
            .groupBy(grpC)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("over")).cast("long").as("n_over"),
              sum(when(col("over") === 0, col("cents"))).as("sc"))
            .select(col("grp"), col("n_rows"), col("n_over"),
              (col("sc").cast("double") / 100.0).as("s_val"))
            .orderBy(col("grp"))
      }
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the DECIMAL arithmetic shapes. */
  val DecimalSeedFloor = 28000L

  private[graft] case class JsonP(table: String, key: String, lng: String,
      str: String, dbl: String, band: String, variant: String,
      punch: String, sm: Int, r: Int)

  /** Unique-keyed table menus for the JSON family: a BIGINT field, a
    * STRING field, a DOUBLE field (c_acctbal carries negatives), and a
    * punch band that NULLs one field on a value slice so the
    * dropped-null-field axis is never vacuous.
    */
  private val jsonMenu: Seq[(String, String, String, String, String, String)] = Seq(
    ("customer", "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal",
      "c_nationkey % 5 = 0"),
    ("orders", "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice",
      "o_custkey % 4 = 0"),
    ("part", "p_partkey", "p_size", "p_brand", "p_retailprice",
      "p_size % 3 = 0"))

  private[graft] def jsonP(seed: Long): JsonP = {
    val rnd = new Random(seed * 0x8F14E45FCEEA167BL + 0x27D4EB2F165667C5L)
    val (tn, key, lng, str, dbl, band) = pick(rnd, jsonMenu)
    val variant =
      Seq("flat", "nested", "array", "fromjson", "double")(rnd.nextInt(5))
    val punch = Seq("a", "s", "none")(rnd.nextInt(3))
    val sm = 2 + rnd.nextInt(2)
    JsonP(tn, key, lng, str, dbl, band, variant, punch, sm, rnd.nextInt(sm))
  }

  /** JSON round-trip shapes (family 22) — on-theme with the reference's
    * pipeline (weather_processor.py's from_json/to_json is P2/P9): the
    * DataFrame side SERIALIZES row fields with `to_json(struct(...))`
    * and re-extracts them via `get_json_object` paths (or a schema'd
    * `from_json` re-parse), while the SQL twin computes the SAME outputs
    * DIRECTLY from the base columns in pure ANSI — no JSON functions in
    * the shared SQL at all (there is no Spark/DuckDB JSON-path dialect
    * intersection), so the differential tests that Spark's round-trip is
    * the identity: escaping, number formatting (shortest-repr doubles
    * parse back exactly), `$.a.b` navigation, array indexing, and the
    * dropped-NULL-field rule (to_json omits null struct fields by
    * default; extraction must yield NULL — the punch axis).
    *
    * Variants: `flat` ($.a BIGINT + $.s STRING), `nested` (same outputs
    * through one struct level — twin IDENTICAL to flat's, only the JSON
    * path differs), `array` ($.arr[0..2] computed elements), `fromjson`
    * (schema'd re-parse + field access instead of path strings),
    * `double` (DOUBLE round-trip incl. negative acctbal).
    */
  private def genJson(seed: Long, rnd0: Random): Gen = {
    val p = jsonP(seed)
    val slice = s"${p.key} % ${p.sm} = ${p.r}"
    def punched(field: String, sqlExpr: String): String =
      if (p.punch == field) s"CASE WHEN ${p.band} THEN NULL ELSE $sqlExpr END"
      else sqlExpr
    val aSql = punched("a", s"CAST(${p.lng} AS BIGINT)")
    val sSql = punched("s", p.str)
    val sql = p.variant match {
      case "array" =>
        s"""SELECT CAST(${p.key} AS BIGINT) AS k,
           |       CAST(${p.lng} AS BIGINT) AS e0,
           |       CAST(${p.lng} + ${p.key} % 7 AS BIGINT) AS e1,
           |       CAST(${p.key} % 13 AS BIGINT) AS e2
           |FROM ${p.table} WHERE $slice ORDER BY k""".stripMargin
      case "double" =>
        s"""SELECT CAST(${p.key} AS BIGINT) AS k,
           |       ${punched("a", p.dbl)} AS d_rt
           |FROM ${p.table} WHERE $slice ORDER BY k""".stripMargin
      case _ => // flat, nested and fromjson share the projection twin
        s"""SELECT CAST(${p.key} AS BIGINT) AS k,
           |       $aSql AS a_rt, $sSql AS s_rt
           |FROM ${p.table} WHERE $slice ORDER BY k""".stripMargin
    }
    val build = (spark: SparkSession, dir: String) => {
      val base = Tables.table(spark, dir, p.table).filter(expr(slice))
      val k = col(p.key).cast("long").as("k")
      p.variant match {
        case "flat" =>
          base.select(k, to_json(struct(expr(aSql).as("a"),
              expr(sSql).as("s"))).as("js"))
            .select(col("k"),
              get_json_object(col("js"), "$.a").cast("long").as("a_rt"),
              get_json_object(col("js"), "$.s").as("s_rt"))
            .orderBy(col("k"))
        case "nested" =>
          base.select(k, to_json(struct(struct(expr(aSql).as("b"),
              expr(sSql).as("s")).as("a"))).as("js"))
            .select(col("k"),
              get_json_object(col("js"), "$.a.b").cast("long").as("a_rt"),
              get_json_object(col("js"), "$.a.s").as("s_rt"))
            .orderBy(col("k"))
        case "array" =>
          base.select(k, to_json(struct(array(
              col(p.lng).cast("long"),
              (col(p.lng) + col(p.key) % 7).cast("long"),
              (col(p.key) % 13).cast("long")).as("arr"))).as("js"))
            .select(col("k"),
              get_json_object(col("js"), "$.arr[0]").cast("long").as("e0"),
              get_json_object(col("js"), "$.arr[1]").cast("long").as("e1"),
              get_json_object(col("js"), "$.arr[2]").cast("long").as("e2"))
            .orderBy(col("k"))
        case "fromjson" =>
          base.select(k, to_json(struct(expr(aSql).as("a"),
              expr(sSql).as("s"))).as("js"))
            .select(col("k"), from_json(col("js"),
              org.apache.spark.sql.types.StructType.fromDDL(
                "a BIGINT, s STRING")).as("o"))
            .select(col("k"), col("o.a").as("a_rt"), col("o.s").as("s_rt"))
            .orderBy(col("k"))
        case "double" =>
          base.select(k,
              to_json(struct(expr(punched("a", p.dbl)).as("d"))).as("js"))
            .select(col("k"),
              get_json_object(col("js"), "$.d").cast("double").as("d_rt"))
            .orderBy(col("k"))
      }
    }
    Gen(seed, sql, build)
  }

  /** Seed floor for the JSON round-trip shapes. */
  val JsonSeedFloor = 29000L

  def generate(seed: Long): Gen = {
    val rnd0 = new Random(seed)
    if (seed >= JsonSeedFloor) return genJson(seed, rnd0)
    if (seed >= DecimalSeedFloor) return genDecimal(seed, rnd0)
    if (seed >= UnpivotSeedFloor) return genUnpivot(seed, rnd0)
    if (seed >= GroupingSetsSeedFloor) return genGroupingSets(seed, rnd0)
    if (seed >= PivotSeedFloor) return genPivot(seed, rnd0)
    if (seed >= AntiSemiSeedFloor) return genAntiSemi(seed, rnd0)
    if (seed >= LateralSeedFloor) return genLateral(seed, rnd0)
    if (seed >= WindowOuterSeedFloor) return genWindowOuter(seed, rnd0)
    if (seed >= ExplodeSeedFloor) return genExplode(seed, rnd0)
    if (seed >= SetOpSeedFloor) return genSetOp(seed, rnd0)
    if (seed >= ScalarSubSeedFloor) return genScalarSub(seed, rnd0)
    if (seed >= RangeFrameSeedFloor) return genRangeFrame(seed, rnd0)
    if (seed >= EventTimeSeedFloor) return genEventTime(seed, rnd0)
    if (seed >= JoinNullsSeedFloor) return genJoinNulls(seed, rnd0)
    if (seed >= MovingAggSeedFloor) return genMovingAgg(seed, rnd0)
    if (seed >= IntervalSeedFloor) return genInterval(seed, rnd0)
    if (seed >= PercentileSeedFloor) return genPercentile(seed, rnd0)
    if (seed >= StringSeedFloor) return genString(seed, rnd0)
    if (seed >= DateTruncSeedFloor) return genDateTrunc(seed, rnd0)
    if (seed >= CondAggSeedFloor) return genCondAgg(seed, rnd0)
    if (seed >= NullShapeSeedFloor) {
      return new Random(seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL)
        .nextInt(3) match {
        case 0 => genRollup(seed, rnd0)
        case 1 => genOuterAgg(seed, rnd0)
        case _ => genNullsLimit(seed, rnd0)
      }
    }
    val shape = new Random(seed * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL).nextInt(10)
    val rnd = rnd0
    if (shape <= 1) return genWindow(seed, rnd)
    if (shape == 2) return genSemi(seed, rnd)
    if (shape == 3) return genUnion(seed, rnd)

    // FROM clause: a base table plus 0-2 FK hops off the chain tail
    var joined = List(pick(rnd, tables))
    var fromSql = joined.head.name
    var joinCols = List.empty[(String, String, Boolean)]
    var hops = rnd.nextInt(3)
    while (hops > 0) {
      hops -= 1
      val candidates =
        fks.filter(f => f._1 == joined.head.name && !joined.exists(_.name == f._2))
      if (candidates.isEmpty) hops = 0
      else {
        val (_, rt, lc, rc) = pick(rnd, candidates)
        joined = tables.find(_.name == rt).get :: joined
        // 1-in-4 hops: LEFT JOIN against a FILTERED right side. FK edges
        // always match, so a plain left join would degenerate to inner;
        // halving the dimension manufactures unmatched rows and
        // exercises null propagation through group keys and aggregates
        val leftFiltered = rnd.nextInt(4) == 0
        if (leftFiltered) {
          fromSql += s" LEFT JOIN (SELECT * FROM $rt WHERE $rc % 2 = 0) $rt ON $lc = $rc"
          joinCols = (lc, rc, true) :: joinCols
        } else {
          fromSql += s" JOIN $rt ON $lc = $rc"
          joinCols = (lc, rc, false) :: joinCols
        }
      }
    }
    val ints = joined.flatMap(_.ints)
    val doubles = joined.flatMap(_.doubles)
    val strings = joined.flatMap(_.strings)

    // WHERE: 0-2 predicates (integer modulo classes and double cuts)
    val nFilters = rnd.nextInt(3)
    val filters: Seq[(String, Column)] = (0 until nFilters).flatMap { _ =>
      if (doubles.nonEmpty && rnd.nextBoolean()) {
        val c = pick(rnd, doubles)
        val cut = pick(rnd, doubleCuts(c))
        if (rnd.nextBoolean()) Some((s"$c >= $cut", col(c) >= cut))
        else Some((s"$c <= $cut", col(c) <= cut))
      } else {
        val c = pick(rnd, ints)
        val m = 2 + rnd.nextInt(4)
        val r = rnd.nextInt(m)
        Some((s"$c % $m = $r", col(c) % m === r))
      }
    }

    // GROUP BY: 1-2 keys, each a string column or an integer modulo class
    val nKeys = 1 + rnd.nextInt(2)
    val keys: Seq[(String, Column)] = (0 until nKeys).map { i =>
      if (strings.nonEmpty && rnd.nextBoolean()) {
        val c = pick(rnd, strings)
        (s"$c AS k$i", col(c).as(s"k$i"))
      } else {
        val c = pick(rnd, ints)
        val m = 2 + rnd.nextInt(6)
        (s"CAST($c % $m AS BIGINT) AS k$i", (col(c) % m).cast("long").as(s"k$i"))
      }
    }

    // aggregates: COUNT(*) always (also feeds the optional HAVING),
    // plus 1-2 of {SUM int, MIN/MAX int, SUM double 2dp, MIN/MAX double}
    val extraAggs: Seq[(String, Column)] = (0 until 1 + rnd.nextInt(2)).map { i =>
      rnd.nextInt(4) match {
        case 0 =>
          val c = pick(rnd, ints)
          (s"CAST(SUM($c) AS BIGINT) AS a$i", sum(col(c)).cast("long").as(s"a$i"))
        case 1 =>
          val c = pick(rnd, ints)
          if (rnd.nextBoolean())
            (s"CAST(MIN($c) AS BIGINT) AS a$i", min(col(c)).cast("long").as(s"a$i"))
          else
            (s"CAST(MAX($c) AS BIGINT) AS a$i", max(col(c)).cast("long").as(s"a$i"))
        case 2 if doubles.nonEmpty =>
          val c = pick(rnd, doubles)
          // relative nudge inside the ROUND on BOTH renderings: fuzzed
          // doubles are exact-2dp today, but a derived expression added
          // to the generator later would hit the Spark-vs-DuckDB
          // half-rounding divergence without it (see README "Rounding
          // tie-break policy")
          (s"ROUND(SUM($c) * (1.0 + 1e-12), 2) AS a$i",
            round(sum(col(c)) * (lit(1.0) + lit(1e-12)), 2).as(s"a$i"))
        case _ if doubles.nonEmpty =>
          val c = pick(rnd, doubles)
          if (rnd.nextBoolean())
            (s"MIN($c) AS a$i", min(col(c)).as(s"a$i"))
          else
            (s"MAX($c) AS a$i", max(col(c)).as(s"a$i"))
        case _ =>
          val c = pick(rnd, ints)
          (s"CAST(SUM($c) AS BIGINT) AS a$i", sum(col(c)).cast("long").as(s"a$i"))
      }
    }
    val having = rnd.nextInt(3) == 0

    // 1-in-4 trees: a non-aggregate scalar-projection shape instead —
    // string/arithmetic/conditional functions row-by-row (coverage the
    // aggregate shape can't give); base key projected for row identity
    val isProjection = rnd.nextInt(4) == 0
    val baseKey = joined.last.ints.head
    val projections: Seq[(String, Column)] =
      if (!isProjection) Nil
      else {
        val sc = if (strings.nonEmpty) pick(rnd, strings) else null
        val ic = pick(rnd, ints)
        val p0 =
          if (sc != null) (s"upper($sc) AS p0", upper(col(sc)).as("p0"))
          else (s"CAST($ic % 7 AS BIGINT) AS p0", (col(ic) % 7).cast("long").as("p0"))
        val p1 =
          if (sc != null)
            (s"CAST(length($sc) AS BIGINT) AS p1",
              length(col(sc)).cast("long").as("p1"))
          else
            (s"CAST($ic AS BIGINT) * 2 + 1 AS p1",
              (col(ic).cast("long") * 2 + 1).as("p1"))
        val p2 =
          if (doubles.nonEmpty) {
            val dc = pick(rnd, doubles)
            val cut = pick(rnd, doubleCuts(dc))
            (s"CASE WHEN $dc >= $cut THEN 'hi' ELSE 'lo' END AS p2",
              when(col(dc) >= cut, lit("hi")).otherwise(lit("lo")).as("p2"))
          } else
            (s"CAST($ic % 3 AS BIGINT) AS p2", (col(ic) % 3).cast("long").as("p2"))
        Seq(
          (s"CAST($baseKey AS BIGINT) AS k0", col(baseKey).cast("long").as("k0")),
          p0, p1, p2)
      }

    // half the projection trees add a deterministic top-k: ORDER BY every
    // output column makes row ties interchangeable, so LIMIT is stable in
    // both engines even with duplicate rows. NULLS FIRST is explicit —
    // Spark defaults to it ascending but DuckDB defaults NULLS LAST, and
    // left-filtered joins produce null projection columns
    val topK = isProjection && rnd.nextBoolean()

    val sql = {
      val where = if (filters.isEmpty) "" else filters.map(_._1).mkString(" WHERE ", " AND ", "")
      if (isProjection) {
        val lim = if (topK)
          " ORDER BY k0 NULLS FIRST, p0 NULLS FIRST, p1 NULLS FIRST, p2 NULLS FIRST LIMIT 100"
        else ""
        s"SELECT ${projections.map(_._1).mkString(", ")} FROM $fromSql$where$lim"
      } else {
        val hav = if (having) " HAVING COUNT(*) >= 2" else ""
        s"SELECT ${keys.map(_._1).mkString(", ")}, COUNT(*) AS a_cnt" +
          s"${extraAggs.map(a => ", " + a._1).mkString}" +
          s" FROM $fromSql$where GROUP BY ${keys.indices.map(i => s"k$i").mkString(", ")}$hav"
      }
    }

    val joinedNames = joined.map(_.name).reverse // base first
    val jc = joinCols.reverse
    val build = (spark: SparkSession, dir: String) => {
      var df = Tables.table(spark, dir, joinedNames.head)
      joinedNames.tail.zip(jc).foreach { case (t, (lc, rc, leftFiltered)) =>
        val right = Tables.table(spark, dir, t)
        df =
          if (leftFiltered)
            df.join(right.filter(col(rc) % 2 === 0), col(lc) === col(rc), "left")
          else df.join(right, col(lc) === col(rc))
      }
      filters.foreach { case (_, c) => df = df.filter(c) }
      if (isProjection) {
        val proj = df.select(projections.map(_._2): _*)
        if (topK)
          proj.orderBy(col("k0").asc_nulls_first, col("p0").asc_nulls_first,
            col("p1").asc_nulls_first, col("p2").asc_nulls_first).limit(100)
        else proj
      } else {
        val aggCols = count(lit(1)).as("a_cnt") +: extraAggs.map(_._2)
        var out = df.groupBy(keys.map(_._2): _*)
          .agg(aggCols.head, aggCols.tail: _*)
        if (having) out = out.filter(col("a_cnt") >= 2)
        out
      }
    }
    Gen(seed, sql, build)
  }

  /** Fixed seeds registered in SparkEntry for the DuckDB differential
    * check (chosen to return rows at sf0.001 so the driver smoke-check
    * passes; the in-Spark spec sweeps a much wider seed range). Seeds
    * 1000+ are the r5 null-semantics shapes: 1001/1003 rollup-cube,
    * 1004/1015 outer-join aggregates, 1000/1002 explicit NULLS
    * FIRST/LAST under LIMIT. Seeds 2000+ are the conditional-aggregation
    * shape (COUNT DISTINCT + CASE aggregates under a HAVING floor);
    * seeds 3000+ the calendar-bucketing shape (date_trunc granularities
    * under timestamp-literal ranges); seeds 5000+ the ordered-set
    * aggregate shape (percentile_disc WITHIN GROUP at generated
    * fractions — the discrete-percentile boundary convention); seeds
    * 6000+ the interval-arithmetic shape (±INTERVAL n unit with
    * month-end clamping under date_trunc); seeds 7000+ the
    * moving-aggregate shape (ROWS-frame sliding SUM/MIN/MAX).
    */
  val registeredSeeds: Seq[Long] =
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 9L, 10L, 12L, 13L, 16L, 22L, 25L, 26L,
      29L, 37L, 44L, 1000L, 1001L, 1002L, 1003L, 1004L, 1015L,
      2000L, 2001L, 2002L,
      // calendar shapes chosen to cover every granularity: 3000 month,
      // 3002 quarter, 3004 day, 3005 year, 3006 week (all five verified
      // against DuckDB at registration time)
      3000L, 3002L, 3004L, 3005L, 3006L,
      // string shapes covering each key transform (non-vacuous at
      // sf0.001): 4000 reverse, 4003 substr, 4006 lower, 4014 upper
      4000L, 4003L, 4006L, 4014L,
      // widened r5: more draws from the verified families
      1005L, 2003L, 3001L, 3003L, 4001L,
      // ordered-set-aggregate (percentile_disc WITHIN GROUP) shapes
      5000L, 5001L, 5002L, 5003L, 5004L, 5005L, 5006L, 5007L,
      // interval-arithmetic shapes (month-end clamp, shift-then-trunc)
      6000L, 6001L, 6002L, 6003L, 6004L, 6005L,
      // moving-aggregate ROWS-frame shapes
      7000L, 7001L, 7002L, 7003L, 7004L, 7005L,
      // join-null-semantics shapes (outer joins with NULLIF-punched
      // keys; seeds cover full/left/right and both null-side mixes)
      8000L, 8001L, 8002L, 8003L, 8004L, 8005L,
      // event-time bucketing shapes over the events table (truncation /
      // extraction buckets, time-range + type predicates) — added with
      // the r7 fixture-type fix to pin event-time calendar semantics
      9000L, 9001L, 9002L, 9003L, 9004L, 9005L,
      // RANGE-frame (value-based) window shapes — preceding-only,
      // straddling, and following-only frames over integer orderings
      10000L, 10001L, 10002L, 10003L, 10004L, 10005L,
      // correlated-scalar-subquery shapes — SQL subquery vs manually
      // decorrelated DataFrame plan (empty group => COUNT 0 / agg NULL)
      11000L, 11001L, 11002L, 11003L, 11004L, 11005L,
      // set-operation shapes — all four ops, non-vacuous at sf0.001 AND
      // sf0.01: 20000/20013 EXCEPT ALL, 20003/20012 INTERSECT ALL,
      // 20008 INTERSECT, 20009 EXCEPT
      20000L, 20003L, 20008L, 20009L, 20012L, 20013L,
      // explode/generator shapes — GenerateExec vs the ANSI numbers-join
      // rendering; two of each variant (plain 21002/21014, conditional-
      // empty 21013/21015, +COUNT DISTINCT 21006/21018) over four tables
      21002L, 21006L, 21013L, 21014L, 21015L, 21018L,
      // window-over-outer-join shapes — rank/lag/ROWS-frame on top of
      // NULLIF-punched outer joins with EXPLICIT null placement (the two
      // engines default it differently); two of each variant crossing
      // all three join types and both placements: rank 22001 LEFT
      // NULLS LAST / 22008 RIGHT NULLS FIRST, lag 22003 RIGHT LAST /
      // 22004 FULL FIRST, frame 22006 LEFT FIRST / 22005 RIGHT LAST
      22001L, 22003L, 22004L, 22005L, 22006L, 22008L,
      // LATERAL correlated top-N shapes — decorrelated-LIMIT plans vs
      // the window+join DataFrame twin; two of each variant across the
      // customer/orders/nation edges: inner 23000 (orders->lineitem,
      // predicated) / 23006 (customer->orders), LEFT 23001 / 23021,
      // lateral-aggregate 23012 (nation) / 23025 (customer)
      23000L, 23001L, 23006L, 23012L, 23021L, 23025L,
      // null-aware anti/semi subquery shapes — [NOT] IN / [NOT] EXISTS
      // vs the quantifier-free rewrite twin; all four variants, the
      // bounded (nation) and SF-growing (customer) inner edges, and
      // both empty-inner branches that stay non-vacuous: NOT IN 24006
      // (supplier) / 24014 (orders) / 24004 (empty inner — keeps ALL
      // rows incl. punched NULLs), IN 24018 / 24025, NOT EXISTS 24003 /
      // 24010 (empty inner), EXISTS 24015
      24003L, 24004L, 24006L, 24010L, 24014L, 24015L, 24018L, 24025L,
      // PIVOT shapes — DataFrame groupBy().pivot(col, values) vs the
      // FILTER-aggregate SQL twin; all three measure variants over the
      // 2/3/5-wide pivot domains: sum-int 25002 (l_returnflag),
      // sum-double 25004 (o_orderstatus) / 25008 (c_mktsegment, 5-wide)
      // / 25013 (l_linestatus), two-measure 25009 / 25019
      25002L, 25004L, 25008L, 25009L, 25013L, 25019L,
      // GROUPING SETS shapes — explicit set lists (incl. non-
      // hierarchical) vs the union-of-plain-aggregates twin; all four
      // menus and both key types: 26004/26005 rollup-equivalent
      // (int/string keys), 26003 cross-cutting (k0),(k1), 26013/26019
      // partial (k0,k1),(k1), 26008 (k0),(k1),() with the SAME column
      // as both keys
      26003L, 26004L, 26005L, 26008L, 26013L, 26019L,
      // UNPIVOT shapes — DataFrame unpivot (one scan + Expand) vs the
      // UNION-ALL-of-projections twin; all four table menus, both NULL
      // modes, both variants, 2/3/4 measures: 27001 customer agg
      // include-nulls, 27008 lineitem 3-measure drop-nulls row-level,
      // 27010 orders include-nulls row-level, 27015 orders agg
      // drop-nulls, 27019 part include-nulls row-level, 27045 lineitem
      // 4-measure agg include-nulls
      27001L, 27008L, 27010L, 27015L, 27019L, 27045L,
      // DECIMAL arithmetic shapes — CAST/SUM decimal semantics vs the
      // BIGINT-cents twin; all four variants, both overflow tables, and
      // the negative-valued money column: 28000 mul (lineitem scale-4
      // propagation), 28007 overflow (customer, sign-symmetric), 28009
      // downcast (lineitem 2dp->1dp), 28013 sum (orders), 28014
      // overflow (part), 28017 sum (customer, negatives), 28018
      // downcast (orders)
      28000L, 28007L, 28009L, 28013L, 28014L, 28017L, 28018L,
      // JSON round-trip shapes — to_json/get_json_object (or schema'd
      // from_json) vs the direct-projection twin; all five variants,
      // all three tables, both punch fields: 29002 flat part punch=a,
      // 29003 array part, 29005 double customer punch=a (negative
      // doubles), 29009 fromjson orders punch=a, 29013 flat orders
      // punch=s, 29016 fromjson customer punch=s, 29018 nested customer
      29002L, 29003L, 29005L, 29009L, 29013L, 29016L, 29018L)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registeredSeeds.map { s =>
      f"fuzz_q$s%02d" -> generate(s).build
    }.toMap

  def oracles: Map[String, String] =
    registeredSeeds.map(s => f"fuzz_q$s%02d" -> generate(s).sql).toMap
}
