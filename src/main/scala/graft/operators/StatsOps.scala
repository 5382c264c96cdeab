package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-statistics operators: mergeable-sketch rollups, Zipf
  * rank-frequency fits, and cross-source score normalization — the
  * aggregate-once / re-aggregate-forever patterns a 100 TB curation
  * warehouse runs nightly.
  *
  * All three are oracle-checked; the sketch rollup is self-validating
  * (exact values + in-engine error-bound booleans, the `q_approx_agg`
  * convention) because DuckDB has no DataSketches HLL to compare bytes
  * against.
  */
object StatsOps {

  /** Relative-error margin for the HLL union estimate. lgConfigK=12 gives
    * ~1.6% standard error; 6% is ~3.7 sigma — a regression tripwire, not
    * a hard guarantee (same convention as `q_approx_agg`).
    */
  val HllMarginPct = 0.06

  /** Mergeable-sketch rollup — the pattern that makes 100 TB distinct
    * counting tractable: per-(lang, source) HLL partial sketches are
    * materialized ONCE (staged to parquet, the "daily rollup" shape),
    * then any coarser grain re-aggregates by UNIONING SKETCH BYTES —
    * `hll_union_agg` over the staged partials — without ever rescanning
    * raw documents. A plain `COUNT(DISTINCT)` rollup cannot do this:
    * distinct counts are not mergeable, so every re-grain is a full
    * corpus shuffle.
    *
    * Staging through parquet is deliberate: it proves the sketches
    * survive serialization, which is what a real warehouse does between
    * the nightly partial job and ad-hoc re-aggregation.
    *
    * Self-validating output: exact distincts (DuckDB-reproducible) plus
    * an in-engine boolean that the merged estimate lands within
    * [[HllMarginPct]] of exact.
    */
  def qSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val key = DedupOps.stageKey(spark, "hll-partials", dir)
    val partials = DedupOps.staged(spark, key) {
      Tables.documents(spark, dir)
        .groupBy(col("lang"), col("source"))
        .agg(hll_sketch_agg(col("doc_id"), lit(12)).as("sk"),
          // doc_id is unique corpus-wide, so per-(lang, source) exacts sum
          // losslessly to the lang grain — the oracle's ground truth
          countDistinct(col("doc_id")).as("exact_part"))
    }
    partials
      .groupBy(col("lang"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as("est"),
        sum(col("exact_part")).as("exact_docs"),
        count(lit(1)).as("n_parts"))
      .select(col("lang"),
        col("exact_docs").cast("long").as("exact_docs"),
        col("n_parts"),
        (abs(col("est") - col("exact_docs")) <=
          lit(HllMarginPct) * col("exact_docs")).as("est_ok"))
      .orderBy(col("lang"))
  }

  val qSketchRollupOracle: String =
    """SELECT lang,
      |       COUNT(DISTINCT doc_id) AS exact_docs,
      |       COUNT(DISTINCT source) AS n_parts,
      |       TRUE AS est_ok
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Ranks fitted per language in the Zipf regression. */
  val ZipfTopRanks = 100

  /** Zipf rank-frequency fit per language: regress ln(frequency) on
    * ln(rank) over each language's top-[[ZipfTopRanks]] words. Natural
    * text follows Zipf's law with slope near −1; a corpus slice whose
    * slope or R² drifts is machine-generated, boilerplate-flooded, or
    * mis-language-ID'd — a cheap whole-corpus quality signal next to the
    * per-document gates in TextOps.
    *
    * Scale shape: the word-count shuffle is vocabulary-bounded (keys =
    * distinct (lang, word), not corpus rows) with map-side partial
    * aggregation; the ranking window then runs on the tiny count table.
    * The regression itself is `regr_slope`/`regr_r2` — single-pass
    * codegen'd aggregates, no collect.
    */
  def textZipf(spark: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
    val ranked = freq
      .withColumn("r", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("c").desc, col("w"))))
      .filter(col("r") <= ZipfTopRanks)
    ranked.groupBy(col("lang"))
      .agg(round(expr("regr_slope(ln(c), ln(r))"), 4).as("zipf_slope"),
        round(expr("regr_r2(ln(c), ln(r))"), 4).as("zipf_r2"),
        count(lit(1)).as("n_ranks"))
      .orderBy(col("lang"))
  }

  val textZipfOracle: String =
    s"""WITH freq AS (
      |  SELECT lang, w, COUNT(*) AS c FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0
      |  GROUP BY lang, w),
      |ranked AS (
      |  SELECT lang, c,
      |         row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS r
      |  FROM freq)
      |SELECT lang,
      |       round(regr_slope(ln(c), ln(r)), 4) AS zipf_slope,
      |       round(regr_r2(ln(c), ln(r)), 4) AS zipf_r2,
      |       COUNT(*) AS n_ranks
      |FROM ranked WHERE r <= $ZipfTopRanks
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Cross-source quantile normalization — the fix for "source A's
    * quality scores live on a different scale than source B's": map each
    * document's raw score (type-token ratio here) through its OWN
    * source's empirical CDF via `percent_rank`, so a 0.9 means "top
    * decile of its source" regardless of the source's absolute range.
    * The report rolls normalized deciles up per source: raw-score spans
    * per decile differ wildly across sources (that's the problem), while
    * decile populations are near-uniform by construction (that's the
    * fix working).
    *
    * Scale shape: one shuffle on source for the rank window (a skewed
    * mega-source would range-partition within the window sort), then a
    * key-bounded (source × 10) aggregate. The doc_id tiebreak makes
    * `percent_rank` deterministic under score ties.
    */
  def curationQuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("ttr"), col("doc_id"))
    scored
      .withColumn("pr", percent_rank().over(w))
      .withColumn("decile", least(floor(col("pr") * 10), lit(9)).cast("long"))
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("ttr")), 4).as("ttr_lo"),
        round(max(col("ttr")), 4).as("ttr_hi"))
      .orderBy(col("source"), col("decile"))
  }

  val curationQuantileNormOracle: String =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |         len(list_distinct(string_split(text, ' '))) * 1.0
      |           / len(string_split(text, ' ')) AS ttr
      |  FROM documents),
      |ranked AS (
      |  SELECT source, ttr,
      |         percent_rank() OVER (PARTITION BY source
      |                              ORDER BY ttr, doc_id) AS pr
      |  FROM scored)
      |SELECT source,
      |       CAST(least(floor(pr * 10), 9) AS BIGINT) AS decile,
      |       COUNT(*) AS n_docs,
      |       round(MIN(ttr), 4) AS ttr_lo,
      |       round(MAX(ttr), 4) AS ttr_hi
      |FROM ranked
      |GROUP BY source, decile
      |ORDER BY source, decile""".stripMargin

  /** Character floor for the observed curation filter. */
  val ObserveMinChars = 300

  /** Pipeline observability via `Dataset.observe`: audit counters
    * (row and character totals) attached BEFORE and AFTER a curation
    * filter ride the action's own accumulators — at 100 TB this is how
    * you answer "how much did the gate drop?" without paying a second
    * scan for each counter. The observed metrics land in the returned
    * audit report (scan vs kept stage totals), which DuckDB reproduces
    * with two plain aggregates — proving the zero-extra-pass counters
    * equal the ground truth.
    */
  def qObserveAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Observation
    val scan = new Observation()
    val kept = new Observation()
    val filtered = Tables.documents(spark, dir)
      .observe(scan, count(lit(1)).as("n_rows"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .filter(length(col("text")) >= ObserveMinChars)
      .observe(kept, count(lit(1)).as("n_rows"),
        sum(length(col("text")).cast("long")).as("n_chars"))
    filtered.foreach(_ => ()) // one action; both observations fire on it
    val (s, k) = (scan.get, kept.get)
    import spark.implicits._
    Seq(
      ("scan", s("n_rows").asInstanceOf[Long], s("n_chars").asInstanceOf[Long]),
      ("kept", k("n_rows").asInstanceOf[Long], k("n_chars").asInstanceOf[Long]))
      .toDF("stage", "n_rows", "n_chars")
      .orderBy(col("stage"))
  }

  val qObserveAuditOracle: String =
    s"""SELECT * FROM (
      |  SELECT 'scan' AS stage, COUNT(*) AS n_rows,
      |         CAST(SUM(strlen(text)) AS BIGINT) AS n_chars
      |  FROM documents
      |  UNION ALL
      |  SELECT 'kept', COUNT(*), CAST(SUM(strlen(text)) AS BIGINT)
      |  FROM documents WHERE strlen(text) >= $ObserveMinChars)
      |ORDER BY stage""".stripMargin

  /** Sketch-intersection margin: three lgK=12 HLL estimates compound
    * through inclusion-exclusion, so the bound scales with the SUM of
    * the two set sizes (each estimate's own error scales with its
    * cardinality); 6% of (|A|+|B|) is ~3.7 sigma over the compounded
    * error — a regression tripwire, not a hard guarantee, same class as
    * [[HllMarginPct]].
    */
  val HllInterMarginPct = 0.06

  /** Set-intersection estimation from mergeable sketches — the audience
    * overlap question ("how many users both viewed and clicked, per
    * day") answered WITHOUT a user-level join: HLL supports union
    * natively, so the intersection comes from inclusion-exclusion
    * |A∩B| = est(A) + est(B) − est(A∪B) over three sketches built in
    * ONE pass / one day-keyed shuffle (conditional sketch inputs — the
    * union sketch is just the unconditional one because the scan is
    * already filtered to the two types). At 100 TB the three sketches
    * per day are the only shuffle payload, and staged per-day sketches
    * re-aggregate to any coarser grain by byte union (the
    * [[qSketchRollup]] play) — an exact distinct-intersection needs a
    * full user-level shuffle per regrain. Self-validating output: the
    * exact side ALSO comes from inclusion-exclusion (on exact distinct
    * counts), so DuckDB reproduces every value column and the sketch
    * bound rides as a constant-true boolean (estimates are
    * deterministic for a fixed input multiset — DataSketches HLL has no
    * RNG at build time).
    */
  def qHllIntersection(spark: SparkSession, dir: String): DataFrame = {
    val ev0 = Tables.events(spark, dir)
    val ev = ev0.withColumn("us", Tables.eventMicros(ev0))
      .filter(col("event_type").isin("view", "click"))
    val viewers = when(col("event_type") === "view", col("user_id"))
    val clickers = when(col("event_type") === "click", col("user_id"))
    ev.withColumn("day", to_date(timestamp_micros(col("us"))))
      .groupBy(col("day"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(viewers, lit(12))).as("est_a"),
        hll_sketch_estimate(hll_sketch_agg(clickers, lit(12))).as("est_b"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est_u"),
        countDistinct(viewers).as("exact_a"),
        countDistinct(clickers).as("exact_b"),
        countDistinct(col("user_id")).as("exact_u"))
      .select(col("day"), col("exact_a"), col("exact_b"),
        (col("exact_a") + col("exact_b") - col("exact_u")).as("exact_inter"),
        (abs((col("est_a") + col("est_b") - col("est_u")) -
          (col("exact_a") + col("exact_b") - col("exact_u"))) <=
          lit(HllInterMarginPct) * (col("exact_a") + col("exact_b")))
          .as("inter_ok"))
      .orderBy(col("day"))
  }

  val qHllIntersectionOracle: String =
    """SELECT CAST(ts AS DATE) AS day,
      |       COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
      |         AS exact_a,
      |       COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
      |         AS exact_b,
      |       COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
      |         + COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
      |         - COUNT(DISTINCT user_id) AS exact_inter,
      |       TRUE AS inter_ok
      |FROM events WHERE event_type IN ('view', 'click')
      |GROUP BY day ORDER BY day""".stripMargin

  /** DDSketch relative-error margin: α = 1% plus a hair of fp slack for
    * values that log-bucket onto a boundary ulp (the bound itself is a
    * hard guarantee of the sketch, not a statistical one like HLL's).
    */
  val DdAlpha = 0.01

  /** Mergeable quantile rollup on the [[graft.functions.DdSketch]]
    * aggregate — the 100 TB quantile play: exact percentile_disc sorts
    * the whole column inside each group, while the DD sketch ships
    * O(log(max/min)/α) bucket counters per partition through a map-side
    * partial aggregate and still lands within relative α of the true
    * order statistic — deterministically, for ANY partitioning, because
    * bucket counts are a pure function of the input multiset. Output is
    * self-validating (exact values + in-engine α-bound booleans, the
    * q_approx_agg convention): the estimates' log/pow arithmetic has no
    * cross-engine bit contract, but the BOUND holding is order- and
    * partitioning-independent, so the oracle asserts it as TRUE.
    */
  def qDdQuantiles(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DdSketch.register(spark)
    def okCol(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      abs(est - exact) <= lit(DdAlpha * 1.001) * exact
    // r15 replaced three percentile_disc object buffers (full column per
    // group in memory) with one window sort — but that sort still ran as
    // ONE task per l_returnflag group (3 groups), a parallelism ceiling
    // at scale (VERDICT r15 #3). r16: two-pass distributed selection.
    // Pass 1 histograms each group into fixed-width value buckets (one
    // map-side-partial aggregate; the per-(group,bucket) cumulative
    // window is over the tiny histogram, not the data). The target rank
    // k(q) = the FIRST position whose cumulative fraction k/n >= q under
    // DOUBLE division, exactly as percentile_disc and the r15 rewrite
    // evaluate it (probed: q=0.95 over 1..20 gives 19, NOT ceil=20's
    // neighbor) — computed by probing ceil(q*n)±1 against that same
    // double comparison, no sort needed. Pass 2 sorts ONLY the rows of
    // each quantile-straddling bucket (~n/bucket_count per task instead
    // of n) and picks position k - cum_before within it. Semantics are
    // identical because sorting is on the value alone: the value at a
    // fixed position of the sorted multiset does not depend on how ties
    // are broken. Oracle re-proven at sf0.001/sf0.01/sf0.1.
    // Non-null precondition: l_extendedprice is non-null in TPC-H; the
    // isNotNull guard (free on non-null data) pins percentile_disc's
    // null-skipping semantics should the column ever become nullable,
    // and l_returnflag is non-null so the inner joins below cannot drop
    // a group (ADVICE r15).
    val BucketWidth = 128.0 // ~820 buckets over TPC-H's [900, 105000]
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .filter(col("l_extendedprice").isNotNull)
      .withColumn("bkt", floor(col("l_extendedprice") / lit(BucketWidth)))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = base.groupBy(col("l_returnflag"), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum_before", coalesce(sum(col("c")).over(wCum), lit(0L)))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("l_returnflag"))))
    // k(q): smallest k with k/n >= q under double division — candidates
    // ceil(q*n)-1 / ceil(q*n) / ceil(q*n)+1 probed ascending. One row
    // per (group, quantile): explode the quantile menu over the
    // histogram ONCE (three separate filters would recompute it) and
    // keep each quantile's straddling bucket + the position inside it.
    val qCol = col("q")
    val k = {
      val n = col("n").cast("double")
      val b = ceil(qCol * n)
      when((b - 1) >= 1 && (b - 1) / n >= qCol, b - 1)
        .when(b / n >= qCol, b)
        .otherwise(b + 1)
        .cast("long")
    }
    val targets = hist
      .withColumn("qs", explode(array(
        Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99").map { case (q, t) =>
          struct(lit(q).as("q"), lit(t).as("qt"))
        }: _*)))
      .select(col("l_returnflag"), col("bkt"), col("c"), col("cum_before"),
        col("n"), col("qs.q").as("q"), col("qs.qt").as("qt"))
      .filter(col("cum_before") < k && col("cum_before") + col("c") >= k)
      .select(col("l_returnflag"), col("bkt"),
        (k - col("cum_before")).as("pos"), col("qt"))
    // pass 2: rank only the straddling buckets' rows; the window
    // partitions by (group, quantile), each holding one bucket's rows
    val wPick = Window.partitionBy(col("l_returnflag"), col("qt"))
      .orderBy(col("l_extendedprice"))
    val picked = base.join(broadcast(targets), Seq("l_returnflag", "bkt"))
      .withColumn("rnb", row_number().over(wPick))
      .filter(col("rnb") === col("pos"))
    val exact = picked.groupBy(col("l_returnflag"))
      .agg(min(when(col("qt") === "p50", col("l_extendedprice"))).as("p50_exact"),
        min(when(col("qt") === "p95", col("l_extendedprice"))).as("p95_exact"),
        min(when(col("qt") === "p99", col("l_extendedprice"))).as("p99_exact"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr(s"dd_sketch(l_extendedprice, $DdAlpha)").as("sk"),
        count(lit(1)).as("n_rows"))
      .join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_rows"),
        col("p50_exact"), col("p95_exact"), col("p99_exact"),
        okCol(col("sk.p50"), col("p50_exact")).as("ok_p50"),
        okCol(col("sk.p95"), col("p95_exact")).as("ok_p95"),
        okCol(col("sk.p99"), col("p99_exact")).as("ok_p99"))
      .orderBy(col("l_returnflag"))
  }

  val qDdQuantilesOracle: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |       quantile_disc(l_extendedprice, 0.5) AS p50_exact,
      |       quantile_disc(l_extendedprice, 0.95) AS p95_exact,
      |       quantile_disc(l_extendedprice, 0.99) AS p99_exact,
      |       TRUE AS ok_p50, TRUE AS ok_p95, TRUE AS ok_p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Benford first-digit audit over order totals — the fraud / synthetic
    * -data tripwire: naturally-occurring amounts follow log10(1 + 1/d)
    * first-digit frequencies, and a per-digit chi-square contribution
    * localizes which digit breaks the law. Map-only digit extraction +
    * one 9-group aggregate — nothing here grows with scale except the
    * scan.
    *
    * The first significant digit comes from the STRING form (first
    * [1-9] of the shortest-roundtrip decimal rendering, which both
    * engines produce) rather than `floor(x / 10^floor(log10 x))` —
    * the float route can misclassify values a ulp below a power of 10,
    * the string route cannot (scientific notation keeps leading digits,
    * so even an E-form rendering yields the same first digit). The
    * expected proportion is rounded to 6 places BEFORE the chi-square
    * algebra so a libm log10 ulp cannot propagate.
    */
  def qBenfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val digits = regexp_replace(
      col("o_totalprice").cast("string"), "[^1-9]", "")
    val counts = Tables.orders(spark, dir)
      .select(digits.as("ds"))
      .filter(length(col("ds")) >= 1) // ANSI-safe: cast only nonempty
      .select(substring(col("ds"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    counts
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("exp_p", round(log(10.0,
        lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total") + lit(5e-10), 4)
          .as("obs_p"),
        col("exp_p"),
        round(pow(col("n").cast("double") / col("total") - col("exp_p"), 2)
          / col("exp_p") * col("total") + lit(5e-10), 2).as("chi2_term"))
      .orderBy(col("digit"))
  }

  val qBenfordAuditOracle: String =
    """WITH ds AS (
      |  SELECT regexp_replace(CAST(o_totalprice AS VARCHAR),
      |                        '[^1-9]', '', 'g') AS s
      |  FROM orders),
      |c AS (
      |  SELECT CAST(substr(s, 1, 1) AS INTEGER) AS digit, COUNT(*) AS n
      |  FROM ds WHERE len(s) >= 1
      |  GROUP BY 1),
      |t AS (
      |  SELECT digit, n, SUM(n) OVER () AS total,
      |         round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_p
      |  FROM c)
      |SELECT digit, n,
      |       round(CAST(n AS DOUBLE) / total + 5e-10, 4) AS obs_p,
      |       exp_p,
      |       round(pow(CAST(n AS DOUBLE) / total - exp_p, 2)
      |             / exp_p * total + 5e-10, 2) AS chi2_term
      |FROM t ORDER BY digit""".stripMargin

  /** Deterministic A/B experiment read-out: users are hash-split into
    * two arms (user_id parity — the assignment every experimentation
    * platform derives from a stable user key), the per-user metric is
    * the mean `click` value, and the arms are compared with a Welch
    * t-statistic from explicit co-moment sums. Two key-space-bounded
    * aggregates (user rollup, then a 2-row arm rollup) — the only
    * data-touching shuffle is on user_id, and the t-test itself runs on
    * two rows regardless of scale.
    *
    * Per-user means are rounded BEFORE the arm moments (the
    * [[TimeSeriesOps]] float discipline: bound the sum-order drift at
    * the narrowest point), variance is the explicit `(n·s2 − s1²) /
    * (n·(n−1))` form, and the significance boolean thresholds the
    * ROUNDED t so it cannot sit on a cross-engine ulp.
    */
  def eventsAbTest(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(round(avg(col("value")), 5).as("m"))
      .withColumn("arm", (col("user_id") % 2).cast("int"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s1"),
        sum(col("m") * col("m")).as("s2"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("varr", (col("n") * col("s2") - col("s1") * col("s1"))
        / (col("n") * (col("n") - 1)))
    val t = arms.agg(
      sum(when(col("arm") === 0, col("n"))).as("n0"),
      sum(when(col("arm") === 1, col("n"))).as("n1"),
      sum(when(col("arm") === 0, col("mean"))).as("m0"),
      sum(when(col("arm") === 1, col("mean"))).as("m1"),
      sum(when(col("arm") === 0, col("varr"))).as("v0"),
      sum(when(col("arm") === 1, col("varr"))).as("v1"))
    t.select(col("n0"), col("n1"),
      round(col("m0"), 4).as("mean_control"),
      round(col("m1"), 4).as("mean_treat"),
      round((col("m1") - col("m0"))
        / sqrt(col("v0") / col("n0") + col("v1") / col("n1")), 4).as("t_stat"))
      .withColumn("significant", abs(col("t_stat")) > 1.96)
  }

  val eventsAbTestOracle: String =
    """WITH u AS (
      |  SELECT user_id, round(AVG(value), 5) AS m,
      |         CAST(user_id % 2 AS INTEGER) AS arm
      |  FROM events WHERE event_type = 'click' GROUP BY user_id),
      |a AS (
      |  SELECT arm, COUNT(*) AS n, SUM(m) AS s1, SUM(m * m) AS s2
      |  FROM u GROUP BY arm),
      |s AS (
      |  SELECT arm, n, s1 / n AS mean,
      |         (n * s2 - s1 * s1) / (n * (n - 1)) AS varr
      |  FROM a),
      |w AS (
      |  SELECT SUM(CASE WHEN arm = 0 THEN n END) AS n0,
      |         SUM(CASE WHEN arm = 1 THEN n END) AS n1,
      |         SUM(CASE WHEN arm = 0 THEN mean END) AS m0,
      |         SUM(CASE WHEN arm = 1 THEN mean END) AS m1,
      |         SUM(CASE WHEN arm = 0 THEN varr END) AS v0,
      |         SUM(CASE WHEN arm = 1 THEN varr END) AS v1
      |  FROM s)
      |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
      |       round(m0, 4) AS mean_control,
      |       round(m1, 4) AS mean_treat,
      |       round((m1 - m0) / sqrt(v0 / n0 + v1 / n1), 4) AS t_stat,
      |       abs(round((m1 - m0) / sqrt(v0 / n0 + v1 / n1), 4)) > 1.96
      |         AS significant
      |FROM w""".stripMargin

  /** Source-concentration audit: the Lorenz curve + Gini coefficient of
    * character mass across document sources — the "is our corpus
    * dominated by three crawls?" gate beside the per-source mean-shift
    * stats. All mass arithmetic stays in exact BIGINT (n_chars sums,
    * rank-weighted sums), so the sort order and the Gini numerator are
    * integer-exact in both engines; doubles appear only in the final
    * ratios. Gini uses the sorted-rank identity
    * `G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n` over sources sorted ascending
    * (tie-broken by name). One |sources|-sized aggregate then
    * window math over the tiny report — nothing scales with documents
    * except the rollup scan.
    */
  def curationGini(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("mass"), count(lit(1)).as("n_docs"))
    val w = Window.orderBy(col("mass"), col("source"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    perSource
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_mass", sum(col("mass")).over(wCum))
      .withColumn("total", sum(col("mass")).over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("iwx", sum(col("rank") * col("mass")).over(wAll))
      .select(col("source"), col("n_docs"), col("mass"), col("rank"),
        round(col("cum_mass").cast("double") / col("total") + lit(5e-10), 4)
          .as("lorenz_cum_share"),
        round(lit(2.0) * col("iwx") / (col("n") * col("total"))
          - (col("n") + lit(1)).cast("double") / col("n") + lit(5e-10), 4)
          .as("gini"))
      .orderBy(col("rank"))
  }

  val curationGiniOracle: String =
    """WITH s AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass,
      |         COUNT(*) AS n_docs
      |  FROM documents GROUP BY source),
      |rk AS (
      |  SELECT source, n_docs, mass,
      |         row_number() OVER (ORDER BY mass, source) AS rank,
      |         SUM(mass) OVER (ORDER BY mass, source
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS cum_mass
      |  FROM s),
      |r AS (
      |  SELECT *, CAST(SUM(mass) OVER () AS BIGINT) AS total,
      |         COUNT(*) OVER () AS n,
      |         CAST(SUM(rank * mass) OVER () AS BIGINT) AS iwx
      |  FROM rk)
      |SELECT source, n_docs, mass, rank,
      |       round(CAST(cum_mass AS DOUBLE) / total + 5e-10, 4)
      |         AS lorenz_cum_share,
      |       round(2.0 * iwx / (n * total)
      |             - CAST(n + 1 AS DOUBLE) / n + 5e-10, 4) AS gini
      |FROM r ORDER BY rank""".stripMargin

  /** Decile lift table — the model-evaluation read-out for a ranking
    * score (here: per-user total `click` value ranking, `purchase` as
    * the conversion label): users are split into score deciles
    * (ntile 10, tie-broken by user_id so the split is deterministic in
    * both engines), and each decile reports its conversion rate, lift
    * over the base rate, and cumulative capture of all converters.
    * Shapes: one user_id rollup (the only data-touching shuffle), then
    * window math over |users| rows and a 10-row aggregate. Scores are
    * rounded BEFORE ranking so sum-order noise cannot reorder ties.
    *
    * Scale note: the exact global ntile is a single-partition sort of
    * the |users| rollup — fine to ~10⁸ rows (a 12-byte (score, id) pair
    * per user), which the rollup reaches only at extreme user counts.
    * Past that, the drop-in scale path is the two-pass counted-bucket
    * rank (per-score-bucket counts → broadcast cumulative offsets →
    * local rank + offset), trading the exact tie order inside one
    * 1e-5-score bucket for full parallelism; the oracle pins the exact
    * form, so the swap belongs behind a size threshold, not here.
    */
  def eventsDecileLift(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        round(sum(when(col("event_type") === "click", col("value"))
          .otherwise(lit(0.0))), 5).as("score"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
    val wRank = Window.orderBy(col("score").desc, col("user_id"))
    val deciles = perUser
      .withColumn("decile", ntile(10).over(wRank))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    deciles
      .withColumn("tot_users", sum(col("n_users")).over(wAll))
      .withColumn("tot_conv", sum(col("n_conv")).over(wAll))
      .withColumn("cum_conv", sum(col("n_conv")).over(wCum))
      .select(col("decile"), col("n_users"), col("n_conv"),
        round(col("n_conv").cast("double") / col("n_users") + lit(5e-10), 4)
          .as("conv_rate"),
        round((col("n_conv").cast("double") / col("n_users"))
          / (col("tot_conv").cast("double") / col("tot_users"))
          + lit(5e-10), 4).as("lift"),
        round(col("cum_conv").cast("double") / col("tot_conv")
          + lit(5e-10), 4).as("cum_capture"))
      .orderBy(col("decile"))
  }

  val eventsDecileLiftOracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |         round(SUM(CASE WHEN event_type = 'click' THEN value
      |                        ELSE 0.0 END), 5) AS score,
      |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |           AS converted
      |  FROM events GROUP BY user_id),
      |d AS (
      |  SELECT ntile(10) OVER (ORDER BY score DESC, user_id) AS decile,
      |         converted
      |  FROM u),
      |g AS (
      |  SELECT decile, COUNT(*) AS n_users,
      |         CAST(SUM(converted) AS BIGINT) AS n_conv
      |  FROM d GROUP BY decile),
      |t AS (
      |  SELECT decile, n_users, n_conv,
      |         CAST(SUM(n_users) OVER () AS BIGINT) AS tot_users,
      |         CAST(SUM(n_conv) OVER () AS BIGINT) AS tot_conv,
      |         CAST(SUM(n_conv) OVER (ORDER BY decile
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) AS cum_conv
      |  FROM g)
      |SELECT decile, n_users, n_conv,
      |       round(CAST(n_conv AS DOUBLE) / n_users + 5e-10, 4) AS conv_rate,
      |       round((CAST(n_conv AS DOUBLE) / n_users)
      |             / (CAST(tot_conv AS DOUBLE) / tot_users) + 5e-10, 4)
      |         AS lift,
      |       round(CAST(cum_conv AS DOUBLE) / tot_conv + 5e-10, 4)
      |         AS cum_capture
      |FROM t ORDER BY decile""".stripMargin

  /** Token-budget waterfilling — the mixture allocator that caps
    * dominant sources: given a global budget B (half the corpus mass
    * here, integer-exact `total DIV 2`), find the water level L such
    * that `Σ min(mass_s, L) = B`; sources under L keep everything,
    * sources over L are capped AT L. Complements [[curationGini]] (the
    * audit) and `sample_token_budget` (the per-shard greedy fill):
    * this is the cross-source OPTIMAL cap, closed-form per sorted
    * segment — for the i-th source ascending, the candidate level
    * `L_i = (B − cum_{i−1}) / (n − i + 1)` is valid iff it falls in
    * [mass_{i−1}, mass_i], and exactly one candidate is (or B covers
    * everything). All inputs to L are exact BIGINTs, so both engines
    * derive the identical double and every downstream min/flag agrees
    * bit-for-bit. Window math over the |sources|-sized rollup only.
    */
  def curationWaterfill(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("mass"))
    val ord = Window.orderBy(col("mass"), col("source"))
    val wCum = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val ranked = s
      .withColumn("i", row_number().over(ord))
      .withColumn("cum", sum(col("mass")).over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("mass")).over(wAll))
      .withColumn("budget", (col("total") / 2).cast("long"))
      .withColumn("prev_mass",
        coalesce(lag(col("mass"), 1).over(ord), lit(0L)))
      .withColumn("cand",
        (col("budget") - (col("cum") - col("mass"))).cast("double")
          / (col("n") - col("i") + 1))
      .withColumn("valid",
        col("cand") >= col("prev_mass").cast("double") &&
          col("cand") <= col("mass").cast("double"))
    val level = ranked
      .withColumn("lvl",
        when(col("budget") >= col("total"), col("total").cast("double"))
          .otherwise(max(when(col("valid"), col("cand"))).over(wAll)))
    level.select(col("source"), col("mass"), col("budget"),
      round(least(col("mass").cast("double"), col("lvl")) + lit(5e-10), 2)
        .as("alloc"),
      (col("mass").cast("double") > col("lvl")).as("capped"))
      .orderBy(col("source"))
  }

  val curationWaterfillOracle: String =
    """WITH s AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
      |  FROM documents GROUP BY source),
      |r AS (
      |  SELECT source, mass,
      |         row_number() OVER (ORDER BY mass, source) AS i,
      |         CAST(SUM(mass) OVER (ORDER BY mass, source
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) AS cum,
      |         COUNT(*) OVER () AS n,
      |         CAST(SUM(mass) OVER () AS BIGINT) AS total,
      |         CAST(COALESCE(lag(mass) OVER (ORDER BY mass, source), 0)
      |           AS BIGINT) AS prev_mass
      |  FROM s),
      |c AS (
      |  SELECT *, total // 2 AS budget,
      |         CAST(total // 2 - (cum - mass) AS DOUBLE) / (n - i + 1)
      |           AS cand
      |  FROM r),
      |v AS (
      |  SELECT *, cand >= CAST(prev_mass AS DOUBLE)
      |            AND cand <= CAST(mass AS DOUBLE) AS valid
      |  FROM c),
      |l AS (
      |  SELECT *, CASE WHEN budget >= total THEN CAST(total AS DOUBLE)
      |            ELSE MAX(CASE WHEN valid THEN cand END) OVER () END AS lvl
      |  FROM v)
      |SELECT source, mass, CAST(budget AS BIGINT) AS budget,
      |       round(least(CAST(mass AS DOUBLE), lvl) + 5e-10, 2) AS alloc,
      |       CAST(mass AS DOUBLE) > lvl AS capped
      |FROM l ORDER BY source""".stripMargin

  /** Difference-in-differences — the causal read-out [[eventsAbTest]]
    * cannot give when arms differ at baseline: users split by the
    * stable-key parity arm, time split at mid-window, per-(user,
    * period) mean value rounded FIRST, then the four (arm × period)
    * cell means and `DiD = (T_post − T_pre) − (C_post − C_pre)`. Two
    * key-space-bounded rollups (user-period, then 4 cells); the cell
    * means and DiD carry the ε tie-break (small denominators).
    */
  def eventsDiffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val perUser = ev
      .withColumn("period",
        when(to_date(timestamp_micros(Tables.eventMicros(ev)))
          < lit("2024-01-16").cast("date"), lit("pre")).otherwise(lit("post")))
      .groupBy(col("user_id"), col("period"))
      .agg(round(avg(col("value")), 5).as("m"))
      .withColumn("arm", (col("user_id") % 2).cast("int"))
    val cells = perUser.groupBy(col("arm"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s"))
      .withColumn("mean", col("s") / col("n"))
    cells.agg(
      round(sum(when(col("arm") === 0 && col("period") === "pre",
        col("mean"))) + lit(5e-10), 4).as("c_pre"),
      round(sum(when(col("arm") === 0 && col("period") === "post",
        col("mean"))) + lit(5e-10), 4).as("c_post"),
      round(sum(when(col("arm") === 1 && col("period") === "pre",
        col("mean"))) + lit(5e-10), 4).as("t_pre"),
      round(sum(when(col("arm") === 1 && col("period") === "post",
        col("mean"))) + lit(5e-10), 4).as("t_post"))
      .withColumn("did", round((col("t_post") - col("t_pre"))
        - (col("c_post") - col("c_pre")), 4))
  }

  val eventsDiffInDiffOracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |         CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
      |           THEN 'pre' ELSE 'post' END AS period,
      |         value
      |  FROM events),
      |pu AS (
      |  SELECT user_id, period, round(AVG(value), 5) AS m,
      |         CAST(user_id % 2 AS INTEGER) AS arm
      |  FROM u GROUP BY user_id, period),
      |c AS (
      |  SELECT arm, period, COUNT(*) AS n, SUM(m) AS s,
      |         SUM(m) / COUNT(*) AS mean
      |  FROM pu GROUP BY arm, period),
      |w AS (
      |  SELECT
      |    round(SUM(CASE WHEN arm = 0 AND period = 'pre' THEN mean END)
      |          + 5e-10, 4) AS c_pre,
      |    round(SUM(CASE WHEN arm = 0 AND period = 'post' THEN mean END)
      |          + 5e-10, 4) AS c_post,
      |    round(SUM(CASE WHEN arm = 1 AND period = 'pre' THEN mean END)
      |          + 5e-10, 4) AS t_pre,
      |    round(SUM(CASE WHEN arm = 1 AND period = 'post' THEN mean END)
      |          + 5e-10, 4) AS t_post
      |  FROM c)
      |SELECT c_pre, c_post, t_pre, t_post,
      |       round((t_post - t_pre) - (c_post - c_pre), 4) AS did
      |FROM w""".stripMargin

  /** Cohen's kappa between two deterministic document-quality
    * "annotators" (the lexical-diversity rule and the length rule) —
    * the inter-rater agreement gate a labeling pipeline runs before
    * trusting silver labels. All four confusion cells are exact
    * integers; observed and chance agreement are exact-integer ratios
    * (identical doubles both engines), κ = (p_o − p_e)/(1 − p_e) with
    * the ε tie-break on the rounded outputs. Map-only labeling + one
    * 4-cell rollup.
    */
  def curationCohensKappa(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val labeled = Tables.documents(spark, dir)
      .select(
        (size(array_distinct(toks)).cast("double") / size(toks) >= 0.5)
          .as("a"),
        (col("n_chars") >= 300).as("b"))
    val cells = labeled.agg(
      count(lit(1)).as("n"),
      sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
      sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
      sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
      sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
    cells
      .withColumn("po", (col("n11") + col("n00")).cast("double") / col("n"))
      .withColumn("pe",
        ((col("n11") + col("n10")) * (col("n11") + col("n01"))
          + (col("n01") + col("n00")) * (col("n10") + col("n00")))
          .cast("double") / (col("n") * col("n")))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        round(col("po") + lit(5e-10), 4).as("p_observed"),
        round(col("pe") + lit(5e-10), 4).as("p_chance"),
        round((col("po") - col("pe")) / (lit(1.0) - col("pe"))
          + lit(5e-10), 4).as("kappa"))
  }

  val curationCohensKappaOracle: String =
    """WITH l AS (
      |  SELECT CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')) >= 0.5 AS a,
      |         n_chars >= 300 AS b
      |  FROM documents),
      |c AS (
      |  SELECT COUNT(*) AS n,
      |         CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n11,
      |         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n10,
      |         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n01,
      |         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n00
      |  FROM l),
      |k AS (
      |  SELECT *,
      |    CAST(n11 + n00 AS DOUBLE) / n AS po,
      |    CAST((n11 + n10) * (n11 + n01)
      |         + (n01 + n00) * (n10 + n00) AS DOUBLE) / (n * n) AS pe
      |  FROM c)
      |SELECT n, n11, n10, n01, n00,
      |       round(po + 5e-10, 4) AS p_observed,
      |       round(pe + 5e-10, 4) AS p_chance,
      |       round((po - pe) / (1.0 - pe) + 5e-10, 4) AS kappa
      |FROM k""".stripMargin

  /** Kaplan–Meier time-to-conversion curve — survival analysis with
    * right-censoring, the read-out a naive "mean days to purchase"
    * gets wrong because users who never converted are CENSORED, not
    * failures: a user's event time is their FIRST purchase day, users
    * with no purchase stay in the risk set until the observation
    * horizon and never count as events. The risk set entering day t is
    * everyone who hasn't converted before t (N minus the prior-day
    * cumulative events — one window over the per-day rollup), the
    * hazard is d_t / n_t, and the curve is the running product
    * Π(1 − hazard), computed as exp(Σ ln(·)) — a cumulative WINDOW
    * sum, so both engines accumulate the (≤ libm-ulp apart) log terms
    * in the same order and the ε tie-break absorbs the residue at
    * round-4. A day whose events EXHAUST the risk set (hazard = 1 — in
    * the fixture every user eventually converts, so the last event day
    * does) would feed ln(0), where the engines diverge (NULL vs −inf vs
    * error); that term is NULL-guarded out of the sum and the survival
    * pinned to exactly 0.0 — the mathematically correct curve value.
    * Everything after the per-user rollup is calendar-bounded.
    */
  def eventsSurvivalKm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val users = ev.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val firstBuy = ev
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(to_date(timestamp_micros(Tables.eventMicros(ev))))
        .as("t"))
    val perDay = firstBuy.groupBy(col("t"))
      .agg(count(lit(1)).as("d"))
    val wOrd = Window.orderBy(col("t"))
    val wPrior = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    perDay.crossJoin(broadcast(users))
      .withColumn("n_risk",
        col("n_users") - coalesce(sum(col("d")).over(wPrior), lit(0L)))
      .withColumn("hazard", round(col("d").cast("double") / col("n_risk")
        + lit(5e-10), 6))
      .withColumn("lnterm", when(col("d") < col("n_risk"),
        log(lit(1.0) - col("d").cast("double") / col("n_risk"))))
      .withColumn("survival",
        when(col("d") === col("n_risk"), lit(0.0))
          .otherwise(round(exp(sum(col("lnterm")).over(wCum))
            + lit(5e-10), 4)))
      .select(col("t"), col("n_risk"), col("d"), col("hazard"),
        col("survival"))
      .orderBy(col("t"))
  }

  val eventsSurvivalKmOracle: String =
    """WITH n AS (
      |  SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
      |fb AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS t
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |c AS (SELECT t, COUNT(*) AS d FROM fb GROUP BY t),
      |r AS (
      |  SELECT t, d,
      |         n_users - COALESCE(SUM(d) OVER (ORDER BY t
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS n_risk
      |  FROM c CROSS JOIN n)
      |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d,
      |       round(CAST(d AS DOUBLE) / n_risk + 5e-10, 6) AS hazard,
      |       CASE WHEN d = n_risk THEN 0.0
      |            ELSE round(exp(SUM(CASE WHEN d < n_risk
      |                THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk) END)
      |              OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |                    AND CURRENT ROW)) + 5e-10, 4) END AS survival
      |FROM r ORDER BY t""".stripMargin

  /** Experiment power analysis — the design-side companion to
    * [[eventsAbTest]]: from the live per-user metric variance, report
    * the minimum detectable effect at the CURRENT sample size and the
    * per-arm n REQUIRED to detect a unit effect, both at α = 0.05 /
    * 80% power (z constants 1.96 and 0.84, the standard two-sided
    * approximation `n = 2σ²(z_α + z_β)² / δ²`). Pooled variance comes
    * from the same explicit co-moment algebra as the t-test; the
    * required-n ceiling is taken on identical doubles in both engines.
    * One user rollup, then scalar math.
    */
  def eventsPowerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(round(avg(col("value")), 5).as("m"))
    val mo = perUser.agg(count(lit(1)).as("n"),
      sum(col("m")).as("s1"), sum(col("m") * col("m")).as("s2"))
      .withColumn("varr", (col("n") * col("s2") - col("s1") * col("s1"))
        / (col("n") * (col("n") - 1)))
    // 2.8 as ONE literal, not 1.96 + 0.84 — the sum differs from the
    // closest-double-to-2.8 by an ulp and the oracle writes 2.8
    val z = lit(2.8)
    mo.select(col("n").as("n_users"),
      round(col("varr") + lit(5e-10), 4).as("pooled_var"),
      round(z * sqrt(lit(2.0) * col("varr")
        / (col("n") / 2).cast("long")) + lit(5e-10), 4).as("mde_now"),
      // round-6 the ceil argument: varr comes from partial sums whose
      // accumulation order is engine/partitioning dependent, and an
      // unrounded 2·varr·2.8² an ulp under an integer would flip the
      // ceiling by 1 across engines
      ceil(round(lit(2.0) * col("varr") * z * z, 6)).cast("long")
        .as("n_per_arm_for_unit_effect"))
  }

  val eventsPowerAnalysisOracle: String =
    """WITH u AS (
      |  SELECT user_id, round(AVG(value), 5) AS m
      |  FROM events WHERE event_type = 'click' GROUP BY user_id),
      |mo AS (
      |  SELECT COUNT(*) AS n, SUM(m) AS s1, SUM(m * m) AS s2 FROM u),
      |v AS (
      |  SELECT n, (n * s2 - s1 * s1) / (n * (n - 1)) AS varr FROM mo)
      |SELECT n AS n_users,
      |       round(varr + 5e-10, 4) AS pooled_var,
      |       round(2.8 * sqrt(2.0 * varr / (n // 2)) + 5e-10, 4) AS mde_now,
      |       CAST(ceil(round(2.0 * varr * 2.8 * 2.8, 6)) AS BIGINT)
      |         AS n_per_arm_for_unit_effect
      |FROM v""".stripMargin

  /** Pairwise Pearson correlation matrix over four lineitem measures in
    * ONE aggregate pass — the wide-aggregation pattern: all 15 moment
    * sums (4 firsts, 4 squares, 6 cross-products, count) come out of a
    * single partial+final HashAggregate over one scan, then the 6
    * correlations are scalar algebra on a 1-row frame unpivoted to
    * long form. The naive per-pair `corr()` calls would scan 6× and
    * hide the moment algebra behind engine-specific implementations;
    * explicit co-moments at least make the algebra identical in both
    * engines. NOTE the raw-double sums themselves remain
    * accumulation-order dependent (~1e-12 relative drift); stability
    * here leans on round-4 + ε absorbing that drift, NOT on the
    * co-moment form — ops with tighter output precision should round
    * inputs before summing (the [[TimeSeriesOps]] discipline) instead
    * of copying this pattern. NULL-guarded zero variance.
    */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_quantity").as("q"), col("l_extendedprice").as("p"),
      col("l_discount").as("d"), col("l_tax").as("t"))
    val m = li.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("q")).as("sq"), sum(col("p")).as("sp"),
      sum(col("d")).as("sd"), sum(col("t")).as("st"),
      sum(col("q") * col("q")).as("sqq"), sum(col("p") * col("p")).as("spp"),
      sum(col("d") * col("d")).as("sdd"), sum(col("t") * col("t")).as("stt"),
      sum(col("q") * col("p")).as("sqp"), sum(col("q") * col("d")).as("sqd"),
      sum(col("q") * col("t")).as("sqt"), sum(col("p") * col("d")).as("spd"),
      sum(col("p") * col("t")).as("spt"), sum(col("d") * col("t")).as("sdt"))
    def corr(sab: Column, sa: Column, sb: Column,
        saa: Column, sbb: Column): Column = {
      val cov = col("n") * sab - sa * sb
      val va = col("n") * saa - sa * sa
      val vb = col("n") * sbb - sb * sb
      when(va <= 0 || vb <= 0, lit(null).cast("double"))
        .otherwise(round(cov / sqrt(va * vb) + lit(5e-10), 4))
    }
    m.select(
      corr(col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp")).as("qty_price"),
      corr(col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd")).as("qty_discount"),
      corr(col("sqt"), col("sq"), col("st"), col("sqq"), col("stt")).as("qty_tax"),
      corr(col("spd"), col("sp"), col("sd"), col("spp"), col("sdd")).as("price_discount"),
      corr(col("spt"), col("sp"), col("st"), col("spp"), col("stt")).as("price_tax"),
      corr(col("sdt"), col("sd"), col("st"), col("sdd"), col("stt")).as("discount_tax"))
      .selectExpr("stack(6, 'qty_price', qty_price, 'qty_discount', " +
        "qty_discount, 'qty_tax', qty_tax, 'price_discount', price_discount, " +
        "'price_tax', price_tax, 'discount_tax', discount_tax) " +
        "AS (pair, pearson)")
      .orderBy(col("pair"))
  }

  val qCorrMatrixOracle: String =
    """WITH m AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |         SUM(l_quantity) AS sq, SUM(l_extendedprice) AS sp,
      |         SUM(l_discount) AS sd, SUM(l_tax) AS st,
      |         SUM(l_quantity * l_quantity) AS sqq,
      |         SUM(l_extendedprice * l_extendedprice) AS spp,
      |         SUM(l_discount * l_discount) AS sdd,
      |         SUM(l_tax * l_tax) AS stt,
      |         SUM(l_quantity * l_extendedprice) AS sqp,
      |         SUM(l_quantity * l_discount) AS sqd,
      |         SUM(l_quantity * l_tax) AS sqt,
      |         SUM(l_extendedprice * l_discount) AS spd,
      |         SUM(l_extendedprice * l_tax) AS spt,
      |         SUM(l_discount * l_tax) AS sdt
      |  FROM lineitem),
      |w AS (
      |  SELECT * FROM (
      |    SELECT 'qty_price' AS pair, sqp AS sab, sq AS sa, sp AS sb,
      |           sqq AS saa, spp AS sbb, n FROM m
      |    UNION ALL SELECT 'qty_discount', sqd, sq, sd, sqq, sdd, n FROM m
      |    UNION ALL SELECT 'qty_tax', sqt, sq, st, sqq, stt, n FROM m
      |    UNION ALL SELECT 'price_discount', spd, sp, sd, spp, sdd, n FROM m
      |    UNION ALL SELECT 'price_tax', spt, sp, st, spp, stt, n FROM m
      |    UNION ALL SELECT 'discount_tax', sdt, sd, st, sdd, stt, n FROM m))
      |SELECT pair,
      |       CASE WHEN n * saa - sa * sa <= 0 OR n * sbb - sb * sb <= 0
      |            THEN NULL
      |            ELSE round((n * sab - sa * sb)
      |                   / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
      |                   + 5e-10, 4) END AS pearson
      |FROM w ORDER BY pair""".stripMargin

  /** Bot-likeness scoring from inter-arrival regularity — the abuse
    * gate: humans arrive bursty (coefficient of variation of gaps ≈ 1,
    * exponential-ish), schedulers arrive regular (cv → 0). Gaps are
    * integer SECONDS (each timestamp floored to seconds FIRST, then
    * differenced — the order matters and both engines mirror it), so
    * every moment sum is integer-exact in BIGINT regardless of
    * aggregation order; doubles appear only at the final divisions.
    * One user_id shuffle serves the lag window and the rollup. The
    * regularity flag thresholds the ROUNDED cv.
    */
  def eventsBotScore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gaps = ev
      .withColumn("us", Tables.eventMicros(ev))
      .withColumn("s", expr("us div 1000000"))
      .withColumn("gap", col("s") - lag(col("s"), 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("sg"),
        sum(col("gap") * col("gap")).as("sgg"))
      .withColumn("mean_gap_s",
        round(col("sg").cast("double") / col("n_gaps") + lit(5e-10), 2))
      .withColumn("cv", round(
        sqrt((col("n_gaps") * col("sgg") - col("sg") * col("sg"))
          .cast("double") / (col("n_gaps") * (col("n_gaps") - 1)))
          / (col("sg").cast("double") / col("n_gaps")) + lit(5e-10), 4))
      .select(col("user_id"), col("n_gaps"), col("mean_gap_s"), col("cv"),
        (col("cv") < 0.85).as("is_regular"))
      .orderBy(col("user_id"))
  }

  val eventsBotScoreOracle: String =
    """WITH s AS (
      |  SELECT user_id, event_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
      |  FROM events),
      |g AS (
      |  SELECT user_id,
      |         sec - lag(sec) OVER (PARTITION BY user_id
      |           ORDER BY sec, event_id) AS gap
      |  FROM s),
      |m AS (
      |  SELECT user_id, COUNT(*) AS n_gaps,
      |         CAST(SUM(gap) AS BIGINT) AS sg,
      |         CAST(SUM(gap * gap) AS BIGINT) AS sgg
      |  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
      |SELECT user_id, n_gaps,
      |       round(CAST(sg AS DOUBLE) / n_gaps + 5e-10, 2) AS mean_gap_s,
      |       round(sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)
      |               / (n_gaps * (n_gaps - 1)))
      |             / (CAST(sg AS DOUBLE) / n_gaps) + 5e-10, 4) AS cv,
      |       round(sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)
      |               / (n_gaps * (n_gaps - 1)))
      |             / (CAST(sg AS DOUBLE) / n_gaps) + 5e-10, 4) < 0.85
      |         AS is_regular
      |FROM m ORDER BY user_id""".stripMargin

  /** Temperature-scaled mixture weights (α = 0.7) — the multilingual
    * sampling rule (mBERT / XLM-R lineage): raw language shares p_i are
    * flattened to `p_i^α / Σ p_j^α`, up-sampling tails without letting
    * heads dominate. Reports raw vs temperature shares and the
    * up/down-sampling factor per language. |langs|-bounded rollup; the
    * pow/ratio chain is the same literal tree both engines and every
    * output rounds with the ε tie-break.
    */
  def curationTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    val byLang = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    byLang
      .withColumn("p", col("n_docs").cast("double")
        / sum(col("n_docs")).over(wAll))
      .withColumn("pa", pow(col("p"), 0.7))
      .withColumn("q", col("pa") / sum(col("pa")).over(wAll))
      .select(col("lang"), col("n_docs"),
        round(col("p") + lit(5e-10), 4).as("raw_share"),
        round(col("q") + lit(5e-10), 4).as("temp_share"),
        round(col("q") / col("p") + lit(5e-10), 4).as("boost"))
      .orderBy(col("lang"))
  }

  val curationTemperatureMixOracle: String =
    """WITH b AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |p AS (
      |  SELECT lang, n_docs,
      |         CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS p
      |  FROM b),
      |a AS (
      |  SELECT *, pow(p, 0.7) AS pa FROM p),
      |q AS (
      |  SELECT *, pa / SUM(pa) OVER () AS q FROM a)
      |SELECT lang, n_docs,
      |       round(p + 5e-10, 4) AS raw_share,
      |       round(q + 5e-10, 4) AS temp_share,
      |       round(q / p + 5e-10, 4) AS boost
      |FROM q ORDER BY lang""".stripMargin

  /** Per-source metric-bias audit: the Pearson correlation between
    * document length and lexical diversity WITHIN each source — the
    * segment-level complement of [[qCorrMatrix]]'s global pass. A
    * quality metric that secretly tracks length in one crawl but not
    * another will skew any length-balanced sample; the per-segment
    * correlation is the tripwire. Same one-pass wide aggregation (all
    * five co-moment sums per source in a single partial+final
    * HashAggregate), NULL-guarded degenerate segments, round-4 + ε —
    * with [[qCorrMatrix]]'s caveat: the raw-double sums are
    * accumulation-order dependent, and it is the round+ε that absorbs
    * the drift, not the co-moment algebra.
    */
  def curationBiasAudit(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = Tables.documents(spark, dir)
      .select(col("source"),
        col("n_chars").cast("double").as("x"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("y"))
    scored.groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("source"), col("n").cast("long").as("n_docs"),
        when(col("vx") <= 0 || col("vy") <= 0, lit(null).cast("double"))
          .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt(col("vx") * col("vy")) + lit(5e-10), 4))
          .as("len_diversity_corr"))
      .orderBy(col("source"))
  }

  val curationBiasAuditOracle: String =
    """WITH s AS (
      |  SELECT source, CAST(n_chars AS DOUBLE) AS x,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')) AS y
      |  FROM documents),
      |m AS (
      |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
      |         SUM(x) AS sx, SUM(y) AS sy,
      |         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      |  FROM s GROUP BY source),
      |v AS (
      |  SELECT *, n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy
      |  FROM m)
      |SELECT source, CAST(n AS BIGINT) AS n_docs,
      |       CASE WHEN vx <= 0 OR vy <= 0 THEN NULL
      |            ELSE round((n * sxy - sx * sy) / sqrt(vx * vy) + 5e-10, 4)
      |            END AS len_diversity_corr
      |FROM v ORDER BY source""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_bias_audit" -> (curationBiasAudit _),
    "curation_temperature_mix" -> (curationTemperatureMix _),
    "events_bot_score" -> (eventsBotScore _),
    "q_corr_matrix" -> (qCorrMatrix _),
    "events_power_analysis" -> (eventsPowerAnalysis _),
    "events_survival_km" -> (eventsSurvivalKm _),
    "events_diff_in_diff" -> (eventsDiffInDiff _),
    "curation_cohens_kappa" -> (curationCohensKappa _),
    "curation_waterfill" -> (curationWaterfill _),
    "curation_gini" -> (curationGini _),
    "events_decile_lift" -> (eventsDecileLift _),
    "q_benford_audit" -> (qBenfordAudit _),
    "events_ab_test" -> (eventsAbTest _),
    "q_hll_intersection" -> (qHllIntersection _),
    "q_dd_quantiles" -> (qDdQuantiles _),
    "q_observe_audit" -> (qObserveAudit _),
    "q_sketch_rollup" -> (qSketchRollup _),
    "text_zipf" -> (textZipf _),
    "curation_quantile_norm" -> (curationQuantileNorm _))

  def oracles: Map[String, String] = Map(
    "curation_bias_audit" -> curationBiasAuditOracle,
    "curation_temperature_mix" -> curationTemperatureMixOracle,
    "events_bot_score" -> eventsBotScoreOracle,
    "q_corr_matrix" -> qCorrMatrixOracle,
    "events_power_analysis" -> eventsPowerAnalysisOracle,
    "events_survival_km" -> eventsSurvivalKmOracle,
    "events_diff_in_diff" -> eventsDiffInDiffOracle,
    "curation_cohens_kappa" -> curationCohensKappaOracle,
    "curation_waterfill" -> curationWaterfillOracle,
    "curation_gini" -> curationGiniOracle,
    "events_decile_lift" -> eventsDecileLiftOracle,
    "q_benford_audit" -> qBenfordAuditOracle,
    "events_ab_test" -> eventsAbTestOracle,
    "q_hll_intersection" -> qHllIntersectionOracle,
    "q_dd_quantiles" -> qDdQuantilesOracle,
    "q_observe_audit" -> qObserveAuditOracle,
    "q_sketch_rollup" -> qSketchRollupOracle,
    "text_zipf" -> textZipfOracle,
    "curation_quantile_norm" -> curationQuantileNormOracle)
}
