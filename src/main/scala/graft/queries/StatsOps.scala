package graft.queries

import graft.Tables
import graft.functions.{Exact, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus/dataset statistics operators (SURVEY.md §2 q121, q123) —
  * the profiling passes a data-quality or feature-engineering stage
  * runs over whole tables, built to cost ONE scan regardless of how
  * many statistics come out.
  */
object StatsOps {

  /** q121 feature columns — the full correlation matrix over these. */
  val CORR_COLS: Seq[String] =
    Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  /** q121: ONE-PASS PEARSON CORRELATION MATRIX — all C(4,2) pairwise
    * correlations from a single aggregate over the fact table, in
    * contrast to df.stat.corr which scans once PER PAIR.
    *
    * Moments are EXACT without decimal aggregation: every input has
    * <= 2 decimals, so per-row values quantize losslessly-deterministic
    * to integer 1e4-units (floor(x*1e4+0.5) — one IEEE op, identical
    * in both engines, all columns non-negative). A plain long sum of
    * the squared-price units would overflow 2^63 at bench scale
    * already, so each product moment is summed as a SPLIT ACCUMULATOR:
    * hi = sum(v >> 20), lo = sum(v & (2^20-1)) — two primitive long
    * sums per moment, overflow-safe past 1000x the bench volume, fully
    * inside whole-stage codegen. (The DECIMAL(18,4) Exact idiom is
    * bit-equal but its 28-digit sum buffer leaves Spark's long-backed
    * decimal fast path — measured ~6x slower on this 15-moment pass.)
    * The exact total hi*2^20 + lo is reconstructed in double (two IEEE
    * ops on identical integers — deterministic), and the correlation
    * formula and micro-unit quantization follow identically in both
    * engines. The matrix rows are exploded from the single 1-row
    * aggregate — no second scan, no join.
    */
  def q121CorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val pairs = for {
      i <- CORR_COLS.indices; j <- CORR_COLS.indices if i <= j
    } yield (i, j)
    // per-row integer units: singles in 1e2-units, products in 1e4-units
    val unitCols: Seq[Column] =
      CORR_COLS.zipWithIndex.map { case (c, i) =>
        floor(col(c) * lit(1e2) + lit(0.5)).cast("long").as(s"v$i")
      } ++ pairs.map { case (i, j) =>
        floor(col(CORR_COLS(i)) * col(CORR_COLS(j)) * lit(1e4) + lit(0.5))
          .cast("long").as(s"v${i}_$j")
      }
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        CORR_COLS.indices.map(i => sum(col(s"v$i")).as(s"u$i")) ++
        pairs.flatMap { case (i, j) =>
          Seq(sum(shiftrightunsigned(col(s"v${i}_$j"), 20)).as(s"h${i}_$j"),
            sum(col(s"v${i}_$j").bitwiseAND(lit(1048575L))).as(s"l${i}_$j"))
        }
    val m = Tables(spark, dir).lineitem
      .select(unitCols: _*)
      .agg(aggs.head, aggs.tail: _*)
    def s1(i: Int): Column = col(s"u$i").cast("double") / lit(1e2)
    def s2(i: Int, j: Int): Column =
      (col(s"h${i}_$j").cast("double") * lit(1048576.0) +
        col(s"l${i}_$j").cast("double")) / lit(1e4)
    val entries = pairs.filter { case (i, j) => i < j }.map { case (i, j) =>
      struct(
        lit(CORR_COLS(i)).as("col_a"), lit(CORR_COLS(j)).as("col_b"),
        floor((col("n") * s2(i, j) - s1(i) * s1(j)) /
          (sqrt(col("n") * s2(i, i) - s1(i) * s1(i)) *
            sqrt(col("n") * s2(j, j) - s1(j) * s1(j)))
          * lit(1e6) + lit(0.5)).cast("long").as("corr_micro"))
    }
    m.select(col("n"), explode(array(entries: _*)).as("e"))
      .select(col("e.col_a").as("col_a"), col("e.col_b").as("col_b"),
        col("n"), col("e.corr_micro").as("corr_micro"))
  }

  val q121Sql: String = {
    val units =
      CORR_COLS.zipWithIndex.map { case (c, i) =>
        s"CAST(floor($c * 1e2 + 0.5) AS BIGINT) AS v$i"
      } ++ (for {
        i <- CORR_COLS.indices; j <- CORR_COLS.indices if i <= j
      } yield s"CAST(floor(${CORR_COLS(i)} * ${CORR_COLS(j)} * 1e4 + 0.5) AS BIGINT) AS v${i}_$j")
    val sums =
      CORR_COLS.indices.map(i => s"CAST(sum(v$i) AS BIGINT) AS u$i") ++
        (for {
          i <- CORR_COLS.indices; j <- CORR_COLS.indices if i <= j
        } yield
          s"CAST(sum(v${i}_$j >> 20) AS BIGINT) AS h${i}_$j, " +
            s"CAST(sum(v${i}_$j & 1048575) AS BIGINT) AS l${i}_$j")
    def s1(i: Int) = s"(CAST(u$i AS DOUBLE) / 1e2)"
    def s2(i: Int, j: Int) =
      s"((CAST(h${i}_$j AS DOUBLE) * 1048576.0 + CAST(l${i}_$j AS DOUBLE)) / 1e4)"
    val rows = (for {
      i <- CORR_COLS.indices; j <- CORR_COLS.indices if i < j
    } yield
      s"""SELECT '${CORR_COLS(i)}' AS col_a, '${CORR_COLS(j)}' AS col_b, n,
         |  CAST(floor((n*${s2(i, j)} - ${s1(i)}*${s1(j)})
         |    / (sqrt(n*${s2(i, i)} - ${s1(i)}*${s1(i)}) * sqrt(n*${s2(j, j)} - ${s1(j)}*${s1(j)}))
         |    * 1e6 + 0.5) AS BIGINT) AS corr_micro FROM m""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    s"""WITH v AS (
      |  SELECT ${units.mkString(",\n    ")}
      |  FROM lineitem),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    ${sums.mkString(",\n    ")}
      |  FROM v)
      |SELECT * FROM (
      |  $rows)
      |ORDER BY col_a, col_b""".stripMargin
  }

  /** q123: ZIPF SLOPE of the corpus token-frequency law — least-squares
    * fit of ln(freq) against ln(rank) over the ranked vocabulary (the
    * rank-frequency diagnostic a corpus-quality report leads with; a
    * healthy natural-language corpus sits near slope -1). The corpus
    * collapses to the vocabulary-sized count table in one map-side-
    * combined pass; ranking uses GlobalRank (distributed range-
    * partitioned row_number — NO one-task global window, the vocabulary
    * of a 100 TB corpus is itself large); the regression reduces the
    * ranked table with integer micro-nat sums exactly like q97's mass-
    * function fit.
    */
  def q123ZipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables(spark, dir).documents
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val ranked = graft.operators.GlobalRank
      .withRowNumber(vocab, "rank", col("n").desc, col("tok"))
      .select(
        floor(log(col("rank").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("x"),
        floor(log(col("n").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("y"))
    ranked.agg(
      count(lit(1)).as("n_vocab"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col("n_vocab"),
        floor((col("n_vocab") * col("sxy") - col("sx") * col("sy")) /
          (col("n_vocab") * col("sxx") - col("sx") * col("sx"))
          * lit(1e6) + lit(0.5)).cast("long").as("slope_micro"),
        floor((col("sy") -
          (col("n_vocab") * col("sxy") - col("sx") * col("sy")) /
            (col("n_vocab") * col("sxx") - col("sx") * col("sx")) * col("sx"))
          / col("n_vocab") + lit(0.5)).cast("long").as("intercept_micro"))
  }

  val q123Sql: String =
    """WITH t AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
      |r AS (
      |  SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank FROM v),
      |xy AS (
      |  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
      |         CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
      |  FROM r),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
      |  FROM xy)
      |SELECT m AS n_vocab,
      |  CAST(floor((m*sxy - sx*sy) / (m*sxx - sx*sx) * 1e6 + 0.5) AS BIGINT)
      |    AS slope_micro,
      |  CAST(floor((sy - (m*sxy - sx*sy) / (m*sxx - sx*sx) * sx) / m + 0.5)
      |    AS BIGINT) AS intercept_micro
      |FROM s""".stripMargin

  /** q125 release policy: cells below K_ANON are suppressed outright;
    * released counts carry Laplace(DP_B) noise.
    */
  val K_ANON = 5L
  val DP_B = 10.0

  /** q125: PRIVACY-PRESERVING RELEASE — the (event_type, day) usage
    * rollup prepared for EXTERNAL publication: cells smaller than
    * K_ANON are suppressed (k-anonymity), surviving counts carry
    * Laplace noise via the inverse CDF over a SEEDED md5 uniform.
    * Deterministic noise per cell is deliberate and production-real:
    * re-releasing the same cell must yield the SAME noisy value, or an
    * observer averages repeated releases and cancels the noise. The
    * noise addition runs on the |types x days| rollup, never the log;
    * one shuffle (the rollup's own), everything after is scan-stage.
    * Noise is quantized to integers (counts stay counts), with the
    * ln/sign arithmetic on bit-identical doubles in both engines.
    */
  def q125PrivateRelease(spark: SparkSession, dir: String): DataFrame = {
    val rollup = Tables(spark, dir).events
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val u = (conv(substring(
      md5(concat(lit("dp:"), col("event_type"), lit(":"), col("day"))), 1, 6),
      16, 10).cast("double") + lit(0.5)) / lit(16777216.0)
    val lap = when(u < 0.5, lit(DP_B) * log(lit(2.0) * u))
      .otherwise(-lit(DP_B) * log(lit(2.0) * (lit(1.0) - u)))
    rollup
      .filter(col("n") >= K_ANON)
      .select(col("event_type"), col("day"),
        (col("n") + floor(lap + lit(0.5)).cast("long")).as("noisy_count"))
  }

  val q125Sql: String =
    s"""WITH r AS (
      |  SELECT event_type,
      |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT *,
      |    (CAST('0x' || substr(md5('dp:' || event_type || ':' || day), 1, 6)
      |       AS BIGINT) + 0.5) / 16777216.0 AS u
      |  FROM r)
      |SELECT event_type, day,
      |  n + CAST(floor(
      |    CASE WHEN u < 0.5 THEN $DP_B * ln(2.0 * u)
      |         ELSE -$DP_B * ln(2.0 * (1.0 - u)) END + 0.5) AS BIGINT)
      |    AS noisy_count
      |FROM w WHERE n >= $K_ANON
      |ORDER BY event_type, day""".stripMargin

  /** q409 randomized-response coin probabilities, in percent: with
    * probability RR_TRUTH_PCT the respondent answers truthfully,
    * otherwise a second coin forces "yes" with RR_YES_PCT. Warner's
    * classic local-DP mechanism at p=q=1/2.
    */
  val RR_TRUTH_PCT = 50L
  val RR_YES_PCT = 50L

  /** q409: RANDOMIZED RESPONSE — the LOCAL privacy mechanism
    * complementing q125's central one (there the curator adds Laplace
    * noise to a trusted rollup; here each USER's bit is perturbed
    * before aggregation, so the collector never holds a truthful
    * row). Each user's binary attribute (ever purchased) passes
    * through Warner's mechanism — truth with probability p, else a
    * forced coin — and the population rate is recovered by the
    * standard debias π̂ = (ŷ − (1−p)·q)/p. The fixture logs the truth,
    * so the gate reports BOTH the debiased estimate and its signed
    * error against the true rate — a measured calibration check.
    *
    * Coins are md5-derived per user (the q125/q25 convention):
    * deterministic coins make the mechanism oracle-replayable — in
    * production local DP the coin is true client randomness; what this
    * operator exercises is the aggregation-side debias arithmetic,
    * which is identical either way. One per-user rollup (map-side
    * combined), one 1-row aggregate; everything else is scan-stage.
    */
  def q409RandomizedResponse(spark: SparkSession, dir: String): DataFrame = {
    def coin(salt: String): Column =
      pmod(conv(substring(
        md5(concat(lit(salt), col("user_id").cast("string"))), 1, 6),
        16, 10).cast("long"), lit(100L))
    val truth = Tables(spark, dir).events
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("t"))
    val reported = truth.select(col("t"),
      when(coin("rr1:") < RR_TRUTH_PCT, col("t"))
        .otherwise(when(coin("rr2:") < RR_YES_PCT, 1L).otherwise(0L))
        .as("r"))
    def d(c: Column) = c.cast("double")
    val agg = reported.agg(count(lit(1)).as("n_users"),
      sum("t").as("n_true"), sum("r").as("n_yes"))
    val p = RR_TRUTH_PCT / 100.0
    val q = RR_YES_PCT / 100.0
    val piHat = (d(col("n_yes")) / d(col("n_users")) - lit((1.0 - p) * q)) /
      lit(p)
    agg.select(col("n_users"), col("n_true"), col("n_yes"),
      floor(piHat * lit(1e6) + lit(0.5)).cast("long").as("pi_hat_micro"),
      floor((piHat - d(col("n_true")) / d(col("n_users"))) * lit(1e6) +
        lit(0.5)).cast("long").as("err_micro"))
  }

  val q409Sql: String = {
    val p = RR_TRUTH_PCT / 100.0
    val q = RR_YES_PCT / 100.0
    s"""WITH truth AS (
      |  SELECT user_id,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS t
      |  FROM events GROUP BY 1),
      |rep AS (
      |  SELECT t,
      |    CASE WHEN CAST('0x' || substr(md5('rr1:' || CAST(user_id AS VARCHAR)), 1, 6)
      |               AS BIGINT) % 100 < $RR_TRUTH_PCT THEN t
      |         WHEN CAST('0x' || substr(md5('rr2:' || CAST(user_id AS VARCHAR)), 1, 6)
      |               AS BIGINT) % 100 < $RR_YES_PCT THEN 1
      |         ELSE 0 END AS r
      |  FROM truth),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(t) AS BIGINT) AS n_true,
      |    CAST(sum(r) AS BIGINT) AS n_yes
      |  FROM rep)
      |SELECT n_users, n_true, n_yes,
      |  CAST(floor((CAST(n_yes AS DOUBLE) / CAST(n_users AS DOUBLE)
      |    - ${(1.0 - p) * q}) / $p * 1e6 + 0.5) AS BIGINT) AS pi_hat_micro,
      |  CAST(floor(((CAST(n_yes AS DOUBLE) / CAST(n_users AS DOUBLE)
      |    - ${(1.0 - p) * q}) / $p
      |    - CAST(n_true AS DOUBLE) / CAST(n_users AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS err_micro
      |FROM a""".stripMargin
  }

  /** q279 quasi-identifier coarsening: account-balance band width. */
  val ANON_BAND = 2000.0

  /** q279: K-ANONYMITY AUDIT — the privacy review that PRECEDES q125's
    * release policy: how identifiable is each nation's customer
    * population under the quasi-identifier (nation, market segment,
    * coarse balance band)? Reports, per nation, the population, the
    * number of QI cells, the smallest cell, and the rows/cells that
    * violate k = [[K_ANON]] — the exact numbers a privacy officer uses
    * to choose suppression vs wider banding before any data leaves.
    *
    * Scale shape: two cascaded partial aggregations — the QI rollup
    * shuffles |cells| map-side-combined partials (bounded by the QI
    * domain, not the table), and the per-nation report aggregates the
    * tiny cell table. Zero row-level work after the first combine;
    * integer counts end-to-end, nothing for engines to disagree on.
    */
  def q279KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir).customer
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / ANON_BAND).as("band"))
      .agg(count(lit(1)).as("sz"))
    cells.groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(sum("sz").as("n_rows"),
        count(lit(1)).as("n_cells"),
        min("sz").as("min_cell"),
        sum(when(col("sz") < K_ANON, col("sz")).otherwise(0L)).as("n_risk_rows"),
        sum(when(col("sz") < K_ANON, 1L).otherwise(0L)).as("n_risk_cells"))
  }

  val q279Sql: String =
    s"""WITH cells AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    floor(c_acctbal / $ANON_BAND) AS band, count(*) AS sz
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |  CAST(sum(sz) AS BIGINT) AS n_rows,
      |  count(*) AS n_cells,
      |  min(sz) AS min_cell,
      |  CAST(sum(CASE WHEN sz < $K_ANON THEN sz ELSE 0 END) AS BIGINT)
      |    AS n_risk_rows,
      |  CAST(sum(CASE WHEN sz < $K_ANON THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_risk_cells
      |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin

  /** q299 diversity floor: QI cells whose sensitive attribute takes
    * fewer than this many distinct values are flagged. */
  val L_DIV = 3L

  /** q299: L-DIVERSITY AUDIT — k-anonymity's (q279) necessary
    * complement: a cell can hold k rows and still leak if they all
    * share one sensitive value (the homogeneity attack). Under the
    * same QI (nation, market segment) with the coarse balance band as
    * the SENSITIVE attribute, reports each cell's population, its
    * distinct-sensitive-value count l, the size of its largest
    * sensitive class (the homogeneity mass), and the l < [[L_DIV]]
    * violation flag.
    *
    * Scale shape: one (QI, sensitive)-grained partial aggregation
    * bounded by the QI×sensitive domain, then a |cells|-bounded
    * rollup — exact distinct via the second grouping level, no
    * count(distinct) expansion over fact rows, integer counts
    * end-to-end.
    */
  def q299LDiversity(spark: SparkSession, dir: String): DataFrame = {
    val fine = Tables(spark, dir).customer
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / ANON_BAND).as("band"))
      .agg(count(lit(1)).as("sz"))
    fine.groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(sum("sz").as("n_rows"),
        count(lit(1)).as("l_div"),
        max("sz").as("max_class"),
        (count(lit(1)) < L_DIV).as("violates"))
  }

  val q299Sql: String =
    s"""WITH fine AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    floor(c_acctbal / $ANON_BAND) AS band, count(*) AS sz
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |  c_mktsegment AS segment,
      |  CAST(sum(sz) AS BIGINT) AS n_rows,
      |  count(*) AS l_div,
      |  max(sz) AS max_class,
      |  count(*) < $L_DIV AS violates
      |FROM fine GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q301 analysis window: epoch days [1995-01-01, 1997-01-01) — the
    * trend test runs on a FIXED calendar window so the pair set is
    * bounded by window² regardless of data volume. */
  val MK_DAY_LO = 9131L
  val MK_DAY_HI = 9862L

  /** q301: MANN–KENDALL TREND TEST + THEIL–SEN SLOPE per order
    * priority — the standard NON-PARAMETRIC trend pair for monitoring
    * series (robust to outliers and any monotone transform, unlike
    * q226's least-squares slope): S = Σ sign(v_j − v_i) over all day
    * pairs i<j, and the Theil–Sen estimate = median of the pairwise
    * slopes.
    *
    * Exactness: daily revenue is integer cents; S and the pair count
    * are BIGINTs; each pairwise slope is ONE IEEE division of exact
    * integers; the median is the same interpolated percentile both
    * engines evaluate identically (§5). trend = sign(S), integer.
    *
    * Scale shape: the fact table collapses to the |days|-bounded daily
    * series FIRST (one map-side-combined aggregate); the pair
    * self-join is bounded by the FIXED analysis window (|W|² pairs per
    * group, calendar-bounded — it does not grow with data volume), so
    * at 100 TB the only fact-sized work is the first rollup.
    */
  def q301TrendTest(spark: SparkSession, dir: String): DataFrame = {
    // round 10: pin the |days|-bounded daily series — both self-join
    // sides read it, and unpinned each side re-ran the fact-table
    // rollup (guide §1.2: the only fact-sized work should happen once)
    val daily = Tables(spark, dir).orders
      .select(col("o_orderpriority").as("prio"),
        expr("unix_micros(o_orderdate) div 86400000000").as("day"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v_c"))
      .filter(col("day") >= MK_DAY_LO && col("day") < MK_DAY_HI)
      .groupBy("prio", "day").agg(sum("v_c").as("rev_c"))
      .localCheckpoint(true)
    val a = daily.select(col("prio"), col("day").as("d1"), col("rev_c").as("v1"))
    val b = daily.select(col("prio"), col("day").as("d2"), col("rev_c").as("v2"))
    a.join(b, Seq("prio")).filter(col("d1") < col("d2"))
      .select(col("prio"),
        signum(col("v2") - col("v1")).cast("long").as("sgn"),
        ((col("v2") - col("v1")).cast("double") /
          ((col("d2") - col("d1")) * lit(100.0d))).as("slope"))
      .groupBy("prio")
      .agg(count(lit(1)).as("n_pairs"),
        sum("sgn").as("s_stat"),
        expr("percentile(slope, 0.5)").as("sen_slope"),
        signum(sum("sgn")).cast("long").as("trend"))
  }

  val q301Sql: String =
    s"""WITH daily AS (
      |  SELECT o_orderpriority AS prio,
      |    epoch_us(o_orderdate) // 86400000000 AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev_c
      |  FROM orders
      |  WHERE epoch_us(o_orderdate) // 86400000000 >= $MK_DAY_LO
      |    AND epoch_us(o_orderdate) // 86400000000 < $MK_DAY_HI
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.prio,
      |    CAST(sign(b.rev_c - a.rev_c) AS BIGINT) AS sgn,
      |    CAST(b.rev_c - a.rev_c AS DOUBLE) / ((b.day - a.day) * 100.0)
      |      AS slope
      |  FROM daily a JOIN daily b
      |    ON a.prio = b.prio AND a.day < b.day)
      |SELECT prio, count(*) AS n_pairs,
      |  CAST(sum(sgn) AS BIGINT) AS s_stat,
      |  quantile_cont(slope, 0.5) AS sen_slope,
      |  CAST(sign(sum(sgn)) AS BIGINT) AS trend
      |FROM pairs GROUP BY prio ORDER BY prio""".stripMargin

  /** q128 model: fixed weights over [bias, l_quantity, l_discount]. */
  val LOGREG_W: Seq[Double] = Seq(0.1, -0.02, 0.5)

  /** q128: LOGISTIC-REGRESSION GRADIENT STEP — one full-batch gradient
    * (and log-loss) of a logistic model predicting returns
    * (l_returnflag = 'R') from [bias, quantity, discount] at fixed
    * weights: the distributed inner loop of any GLM trainer (the
    * model-side counterpart of q69's k-means step). Everything is ONE
    * map-side-combined aggregate: per-row sigmoid + per-dimension
    * gradient terms quantized to integer micro-units (exp/ln on
    * bit-identical doubles), summed exactly, and the 1-row result
    * exploded to a per-dimension gradient table. No shuffle beyond the
    * single aggregate — at 100 TB a training iteration costs one scan.
    */
  def q128LogregStep(spark: SparkSession, dir: String): DataFrame = {
    val xs: Seq[Column] =
      Seq(lit(1.0), col("l_quantity"), col("l_discount"))
    val z = LOGREG_W.zip(xs).map { case (w, x) => lit(w) * x }
      .reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val y = when(col("l_returnflag") === "R", lit(1.0)).otherwise(lit(0.0))
    val gradTerms = xs.zipWithIndex.map { case (x, j) =>
      sum(floor((p - y) * x * lit(1e6) + lit(0.5)).cast("long")).as(s"g$j")
    }
    val lossTerm = sum(floor(
      -(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p)) * lit(1e6) + lit(0.5))
      .cast("long")).as("loss")
    val aggs = Seq(count(lit(1)).as("n")) ++ gradTerms :+ lossTerm
    val m = Tables(spark, dir).lineitem
      .select("l_quantity", "l_discount", "l_returnflag")
      .agg(aggs.head, aggs.tail: _*)
    val entries = LOGREG_W.indices.map { j =>
      struct(lit(j).as("dim"), col(s"g$j").as("grad_micro"))
    }
    m.select(col("n"), col("loss").as("loss_micro"),
        explode(array(entries: _*)).as("e"))
      .select(col("e.dim").as("dim"), col("e.grad_micro").as("grad_micro"),
        col("n"), col("loss_micro"))
  }

  val q128Sql: String = {
    val xsSql = Seq("1.0", "l_quantity", "l_discount")
    val z = LOGREG_W.zip(xsSql).map { case (w, x) => s"$w * $x" }.mkString(" + ")
    val gradDefs = xsSql.zipWithIndex.map { case (x, j) =>
      s"CAST(sum(CAST(floor((p - y) * $x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g$j"
    }.mkString(",\n    ")
    val rows = LOGREG_W.indices.map(j =>
      s"SELECT $j AS dim, g$j AS grad_micro, n, loss_micro FROM m")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
      |  SELECT l_quantity, l_discount,
      |    1.0 / (1.0 + exp(-($z))) AS p,
      |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    $gradDefs,
      |    CAST(sum(CAST(floor(-(y * ln(p) + (1.0 - y) * ln(1.0 - p)) * 1e6 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS loss_micro
      |  FROM e)
      |SELECT * FROM (
      |  $rows)
      |ORDER BY dim""".stripMargin
  }

  /** q134 drift bins: fixed literal value-bin edges (a production
    * monitor pins bins from the training snapshot, not the live data).
    */
  val PSI_EDGES: Seq[Double] = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0)

  /** q134: DISTRIBUTION DRIFT (PSI) — the population-stability-index
    * monitor an ML platform runs between a reference window and a live
    * window: the event `value` distribution before vs after the q66
    * cutoff, over fixed bins, with the per-bin PSI term
    * (p_live - p_ref) * ln(p_live / p_ref) in integer micro-nats.
    * Both windows' bin counts come from ONE gated conditional
    * aggregate over the log (the q66/q126/q132 trick), the PSI math
    * runs on the |bins|-sized rollup, and Laplace-style +1 smoothing
    * keeps empty bins finite in both engines identically. Output is
    * per-bin terms plus the headline index as bin -1 — one scan, one
    * |bins| shuffle.
    */
  def q134PsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(graft.queries.SessionOps.DIFF_CUTOFF).cast("timestamp")
    val bin = PSI_EDGES.foldRight(lit(PSI_EDGES.length): Column) {
      case (edge, acc) => when(col("value") < edge, PSI_EDGES.indexOf(edge)).otherwise(acc)
    }
    val counts = Tables(spark, dir).events
      .select(bin.as("bin"), col("ts"))
      .groupBy("bin")
      .agg(sum(when(col("ts") < cutoff, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("ts") >= cutoff, 1L).otherwise(0L)).as("n_live"))
    val tot = counts.agg(sum("n_ref").as("t_ref"), sum("n_live").as("t_live"))
    val k = PSI_EDGES.length + 1
    val perBin = counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_live"),
        floor((
          (col("n_live") + lit(1.0)) / (col("t_live") + lit(k.toDouble)) -
            (col("n_ref") + lit(1.0)) / (col("t_ref") + lit(k.toDouble))) *
          log(((col("n_live") + lit(1.0)) / (col("t_live") + lit(k.toDouble))) /
            ((col("n_ref") + lit(1.0)) / (col("t_ref") + lit(k.toDouble)))) *
          lit(1e6) + lit(0.5)).cast("long").as("psi_micro"))
    val total = perBin.agg(
      lit(-1).as("bin"), sum("n_ref").as("n_ref"), sum("n_live").as("n_live"),
      sum("psi_micro").as("psi_micro"))
    perBin.unionByName(total)
  }

  val q134Sql: String = {
    val k = PSI_EDGES.length + 1
    val binExpr = PSI_EDGES.zipWithIndex.reverse
      .foldLeft(s"${PSI_EDGES.length}") { case (acc, (e, i)) =>
        s"CASE WHEN value < $e THEN $i ELSE $acc END"
      }
    val cut = s"TIMESTAMP '${graft.queries.SessionOps.DIFF_CUTOFF}'"
    s"""WITH b AS (
      |  SELECT $binExpr AS bin, ts FROM events),
      |c AS (
      |  SELECT bin,
      |    CAST(sum(CASE WHEN ts < $cut THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(sum(CASE WHEN ts >= $cut THEN 1 ELSE 0 END) AS BIGINT) AS n_live
      |  FROM b GROUP BY bin),
      |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
      |             CAST(sum(n_live) AS BIGINT) AS t_live FROM c),
      |p AS (
      |  SELECT bin, n_ref, n_live,
      |    CAST(floor((
      |      (n_live + 1.0) / (t_live + $k.0) - (n_ref + 1.0) / (t_ref + $k.0)) *
      |      ln(((n_live + 1.0) / (t_live + $k.0)) /
      |         ((n_ref + 1.0) / (t_ref + $k.0))) * 1e6 + 0.5) AS BIGINT)
      |      AS psi_micro
      |  FROM c CROSS JOIN t)
      |SELECT * FROM p
      |UNION ALL
      |SELECT -1 AS bin, CAST(sum(n_ref) AS BIGINT), CAST(sum(n_live) AS BIGINT),
      |  CAST(sum(psi_micro) AS BIGINT) FROM p
      |ORDER BY bin""".stripMargin
  }

  /** q135 calibration bin count over the q128 model's probabilities. */
  val CALIB_BINS = 10

  /** q135: MODEL CALIBRATION BINS — reliability-diagram data for the
    * q128 logistic model: rows bucketed by predicted probability,
    * per-bucket observed positive rate vs mean predicted probability
    * (micro-quantized exact sums) — the monitoring table every scoring
    * pipeline emits next to its predictions. One scan, one
    * map-side-combined |bins| aggregate; the sigmoid is computed
    * per-row in the scan stage exactly as q128 computes it.
    */
  def q135CalibrationBins(spark: SparkSession, dir: String): DataFrame = {
    val xs: Seq[Column] = Seq(lit(1.0), col("l_quantity"), col("l_discount"))
    val z = LOGREG_W.zip(xs).map { case (w, x) => lit(w) * x }.reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val y = when(col("l_returnflag") === "R", lit(1.0)).otherwise(lit(0.0))
    Tables(spark, dir).lineitem
      .select("l_quantity", "l_discount", "l_returnflag")
      .select(least(floor(p * CALIB_BINS).cast("long"), lit(CALIB_BINS - 1L))
          .as("bin"),
        floor(p * lit(1e6) + lit(0.5)).cast("long").as("p_micro"),
        y.cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum("y").as("n_pos"),
        sum("p_micro").as("sum_p_micro"))
      .select(col("bin"), col("n"), col("n_pos"),
        // integer floor division in BOTH engines — a double quotient
        // cast could round across the integer boundary
        expr("sum_p_micro div n").as("mean_p_micro"),
        floor(col("n_pos") * lit(1e6) / col("n") + lit(0.5)).cast("long")
          .as("pos_rate_micro"))
  }

  val q135Sql: String = {
    val z = LOGREG_W.zip(Seq("1.0", "l_quantity", "l_discount"))
      .map { case (w, x) => s"$w * $x" }.mkString(" + ")
    s"""WITH e AS (
      |  SELECT 1.0 / (1.0 + exp(-($z))) AS p,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |b AS (
      |  SELECT least(CAST(floor(p * $CALIB_BINS) AS BIGINT), ${CALIB_BINS - 1}) AS bin,
      |    CAST(floor(p * 1e6 + 0.5) AS BIGINT) AS p_micro, y
      |  FROM e)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(y) AS BIGINT) AS n_pos,
      |  CAST(sum(p_micro) // count(*) AS BIGINT) AS mean_p_micro,
      |  CAST(floor(sum(y) * 1e6 / count(*) + 0.5) AS BIGINT) AS pos_rate_micro
      |FROM b GROUP BY bin
      |ORDER BY bin""".stripMargin
  }

  /** Shared q128-model scoring: per-row (p_micro, y) — the sigmoid is
    * computed exactly as q128 computes it, quantized to integer micro
    * units so every downstream comparison (rank ties in q136, threshold
    * cuts in q137) is an integer compare, bit-equal in both engines.
    */
  private def scoredRows(spark: SparkSession, dir: String): DataFrame = {
    val xs: Seq[Column] = Seq(lit(1.0), col("l_quantity"), col("l_discount"))
    val z = LOGREG_W.zip(xs).map { case (w, x) => lit(w) * x }.reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    Tables(spark, dir).lineitem
      .select("l_quantity", "l_discount", "l_returnflag")
      .select(floor(p * lit(1e6) + lit(0.5)).cast("long").as("p_micro"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
  }

  private val scoredSql: String = {
    val z = LOGREG_W.zip(Seq("1.0", "l_quantity", "l_discount"))
      .map { case (w, x) => s"$w * $x" }.mkString(" + ")
    s"""SELECT CAST(floor(1.0 / (1.0 + exp(-($z))) * 1e6 + 0.5) AS BIGINT)
      |    AS p_micro,
      |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |FROM lineitem""".stripMargin
  }

  /** q136: ROC AUC via the MANN–WHITNEY RANK-SUM — the
    * threshold-independent quality number for the q128 model, computed
    * WITHOUT materializing per-row global ranks: the log collapses to
    * the |distinct scores| group table (c, pos per score), tie-aware
    * average ranks come from a distributed exclusive running count
    * (GlobalRank.withRunningSum — no one-task ORDER-BY window; rank2 =
    * 2*cum_before + c + 1 keeps the half-rank in integers), and
    * AUC = (sum(pos*rank2) - np*(np+1)) / (2*np*nn). At 100 TB the only
    * per-row work is the score rollup's map-side combine; everything
    * ordered is vocabulary-of-scores-sized. Ties are exact, not
    * approximated — the textbook U-statistic with midranks.
    */
  def q136RocAuc(spark: SparkSession, dir: String): DataFrame = {
    val groups = scoredRows(spark, dir)
      .groupBy("p_micro")
      .agg(count(lit(1)).as("c"), sum("y").as("pos"))
    val cum = graft.operators.GlobalRank
      .withRunningSum(groups, "cum", col("c"), col("p_micro"))
    cum.agg(
      sum(col("pos") * (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L)))
        .as("sr2"),
      sum("pos").as("np"),
      sum(col("c") - col("pos")).as("nn"))
      .select((col("np") + col("nn")).as("n"),
        col("np").as("n_pos"), col("nn").as("n_neg"),
        floor((col("sr2").cast("double") -
            col("np").cast("double") * (col("np") + lit(1L)).cast("double")) /
          (lit(2.0) * col("np").cast("double") * col("nn").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("auc_micro"))
  }

  val q136Sql: String =
    s"""WITH e AS (
      |  $scoredSql),
      |g AS (
      |  SELECT p_micro, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(y) AS BIGINT) AS pos
      |  FROM e GROUP BY 1),
      |w AS (
      |  SELECT pos, c,
      |    CAST(sum(c) OVER (ORDER BY p_micro
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM g),
      |s AS (
      |  SELECT CAST(sum(pos * (2 * (cum - c) + c + 1)) AS BIGINT) AS sr2,
      |    CAST(sum(pos) AS BIGINT) AS np, CAST(sum(c - pos) AS BIGINT) AS nn
      |  FROM w)
      |SELECT np + nn AS n, np AS n_pos, nn AS n_neg,
      |  CAST(floor((CAST(sr2 AS DOUBLE) -
      |      CAST(np AS DOUBLE) * CAST(np + 1 AS DOUBLE)) /
      |    (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS auc_micro
      |FROM s""".stripMargin

  /** q137 operating points, in probability micro-units (the q128
    * model's scores live in ~[0.29, 0.53] on this data).
    */
  val PR_THRESHOLDS: Seq[Long] = 300000L to 520000L by 20000L

  /** q137: PRECISION/RECALL THRESHOLD SWEEP — the operating-point table
    * behind a PR curve: TP/FP at every threshold from ONE gated
    * conditional aggregate over the scored log (|T| integer sums — the
    * q121/q128 single-pass idiom, NO per-threshold scan, NO |T|-fold
    * row fanout), then the 1-row result explodes to per-threshold
    * precision / recall / F1 rows. Threshold cuts compare integer
    * micro-units, so bucket membership is bit-equal in both engines.
    * At 100 TB the sweep costs exactly one scan regardless of |T|.
    */
  def q137PrThresholds(spark: SparkSession, dir: String): DataFrame = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"), sum("y").as("np")) ++
        PR_THRESHOLDS.zipWithIndex.flatMap { case (t, i) =>
          Seq(
            sum(when(col("p_micro") >= t && col("y") === 1L, 1L).otherwise(0L))
              .as(s"tp$i"),
            sum(when(col("p_micro") >= t && col("y") === 0L, 1L).otherwise(0L))
              .as(s"fp$i"))
        }
    val m = scoredRows(spark, dir).agg(aggs.head, aggs.tail: _*)
    val entries = PR_THRESHOLDS.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold_micro"),
        col(s"tp$i").as("tp"), col(s"fp$i").as("fp"))
    }
    m.select(col("np"), explode(array(entries: _*)).as("e"))
      .select(col("e.threshold_micro").as("threshold_micro"),
        col("e.tp").as("tp"), col("e.fp").as("fp"),
        (col("np") - col("e.tp")).as("fn"),
        when(col("e.tp") + col("e.fp") === 0L, -1L)
          .otherwise(floor(col("e.tp") * lit(1e6) / (col("e.tp") + col("e.fp"))
            + lit(0.5)).cast("long")).as("precision_micro"),
        floor(col("e.tp") * lit(1e6) / col("np") + lit(0.5)).cast("long")
          .as("recall_micro"),
        when(col("e.tp") + col("e.fp") + col("np") === 0L, -1L)
          .otherwise(floor(lit(2.0) * col("e.tp") * lit(1e6) /
            (col("e.tp") + col("e.fp") + col("np")) + lit(0.5)).cast("long"))
          .as("f1_micro"))
  }

  val q137Sql: String = {
    val tpDefs = PR_THRESHOLDS.zipWithIndex.map { case (t, i) =>
      s"""CAST(sum(CASE WHEN p_micro >= $t AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp$i,
         |    CAST(sum(CASE WHEN p_micro >= $t AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp$i""".stripMargin
    }.mkString(",\n    ")
    val rows = PR_THRESHOLDS.zipWithIndex.map { case (t, i) =>
      s"SELECT $t AS threshold_micro, tp$i AS tp, fp$i AS fp, np FROM m"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
      |  $scoredSql),
      |m AS (
      |  SELECT CAST(sum(y) AS BIGINT) AS np,
      |    $tpDefs
      |  FROM e),
      |t AS (
      |  $rows)
      |SELECT threshold_micro, tp, fp, np - tp AS fn,
      |  CASE WHEN tp + fp = 0 THEN -1
      |       ELSE CAST(floor(tp * 1e6 / (tp + fp) + 0.5) AS BIGINT) END
      |    AS precision_micro,
      |  CAST(floor(tp * 1e6 / np + 0.5) AS BIGINT) AS recall_micro,
      |  CASE WHEN tp + fp + np = 0 THEN -1
      |       ELSE CAST(floor(2.0 * tp * 1e6 / (tp + fp + np) + 0.5) AS BIGINT) END
      |    AS f1_micro
      |FROM t
      |ORDER BY threshold_micro""".stripMargin
  }

  /** q141: MUTUAL INFORMATION between event type and weekday-bucket —
    * the feature-selection score (information gain) an ML platform
    * computes between a candidate feature and a label. The log
    * collapses to the |types x 7| contingency table in one map-side-
    * combined pass; marginals are PARTITIONED window sums over that
    * rollup (and the grand total a 1-row broadcast), so nothing beyond
    * the rollup is ever shuffled. Per-cell terms
    * p(x,y) * ln(p(x,y) / (p(x) p(y))) are quantized to integer
    * NANO-nats (the terms are small; micro would lose them), and the
    * headline MI is their exact fold, emitted as the (type='__all',
    * wd=-1) row. The weekday bucket is epoch-days mod 7 — pure integer
    * arithmetic, identical in both engines (no locale-sensitive
    * dayofweek).
    */
  def q141MutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables(spark, dir).events
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("wd"))
      .groupBy("event_type", "wd")
      .agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum("c").as("n"))
    val withMarg = cells
      .withColumn("rx", sum("c").over(Window.partitionBy("event_type")))
      .withColumn("cy", sum("c").over(Window.partitionBy("wd")))
      .crossJoin(broadcast(tot))
    val perCell = withMarg.select(
      col("event_type"), col("wd"), col("c"),
      floor((col("c").cast("double") / col("n").cast("double")) *
        log((col("c").cast("double") * col("n").cast("double")) /
          (col("rx").cast("double") * col("cy").cast("double"))) *
        lit(1e9) + lit(0.5)).cast("long").as("mi_nano"))
    val total = perCell.agg(
      lit("__all").as("event_type"), lit(-1L).as("wd"),
      sum("c").as("c"), sum("mi_nano").as("mi_nano"))
    perCell.unionByName(total)
  }

  val q141Sql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    (CAST(epoch_us(ts) AS BIGINT) // 86400000000) % 7 AS wd
      |  FROM events),
      |c AS (
      |  SELECT event_type, wd, CAST(count(*) AS BIGINT) AS c
      |  FROM b GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, wd, c,
      |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS rx,
      |    CAST(sum(c) OVER (PARTITION BY wd) AS BIGINT) AS cy,
      |    (SELECT CAST(sum(c) AS BIGINT) FROM c) AS n
      |  FROM c),
      |p AS (
      |  SELECT event_type, wd, c,
      |    CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) /
      |         (CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE))) * 1e9 + 0.5)
      |      AS BIGINT) AS mi_nano
      |  FROM m)
      |SELECT * FROM p
      |UNION ALL
      |SELECT '__all' AS event_type, -1 AS wd, CAST(sum(c) AS BIGINT),
      |  CAST(sum(mi_nano) AS BIGINT) FROM p
      |ORDER BY event_type, wd""".stripMargin

  /** q142: GINI CONCENTRATION of customer spend — the inequality
    * number behind "what share of revenue do the top customers hold"
    * (and, swapped onto token counts per source, the corpus-balance
    * diagnostic of a training mix). Spend is exact integer cents; the
    * rank-weighted form gini = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n needs
    * a GLOBAL rank of every customer by spend — GlobalRank's
    * range-partitioned row_number, never a one-task window — and then
    * ONE exact integer aggregate. At 100 TB: log -> |customers| rollup
    * -> distributed rank -> 1 row.
    */
  def q142GiniSpend(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables(spark, dir).orders
      .select(col("o_custkey"),
        floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("long")
          .as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("cents"))
    val ranked = graft.operators.GlobalRank
      .withRowNumber(spend, "i", col("cents"), col("o_custkey"))
    ranked.agg(count(lit(1)).as("n"), sum("cents").as("s"),
        sum(col("i") * col("cents")).as("t"))
      .select(col("n"), col("s").as("total_cents"),
        floor((lit(2.0) * col("t").cast("double") /
          (col("n").cast("double") * col("s").cast("double")) -
          (col("n") + lit(1L)).cast("double") / col("n").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("gini_micro"))
  }

  val q142Sql: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT cents,
      |    CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
      |  FROM c),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s,
      |    CAST(sum(i * cents) AS BIGINT) AS t
      |  FROM r)
      |SELECT n, s AS total_cents,
      |  CAST(floor((2.0 * CAST(t AS DOUBLE) /
      |      (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) -
      |      CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |    AS gini_micro
      |FROM s""".stripMargin

  /** q143: CUSUM CHANGEPOINT DETECTION on the daily event-volume
    * series — the level-shift localizer a monitoring stack runs next
    * to q134's distribution drift (PSI says THAT the distribution
    * moved; CUSUM says WHEN the level moved): the cumulative sum of
    * (count - mean) peaks exactly at a sustained level shift. The log
    * collapses to the |days| rollup in one map-side-combined pass;
    * the running sum, the global mean, and the argmax all run on that
    * rollup (1-row broadcast aggregates + the q99 rollup-window shape
    * — never the log). Everything is integer micro-units: the mean is
    * quantized once, the CUSUM is an exact integer running sum, and
    * the changepoint is the earliest day attaining the maximum
    * |CUSUM| (integer compares, no float ties).
    */
  def q143CusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val stats = daily.agg(sum("n").as("total"), count(lit(1)).as("days"))
      .select(floor(col("total").cast("double") * lit(1e6) /
        col("days").cast("double") + lit(0.5)).cast("long").as("mean_micro"))
    val upto = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = daily.crossJoin(broadcast(stats))
      .withColumn("cusum_micro",
        sum(col("n") * lit(1000000L) - col("mean_micro")).over(upto))
    val cp = cusum
      .select(col("day"), abs(col("cusum_micro")).as("a"))
      .agg(max("a").as("max_a"))
      .join(cusum.select(col("day"), abs(col("cusum_micro")).as("a")),
        col("a") === col("max_a"))
      .agg(min("day").as("cp_day"))
    cusum.crossJoin(broadcast(cp))
      .select(col("day"), col("n"), col("cusum_micro"),
        when(col("day") === col("cp_day"), 1L).otherwise(0L)
          .as("is_changepoint"))
  }

  val q143Sql: String =
    """WITH d AS (
      |  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT CAST(floor(CAST(sum(n) AS DOUBLE) * 1e6 /
      |    CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS mean_micro
      |  FROM d),
      |c AS (
      |  SELECT day, n,
      |    CAST(sum(n * 1000000 - mean_micro) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cusum_micro
      |  FROM d CROSS JOIN m),
      |cp AS (
      |  SELECT min(day) AS cp_day FROM c
      |  WHERE abs(cusum_micro) = (SELECT max(abs(cusum_micro)) FROM c))
      |SELECT day, n, cusum_micro,
      |  CASE WHEN day = cp_day THEN 1 ELSE 0 END AS is_changepoint
      |FROM c CROSS JOIN cp
      |ORDER BY day""".stripMargin

  /** q148 replicate count (8 per md5 digest — 4 digests per row). */
  val BOOT_B = 32

  /** Poisson(1) CDF thresholds in 1/65536 units (floor(cdf * 65536)):
    * a 16-bit md5 uniform maps to a bootstrap weight 0..5 by literal
    * integer compares, identical in both engines.
    */
  val BOOT_CDF: Seq[Long] = Seq(24109L, 48218L, 60273L, 64291L, 65296L)

  /** q148: POISSON-BOOTSTRAP CONFIDENCE INTERVAL for mean order value
    * — error bars on a metric computed the only way that scales: the
    * classic resample-with-replacement bootstrap needs N draws per
    * replicate from the WHOLE dataset (a non-starter distributed);
    * the Poisson bootstrap gives each row an independent Poisson(1)
    * weight per replicate, so all BOOT_B replicates are conditional
    * sums in ONE map-side-combined aggregate over one scan. Weights
    * come from md5-derived 16-bit uniforms through the literal CDF
    * table (deterministic — reruns produce the same interval), each
    * digest feeding 8 replicates. The 1-row aggregate explodes to the
    * per-replicate mean table; the point estimate (b = -1) and the
    * percentile CI over the replicates (b = -2 lo, -3 hi; Spark
    * `percentile` == DuckDB `quantile_cont`) run on those BOOT_B rows.
    * At 100 TB: one scan, one 1-row shuffle, 2*B+2 integer sums.
    */
  /** The fold is 33 input fields + 66 aggregation buffers — past the
    * default spark.sql.codegen.maxFields=100, which silently drops the
    * whole stage to interpreted row-at-a-time aggregation (measured
    * ~2.5x on this query). Scoped to the query; session value
    * restored.
    */
  private def withWideCodegen[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.codegen.maxFields"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "300")
    try body finally spark.conf.set(key, prev)
  }

  def q148BootstrapCi(spark: SparkSession, dir: String): DataFrame =
      withWideCodegen(spark) {
    val base = Tables(spark, dir).orders
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("long")
          .as("cents"))
    // all BOOT_B weights per row through ONE fused native expression
    // (graft.plans.BootstrapWeights): md5 bytes -> 16-bit uniforms ->
    // inverse-CDF walk with no hex-string parsing — the composed
    // md5/substring/conv formulation pays interpreted string work per
    // replicate (measured ~2.5x on this pass)
    val proj = base
      .select(col("cents"),
        graft.plans.BootstrapWeights(col("o_orderkey").cast("string"),
          BOOT_B, BOOT_CDF).as("ws"))
      .select(col("cents") +:
        (0 until BOOT_B).map(b => col("ws").getItem(b).as(s"w$b")): _*)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"), sum("cents").as("sc")) ++
        (0 until BOOT_B).flatMap(b => Seq(
          sum(col(s"w$b")).as(s"sw$b"),
          sum(col(s"w$b") * col("cents")).as(s"swx$b")))
    // the 1-row aggregate IS the scan's output; pin it eagerly so the
    // four report branches (replicates, point, CI lo/hi) fold 34 rows
    // instead of each re-deriving the aggregate and re-scanning orders
    val m = proj.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    val entries = (0 until BOOT_B).map { b =>
      struct(lit(b.toLong).as("b"), col(s"sw$b").as("n_eff"),
        floor(col(s"swx$b").cast("double") * lit(1e6) /
          col(s"sw$b").cast("double") + lit(0.5)).cast("long")
          .as("mean_micro"))
    }
    val reps = m.select(explode(array(entries: _*)).as("e"))
      .select(col("e.b").as("b"), col("e.n_eff").as("n_eff"),
        col("e.mean_micro").as("mean_micro"))
    val point = m.select(lit(-1L).as("b"), col("n").as("n_eff"),
      floor(col("sc").cast("double") * lit(1e6) / col("n").cast("double")
        + lit(0.5)).cast("long").as("mean_micro"))
    val ci = reps.agg(
      expr("percentile(mean_micro, 0.025)").as("lo"),
      expr("percentile(mean_micro, 0.975)").as("hi"))
    val lo = ci.select(lit(-2L).as("b"), lit(0L).as("n_eff"),
      floor(col("lo") + lit(0.5)).cast("long").as("mean_micro"))
    val hi = ci.select(lit(-3L).as("b"), lit(0L).as("n_eff"),
      floor(col("hi") + lit(0.5)).cast("long").as("mean_micro"))
    reps.unionByName(point).unionByName(lo).unionByName(hi)
  }

  val q148Sql: String = {
    def weightSql(b: Int): String = {
      val u = s"CAST('0x' || substr(md5('bs${b / 8}:' || CAST(o_orderkey AS VARCHAR)), ${(b % 8) * 4 + 1}, 4) AS BIGINT)"
      val cases = BOOT_CDF.zipWithIndex
        .map { case (thr, k) => s"WHEN $u < $thr THEN $k" }.mkString(" ")
      s"CASE $cases ELSE 5 END"
    }
    val aggDefs = (0 until BOOT_B).map(b =>
      s"""CAST(sum(w$b) AS BIGINT) AS sw$b,
         |    CAST(sum(w$b * cents) AS BIGINT) AS swx$b""".stripMargin)
      .mkString(",\n    ")
    val wDefs = (0 until BOOT_B).map(b => s"${weightSql(b)} AS w$b")
      .mkString(",\n    ")
    val repRows = (0 until BOOT_B).map(b =>
      s"""SELECT $b AS b, sw$b AS n_eff,
         |    CAST(floor(CAST(swx$b AS DOUBLE) * 1e6 / CAST(sw$b AS DOUBLE)
         |      + 0.5) AS BIGINT) AS mean_micro FROM m""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    s"""WITH v AS (
      |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    $wDefs
      |  FROM orders),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sc,
      |    $aggDefs
      |  FROM v),
      |reps AS (
      |  $repRows),
      |ci AS (
      |  SELECT quantile_cont(CAST(mean_micro AS DOUBLE), 0.025) AS lo,
      |         quantile_cont(CAST(mean_micro AS DOUBLE), 0.975) AS hi
      |  FROM reps)
      |SELECT * FROM reps
      |UNION ALL
      |SELECT -1 AS b, n AS n_eff,
      |  CAST(floor(CAST(sc AS DOUBLE) * 1e6 / CAST(n AS DOUBLE) + 0.5)
      |    AS BIGINT) AS mean_micro FROM m
      |UNION ALL
      |SELECT -2 AS b, 0 AS n_eff,
      |  CAST(floor(lo + 0.5) AS BIGINT) AS mean_micro FROM ci
      |UNION ALL
      |SELECT -3 AS b, 0 AS n_eff,
      |  CAST(floor(hi + 0.5) AS BIGINT) AS mean_micro FROM ci
      |ORDER BY b""".stripMargin
  }

  /** q157: JOIN-SKEW PROBE — the key-distribution diagnostic run
    * BEFORE choosing a join strategy (plain vs salted q120 vs
    * bloom-pruned q127): the fact's join-key histogram collapsed to
    * (metric, value) rows — key cardinality, row count, the heaviest
    * key's size, mean and exact-median rows per key, a max/mean skew
    * factor, and the top-3 heaviest keys (deterministic lower-key
    * ties). One map-side-combined rollup to |keys|; the stats and the
    * top-3 (TakeOrderedAndProject, no global sort) both fold THAT
    * table. At 100 TB this probe is how q120's SKEW_SALTS gets sized.
    */
  def q157SkewProbe(spark: SparkSession, dir: String): DataFrame = {
    val kc = Tables(spark, dir).lineitem
      .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
    val stats = kc.agg(
      count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
      max("c").as("max_c"),
      expr("percentile(c, 0.5)").as("p50"))
      .select(explode(array(
        struct(lit("n_keys").as("metric"), col("n_keys").as("value")),
        struct(lit("n_rows").as("metric"), col("n_rows").as("value")),
        struct(lit("max_key_rows").as("metric"), col("max_c").as("value")),
        struct(lit("p50_key_rows_micro").as("metric"),
          floor(col("p50") * lit(1e6) + lit(0.5)).cast("long").as("value")),
        struct(lit("mean_key_rows_micro").as("metric"),
          floor(col("n_rows").cast("double") * lit(1e6) /
            col("n_keys").cast("double") + lit(0.5)).cast("long").as("value")),
        struct(lit("skew_max_over_mean_micro").as("metric"),
          floor(col("max_c").cast("double") * col("n_keys").cast("double") *
            lit(1e6) / col("n_rows").cast("double") + lit(0.5)).cast("long")
            .as("value")))).as("e"))
      .select(col("e.metric").as("metric"), col("e.value").as("value"))
    val top = kc.orderBy(col("c").desc, col("l_orderkey").asc).limit(3)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("l_orderkey").asc)))
      .select(explode(array(
        struct(concat(lit("top"), col("rn"), lit("_key")).as("metric"),
          col("l_orderkey").as("value")),
        struct(concat(lit("top"), col("rn"), lit("_rows")).as("metric"),
          col("c").as("value")))).as("e"))
      .select(col("e.metric").as("metric"), col("e.value").as("value"))
    stats.unionByName(top)
  }

  val q157Sql: String =
    """WITH kc AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |    CAST(sum(c) AS BIGINT) AS n_rows,
      |    CAST(max(c) AS BIGINT) AS max_c,
      |    quantile_cont(CAST(c AS DOUBLE), 0.5) AS p50
      |  FROM kc),
      |top AS (
      |  SELECT l_orderkey, c,
      |    row_number() OVER (ORDER BY c DESC, l_orderkey ASC) AS rn
      |  FROM kc
      |  ORDER BY c DESC, l_orderkey ASC LIMIT 3)
      |SELECT 'n_keys' AS metric, n_keys AS value FROM s
      |UNION ALL SELECT 'n_rows', n_rows FROM s
      |UNION ALL SELECT 'max_key_rows', max_c FROM s
      |UNION ALL SELECT 'p50_key_rows_micro',
      |  CAST(floor(p50 * 1e6 + 0.5) AS BIGINT) FROM s
      |UNION ALL SELECT 'mean_key_rows_micro',
      |  CAST(floor(CAST(n_rows AS DOUBLE) * 1e6 / CAST(n_keys AS DOUBLE) + 0.5)
      |    AS BIGINT) FROM s
      |UNION ALL SELECT 'skew_max_over_mean_micro',
      |  CAST(floor(CAST(max_c AS DOUBLE) * CAST(n_keys AS DOUBLE) * 1e6 /
      |    CAST(n_rows AS DOUBLE) + 0.5) AS BIGINT) FROM s
      |UNION ALL SELECT 'top' || rn || '_key', l_orderkey FROM top
      |UNION ALL SELECT 'top' || rn || '_rows', c FROM top
      |ORDER BY metric""".stripMargin

  /** q169: CHI-SQUARE INDEPENDENCE TEST (lang x source on documents)
    * — the categorical-association complement of q141's mutual
    * information. One count aggregate builds the observed contingency;
    * row totals x column totals CROSS-join into the full grid (tiny:
    * R x C cells, so zero-observed cells — which still contribute
    * E = rc·cc/N to the statistic — are included, where an
    * observed-cells-only rollup would understate chi2). Each cell's
    * term is floored to integer micro-units BEFORE summing, so the sum
    * is order-free exact (a double sum would depend on partition
    * order); the per-cell double expression runs on identical BIGINTs
    * in both engines.
    */
  def q169Chi2Independence(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables(spark, dir).documents
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rowTot = obs.groupBy("lang").agg(sum("o").as("rt"))
    val colTot = obs.groupBy("source").agg(sum("o").as("ct"))
    val nTot = obs.agg(sum("o").as("n"))
    val eCol = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val oCol = coalesce(col("o"), lit(0L)).cast("double")
    val grid = rowTot.crossJoin(broadcast(colTot)).crossJoin(broadcast(nTot))
      .join(obs, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), col("n"),
        floor((oCol - eCol) * (oCol - eCol) / eCol * lit(1e6) + lit(0.5))
          .cast("long").as("term_micro"))
    grid.agg(
      first("n").as("n"),
      countDistinct("lang").as("n_langs"),
      countDistinct("source").as("n_sources"),
      sum("term_micro").as("chi2_micro"))
      .select(col("n"), col("n_langs"), col("n_sources"),
        ((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"),
        col("chi2_micro"))
  }

  val q169Sql: String =
    """WITH obs AS (
      |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
      |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
      |grid AS (
      |  SELECT rt.lang, ct.source, n.n,
      |    CAST(floor(
      |      (COALESCE(obs.o, 0) - CAST(rt.rt AS DOUBLE) * ct.ct / n.n)
      |      * (COALESCE(obs.o, 0) - CAST(rt.rt AS DOUBLE) * ct.ct / n.n)
      |      / (CAST(rt.rt AS DOUBLE) * ct.ct / n.n) * 1e6 + 0.5)
      |      AS BIGINT) AS term_micro
      |  FROM rt CROSS JOIN ct CROSS JOIN n
      |  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source)
      |SELECT max(n) AS n,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
      |    AS BIGINT) AS dof,
      |  CAST(sum(term_micro) AS BIGINT) AS chi2_micro
      |FROM grid""".stripMargin

  /** q188: INTER-ARRIVAL GAP PROFILE — the latency/health metric for
    * an event stream: per-user gaps between consecutive events (one
    * lag() pass on the shared user_id key), profiled per event TYPE of
    * the later event as exact integer sums + quantile_cont p50/p90
    * through the bucket-prune operator. The answer a capacity planner
    * wants ("how bursty is each signal?") without ever sorting the
    * fact table globally.
    */
  def q188GapQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // the gap table feeds three scans (bucket bounds, fused
    // histogram+sum, survivor pass) — pin it rather than re-running
    // the lag window per consumer. Only ~5 event_type groups, each
    // spanning the cluster: exactly the low-cardinality-group case the
    // bucket-prune operator exists for (built-in percentile would
    // merge a per-group distinct-value map on 5 reducers at 100 TB).
    val gaps = Tables(spark, dir).events
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .filter(col("gap_us").isNotNull)
      .select("event_type", "gap_us")
      .localCheckpoint(true)
    graft.operators.DistributedQuantile.quantilesWithSum(
        gaps, Seq("event_type"), "gap_us", Seq("p50" -> 0.5, "p90" -> 0.9))
      .select(col("event_type"), col("n").as("n_gaps"),
        col("sumv").as("sum_gap_us"), col("p50"), col("p90"))
  }

  val q188Sql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT event_type, count(*) AS n_gaps,
      |  CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
      |  quantile_cont(gap_us, 0.5) AS p50,
      |  quantile_cont(gap_us, 0.9) AS p90
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q190: DECILE LIFT / GAINS TABLE for the q128 model — the
    * standard campaign-targeting eval: rows ranked by score descending
    * and cut into ten DETERMINISTIC bands (a score group is assigned
    * wholly to the band of its starting rank — plain ntile() splits
    * tied scores arbitrarily across engines), then per band: size,
    * positives, cumulative capture of all positives, and lift vs the
    * base rate, all in integer micro units from exact counts. Windows
    * run over the |distinct scores| rollup, not fact rows (the same
    * shape as q136/q137).
    */
  def q190DecileLift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groups = scoredRows(spark, dir)
      .groupBy("p_micro")
      .agg(count(lit(1)).as("c"), sum("y").as("pos"))
    val byScore = Window.orderBy(col("p_micro").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(lit(1))
    val banded = groups
      .withColumn("before", coalesce(sum("c").over(byScore), lit(0L)))
      .withColumn("n_tot", sum("c").over(wAll))
      .withColumn("pos_tot", sum("pos").over(wAll))
      .withColumn("decile", (col("before") * 10 / col("n_tot")).cast("long"))
    val byDecile = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, 0)
    banded.groupBy("decile")
      .agg(sum("c").as("n"), sum("pos").as("pos"),
        first("n_tot").as("n_tot"), first("pos_tot").as("pos_tot"))
      .withColumn("cum_pos", sum("pos").over(byDecile))
      .select(col("decile"), col("n"), col("pos"),
        floor(col("cum_pos") * lit(1e6) / col("pos_tot") + lit(0.5))
          .cast("long").as("capture_micro"),
        floor(col("pos") * col("n_tot") * lit(1e6) /
          (col("n") * col("pos_tot")) + lit(0.5)).cast("long")
          .as("lift_micro"))
  }

  val q190Sql: String =
    s"""WITH s AS ($scoredSql),
      |g AS (SELECT p_micro, count(*) AS c, CAST(sum(y) AS BIGINT) AS pos
      |      FROM s GROUP BY 1),
      |b AS (
      |  SELECT p_micro, c, pos,
      |    COALESCE(sum(c) OVER (ORDER BY p_micro DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
      |    sum(c) OVER () AS n_tot, sum(pos) OVER () AS pos_tot
      |  FROM g),
      |d AS (
      |  SELECT CAST(floor(before * 10 / n_tot) AS BIGINT) AS decile, c, pos,
      |    n_tot, pos_tot
      |  FROM b),
      |agg AS (
      |  SELECT decile, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(pos) AS BIGINT) AS pos,
      |    max(n_tot) AS n_tot, max(pos_tot) AS pos_tot
      |  FROM d GROUP BY 1)
      |SELECT decile, n, pos,
      |  CAST(floor(sum(pos) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e6
      |    / pos_tot + 0.5) AS BIGINT) AS capture_micro,
      |  CAST(floor(pos * n_tot * 1e6 / (n * pos_tot) + 0.5) AS BIGINT)
      |    AS lift_micro
      |FROM agg ORDER BY decile""".stripMargin

  /** q197: PROPORTION WITH WILSON CONFIDENCE INTERVAL per event type —
    * the success metric panel (here: share of events with value >
    * 100) reported the statistically honest way: the Wilson score
    * interval, which unlike the normal approximation stays inside
    * [0,1] and behaves at small n. Counts come from ONE conditional
    * aggregate; the interval arithmetic runs on the tiny rollup.
    * Bounds stay DOUBLE (sqrt is libm territory — the gate's relative
    * tolerance absorbs cross-engine ulps, as with q177).
    */
  def q197WilsonCi(spark: SparkSession, dir: String): DataFrame = {
    val z = lit(1.96)
    val agg = Tables(spark, dir).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 100.0, 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double"); val kD = col("k").cast("double")
    val pHat = kD / nD
    val z2 = z * z
    val denom = lit(1.0) + z2 / nD
    val center = pHat + z2 / (lit(2.0) * nD)
    val spread = z * sqrt(pHat * (lit(1.0) - pHat) / nD +
      z2 / (lit(4.0) * nD * nD))
    agg.select(col("event_type"), col("n"), col("k"),
      ((center - spread) / denom).as("wilson_lo"),
      ((center + spread) / denom).as("wilson_hi"))
  }

  val q197Sql: String =
    """WITH a AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS k
      |  FROM events GROUP BY 1)
      |SELECT event_type, n, k,
      |  ((CAST(k AS DOUBLE) / n + 1.96*1.96 / (2.0 * n))
      |   - 1.96 * sqrt(CAST(k AS DOUBLE) / n * (1.0 - CAST(k AS DOUBLE) / n)
      |       / n + 1.96*1.96 / (4.0 * n * n)))
      |  / (1.0 + 1.96*1.96 / n) AS wilson_lo,
      |  ((CAST(k AS DOUBLE) / n + 1.96*1.96 / (2.0 * n))
      |   + 1.96 * sqrt(CAST(k AS DOUBLE) / n * (1.0 - CAST(k AS DOUBLE) / n)
      |       / n + 1.96*1.96 / (4.0 * n * n)))
      |  / (1.0 + 1.96*1.96 / n) AS wilson_hi
      |FROM a ORDER BY event_type""".stripMargin

  /** q198: WEEKDAY SEASONALITY INDEX — each weekday's event volume
    * relative to a flat week (index 1e6 = average): the seasonal
    * profile that feeds anomaly baselines (q99) and capacity plans.
    * One map-side-combined count to the 7-row weekday grain; index in
    * integer micro units (`n*7*1e6/total`, floored on identical
    * BIGINTs).
    */
  def q198WeekdayIndex(spark: SparkSession, dir: String): DataFrame = {
    val wd = Tables(spark, dir).events
      .groupBy(dayofweek(col("ts")).as("weekday"))
      .agg(count(lit(1)).as("n"))
    val tot = wd.agg(sum("n").as("total"))
    wd.crossJoin(broadcast(tot))
      .select(col("weekday").cast("long").as("weekday"), col("n"),
        floor(col("n") * lit(7) * lit(1e6) / col("total") + lit(0.5))
          .cast("long").as("index_micro"))
  }

  val q198Sql: String =
    """WITH wd AS (
      |  SELECT dayofweek(ts) + 1 AS weekday, count(*) AS n
      |  FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM wd)
      |SELECT CAST(weekday AS BIGINT) AS weekday, n,
      |  CAST(floor(n * 7 * 1e6 / total + 0.5) AS BIGINT) AS index_micro
      |FROM wd CROSS JOIN t ORDER BY weekday""".stripMargin

  /** q210 geometry: drift is measured between shipments before and
    * after this date, on $1000 price buckets (bounded domain — the
    * q181 rollup discipline, so no full-resolution global sort).
    */
  val KS_SPLIT_DATE = "1999-01-01"
  val KS_BUCKET_CENTS = 100000L

  /** q210: TWO-SAMPLE KOLMOGOROV-SMIRNOV DRIFT TEST — the largest CDF
    * gap between the reference and current price distributions, the
    * nonparametric companion to q134's PSI (PSI scores binned mass
    * shifts; KS pins WHERE the cumulative distributions diverge most).
    * One fact scan folds both sides into a bucket × (ref, cur) count
    * rollup; the CDF race runs on the ~100-row bucket table (running
    * sums + a cross-multiplied integer gap |cumA·nB − cumB·nA| — no
    * division until the final micro report, so the argmax bucket is
    * exact). Returns the D statistic, its location, and the KS scaled
    * statistic sqrt(nA·nB/(nA+nB))·D (sqrt is correctly rounded IEEE —
    * deterministic in both engines).
    */
  def q210KsDrift(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val roll = Tables(spark, dir).lineitem
      .select(
        expr(s"cast(floor(l_extendedprice * 100 + 0.5) as bigint) div $KS_BUCKET_CENTS")
          .as("bucket"),
        (col("l_shipdate") < lit(KS_SPLIT_DATE).cast("timestamp")).as("is_ref"))
      .groupBy("bucket")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cb"))
    val tot = roll.agg(sum("ca").as("n_ref"), sum("cb").as("n_cur"))
    val cum = roll
      .select(col("bucket"), sum("ca").over(w).as("cum_a"),
        sum("cb").over(w).as("cum_b"))
      .crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(col("cum_a") * col("n_cur") - col("cum_b") * col("n_ref")))
    val mx = cum.agg(max("gap").as("max_gap"))
    cum.crossJoin(broadcast(mx))
      .filter(col("gap") === col("max_gap"))
      .agg(min("bucket").as("d_bucket"), max("n_ref").as("n_ref"),
        max("n_cur").as("n_cur"), max("max_gap").as("max_gap"))
      .select(col("n_ref"), col("n_cur"), col("d_bucket"),
        floor(col("max_gap") * lit(1e6) /
          (col("n_ref").cast("double") * col("n_cur")) + lit(0.5))
          .cast("long").as("d_micro"),
        floor(sqrt(col("n_ref").cast("double") * col("n_cur") /
            (col("n_ref") + col("n_cur"))) *
          (col("max_gap") / (col("n_ref").cast("double") * col("n_cur"))) *
          lit(1e6) + lit(0.5)).cast("long").as("ks_stat_micro"))
  }

  val q210Sql: String =
    s"""WITH r AS (
      |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      // $KS_BUCKET_CENTS AS bucket,
      |    l_shipdate < TIMESTAMP '$KS_SPLIT_DATE 00:00:00' AS is_ref
      |  FROM lineitem),
      |roll AS (
      |  SELECT bucket,
      |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM r GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS n_ref,
      |    CAST(sum(cb) AS BIGINT) AS n_cur FROM roll),
      |cum AS (
      |  SELECT bucket,
      |    abs(sum(ca) OVER (ORDER BY bucket
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * n_cur
      |      - sum(cb) OVER (ORDER BY bucket
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * n_ref)
      |      AS gap
      |  FROM roll CROSS JOIN tot),
      |mx AS (SELECT CAST(max(gap) AS BIGINT) AS max_gap FROM cum)
      |SELECT t.n_ref, t.n_cur,
      |  (SELECT min(bucket) FROM cum WHERE gap = max_gap) AS d_bucket,
      |  CAST(floor(max_gap * 1e6 /
      |    (CAST(t.n_ref AS DOUBLE) * t.n_cur) + 0.5) AS BIGINT) AS d_micro,
      |  CAST(floor(sqrt(CAST(t.n_ref AS DOUBLE) * t.n_cur /
      |      (t.n_ref + t.n_cur)) *
      |    (max_gap / (CAST(t.n_ref AS DOUBLE) * t.n_cur)) * 1e6 + 0.5)
      |    AS BIGINT) AS ks_stat_micro
      |FROM tot t CROSS JOIN mx""".stripMargin

  /** q211 groups: the two event populations whose engagement-value
    * distributions the test compares.
    */
  val MW_GROUP_A = "purchase"
  val MW_GROUP_B = "view"

  /** q211: MANN-WHITNEY U RANK-SUM TEST — does one event population
    * stochastically dominate another, without any normality
    * assumption. The whole test reduces to the value-count rollup
    * (cents-quantized values: a bounded grid, never a global rank
    * sort): 2U = Σ_v ca_v · (2·cb_below + cb_eq) is exact BIGINT via
    * one running sum over the grid; the tie-corrected variance is a
    * ratio of exact integer moments (Σ t³−t over tie groups); only
    * the final z touches doubles (identical IEEE ops both sides).
    * Also reports the common-language effect size U/(nA·nB) — the
    * probability a random A-value exceeds a random B-value — which is
    * the same AUC statistic q136 computes for classifiers, here as a
    * population comparison.
    */
  def q211MannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val roll = Tables(spark, dir).events
      .filter(col("event_type").isin(MW_GROUP_A, MW_GROUP_B))
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("v"),
        (col("event_type") === MW_GROUP_A).as("is_a"))
      .groupBy("v")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    // distributed exclusive prefix over the cents grid (|distinct
    // cents| scales with the data — no ORDER-BY-only window)
    val terms = graft.operators.GlobalRank
      .withRunningSums(roll, Seq("cb_below" -> col("cb")),
        inclusive = false, col("v"))
      .select(
        (col("ca") * (col("cb_below") * 2 + col("cb"))).as("u2_term"),
        col("ca"), col("cb"),
        ((col("ca") + col("cb")) * (col("ca") + col("cb")) *
          (col("ca") + col("cb")) - (col("ca") + col("cb"))).as("tie_term"))
    terms
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum("u2_term").as("u2"), sum("tie_term").as("ties"))
      .select(col("n_a"), col("n_b"), col("u2"),
        floor(col("u2") * lit(1e6) /
          (lit(2.0) * col("n_a") * col("n_b")) + lit(0.5)).cast("long")
          .as("auc_micro"),
        floor((col("u2").cast("double") - col("n_a").cast("double") * col("n_b")) /
          (lit(2.0) * sqrt(
            col("n_a").cast("double") * col("n_b") *
              (((col("n_a") + col("n_b") + 1) * (col("n_a") + col("n_b")) *
                (col("n_a") + col("n_b") - 1)).cast("double") -
                col("ties").cast("double")) /
              (lit(12.0) * (col("n_a") + col("n_b")) *
                (col("n_a") + col("n_b") - 1)))) * lit(1e6) + lit(0.5))
          .cast("long").as("z_micro"))
  }

  val q211Sql: String =
    s"""WITH roll AS (
      |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_type = '$MW_GROUP_A' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = '$MW_GROUP_B' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM events
      |  WHERE event_type IN ('$MW_GROUP_A', '$MW_GROUP_B')
      |  GROUP BY 1),
      |t AS (
      |  SELECT ca, cb,
      |    COALESCE(sum(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb_below
      |  FROM roll),
      |s AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
      |    CAST(sum(ca * (cb_below * 2 + cb)) AS BIGINT) AS u2,
      |    CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS BIGINT)
      |      AS ties
      |  FROM t)
      |SELECT n_a, n_b, u2,
      |  CAST(floor(u2 * 1e6 / (2.0 * n_a * n_b) + 0.5) AS BIGINT) AS auc_micro,
      |  CAST(floor((CAST(u2 AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b) /
      |    (2.0 * sqrt(
      |      CAST(n_a AS DOUBLE) * n_b *
      |        (CAST((n_a + n_b + 1) * (n_a + n_b) * (n_a + n_b - 1) AS DOUBLE) -
      |          CAST(ties AS DOUBLE)) /
      |        (12.0 * (n_a + n_b) * (n_a + n_b - 1)))) * 1e6 + 0.5)
      |    AS BIGINT) AS z_micro
      |FROM s""".stripMargin

  /** q226: PER-GROUP TREND REGRESSION — the OLS slope and intercept of
    * event value against time, per event type: the "is this segment's
    * engagement rising or falling" monitor, and the grouped-regression
    * shape feature pipelines compute per entity at scale. ONE
    * aggregate: all five moments (Σx, Σy, Σxy, Σx², n) are exact
    * BIGINT sums of quantized inputs (x = epoch days, y = value
    * cents), so the closed-form slope/intercept divisions run on
    * bit-identical integers in both engines. No window, no sort —
    * this is the q163 product-moment discipline pointed at regression.
    */
  def q226GroupTrend(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables(spark, dir).events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("x"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    // num/den in 128-bit integers (DECIMAL(38,0) here, HUGEINT in the
    // oracle): the row-level BIGINT sums fit at any realistic SF, but
    // n*sxy with absolute epoch days crosses 2^63 at sf1 — caught by
    // the round-8 ANSI sf1 gate; widening the PRODUCTS keeps the
    // identity exact to 1e38 instead of rebasing-and-hoping
    def w(c: Column) = c.cast("decimal(38,0)")
    val num = (w(col("n")) * w(col("sxy")) - w(col("sx")) * w(col("sy")))
      .cast("double")
    val den = (w(col("n")) * w(col("sxx")) - w(col("sx")) * w(col("sx")))
      .cast("double")
    m.select(col("event_type"), col("n"),
      floor(num / den * lit(1e6) + lit(0.5))
        .cast("long").as("slope_micro_c_per_day"),
      floor((col("sy").cast("double") - num / den * col("sx")) /
        col("n") + lit(0.5)).cast("long").as("intercept_c"))
  }

  val q226Sql: String =
    """WITH m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM (
      |    SELECT event_type, epoch_us(ts) // 86400000000 AS x,
      |      CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
      |    FROM events)
      |  GROUP BY 1),
      |d AS (
      |  SELECT *,
      |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
      |      AS DOUBLE) AS num,
      |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
      |      AS DOUBLE) AS den
      |  FROM m)
      |SELECT event_type, n,
      |  CAST(floor(num / den * 1e6 + 0.5) AS BIGINT)
      |    AS slope_micro_c_per_day,
      |  CAST(floor((CAST(sy AS DOUBLE) - num / den * sx) / n
      |    + 0.5) AS BIGINT) AS intercept_c
      |FROM d ORDER BY event_type""".stripMargin

  /** q320/q321 histogram resolution. */
  val SPLIT_B = 16

  /** Shared q320/q321 binned label table: events bucketed into
    * [[SPLIT_B]] equi-width bins over exact integer cents (the q300
    * integer-div binning — no float boundary can drift between
    * engines), with the positive-class count per bin. One scan, one
    * |bins|-bounded rollup.
    */
  private def binnedLabels(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bounds = ev.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
    ev.crossJoin(broadcast(bounds))
      .select(expr(s"((c - lo) * $SPLIT_B) div (hi - lo + 1)").as("bin"),
        col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
  }

  /** q320: HISTOGRAM SPLIT FINDER — the GBDT/decision-tree inner loop
    * (the XGBoost/LightGBM "hist" method): bucket the feature into
    * [[SPLIT_B]] equi-width bins, prefix-scan the per-bin (n, pos)
    * pairs, and score every bin boundary by the purity of the induced
    * left/right partition. The score is the Gini-complement
    * Σ_side (pos² + neg²)/n_side, normalized by total n into
    * [0.5, 1] micro units — computed in IEEE doubles FROM exact
    * BIGINT counts (no double is ever summed, so the value is
    * bit-identical on any partitioning and in DuckDB). Best split =
    * max purity, ties to the smaller bin via an integer packed key.
    * Scale shape: one fact scan → 16-row rollup; the prefix window
    * and the best-key scalar run on 16 rows.
    */
  def q320SplitFinder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = binnedLabels(spark, dir)
    val tot = bins.agg(sum("n").as("n_tot"), sum("pos").as("pos_tot"))
    // |bins| rows — the bounded-rollup window class, never fact-sized
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pref = bins
      .select(col("bin"), sum("n").over(w).as("n_l"),
        sum("pos").over(w).as("pos_l"))
      .crossJoin(broadcast(tot))
      .filter(col("n_l") < col("n_tot"))
    val scored = pref.select(
      col("bin").as("split_bin"),
      col("n_l"), col("pos_l"),
      (col("n_tot") - col("n_l")).as("n_r"),
      (col("pos_tot") - col("pos_l")).as("pos_r"),
      col("n_tot"))
      .withColumn("purity_micro", floor(
        ((col("pos_l") * col("pos_l") +
          (col("n_l") - col("pos_l")) * (col("n_l") - col("pos_l")))
          .cast("double") / col("n_l") +
          (col("pos_r") * col("pos_r") +
            (col("n_r") - col("pos_r")) * (col("n_r") - col("pos_r")))
            .cast("double") / col("n_r"))
          * lit(1e6) / col("n_tot") + lit(0.5)).cast("long"))
      .withColumn("key",
        col("purity_micro") * SPLIT_B + (lit(SPLIT_B - 1) - col("split_bin")))
    val best = scored.agg(max("key").as("best_key"))
    scored.crossJoin(broadcast(best))
      .select(col("split_bin"), col("n_l"), col("pos_l"), col("n_r"),
        col("pos_r"), col("purity_micro"),
        (col("key") === col("best_key")).as("is_best"))
  }

  val q320Sql: String =
    s"""WITH ev AS (
      |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM ev),
      |bins AS (
      |  SELECT ((c - lo) * $SPLIT_B) // (hi - lo + 1) AS bin,
      |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      |  FROM ev, bounds GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
      |  CAST(sum(pos) AS BIGINT) AS pos_tot FROM bins),
      |pref AS (
      |  SELECT bin, CAST(sum(n) OVER wo AS BIGINT) AS n_l,
      |    CAST(sum(pos) OVER wo AS BIGINT) AS pos_l
      |  FROM bins
      |  WINDOW wo AS (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |scored AS (
      |  SELECT bin AS split_bin, n_l, pos_l,
      |    n_tot - n_l AS n_r, pos_tot - pos_l AS pos_r,
      |    CAST(floor(
      |      (CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS DOUBLE)
      |         / n_l +
      |       CAST(pos_r * pos_r + (n_r - pos_r) * (n_r - pos_r) AS DOUBLE)
      |         / n_r)
      |      * 1e6 / n_tot + 0.5) AS BIGINT) AS purity_micro
      |  FROM pref, tot WHERE n_l < n_tot),
      |keyed AS (
      |  SELECT *, purity_micro * $SPLIT_B + ($SPLIT_B - 1 - split_bin) AS key
      |  FROM scored)
      |SELECT split_bin, n_l, pos_l, n_r, pos_r, purity_micro,
      |  key = (SELECT max(key) FROM keyed) AS is_best
      |FROM keyed
      |ORDER BY split_bin""".stripMargin

  /** q321: WEIGHT-OF-EVIDENCE / INFORMATION-VALUE feature report (the
    * credit-scoring feature screen): per equi-width bin over the same
    * exact-integer bucketing as q320, WoE = ln of the Laplace-smoothed
    * (+0.5) class-distribution ratio and the bin's IV contribution
    * (dist⁺ − dist⁻)·WoE. Counts are BIGINT-exact; WoE/IV are single
    * IEEE expressions of those integers (ln ulp drift is the known
    * passing class), and no doubles are ever SUMMED across rows — the
    * per-bin rows are the contract, callers fold the total.
    */
  def q321WoeIv(spark: SparkSession, dir: String): DataFrame = {
    val bins = binnedLabels(spark, dir)
    val tot = bins.agg(sum("pos").as("p_tot"),
      (sum("n") - sum("pos")).as("neg_tot"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("pos"),
        (col("n") - col("pos")).as("neg"),
        col("p_tot"), col("neg_tot"))
      .withColumn("woe", log(
        ((col("pos") + lit(0.5)) / col("p_tot")) /
          ((col("neg") + lit(0.5)) / col("neg_tot"))))
      .withColumn("iv_contrib",
        (col("pos").cast("double") / col("p_tot") -
          col("neg").cast("double") / col("neg_tot")) * col("woe"))
      .select("bin", "n", "pos", "neg", "woe", "iv_contrib")
  }

  val q321Sql: String =
    s"""WITH ev AS (
      |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |bounds AS (SELECT min(c) AS lo, max(c) AS hi FROM ev),
      |bins AS (
      |  SELECT ((c - lo) * $SPLIT_B) // (hi - lo + 1) AS bin,
      |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      |  FROM ev, bounds GROUP BY 1),
      |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p_tot,
      |  CAST(sum(n) - sum(pos) AS BIGINT) AS neg_tot FROM bins)
      |SELECT bin, n, pos, n - pos AS neg,
      |  ln(((CAST(pos AS DOUBLE) + 0.5) / p_tot)
      |     / ((CAST(n - pos AS DOUBLE) + 0.5) / neg_tot)) AS woe,
      |  (CAST(pos AS DOUBLE) / p_tot - CAST(n - pos AS DOUBLE) / neg_tot)
      |    * ln(((CAST(pos AS DOUBLE) + 0.5) / p_tot)
      |         / ((CAST(n - pos AS DOUBLE) + 0.5) / neg_tot))
      |    AS iv_contrib
      |FROM bins, tot
      |ORDER BY bin""".stripMargin

  /** q327: SLICED ROC AUC — q136's Mann–Whitney AUC computed PER
    * SEGMENT (order priority), the sliced-evaluation report every
    * model rollout gates on (a global AUC hides a slice where the
    * model is random or inverted — the fairness/robustness failure
    * mode). Same tie-aware U-statistic, different distribution shape:
    * within a slice the exclusive running count is a window
    * PARTITIONED BY the slice over the |slices × distinct scores|
    * rollup (bounded by the score vocabulary, never the fact table —
    * where q136's single global series uses the distributed
    * GlobalRank instead). rank2 = 2·cum_before + c + 1 keeps
    * midranks in integers; one fact join on the shared order key,
    * one map-side-combined rollup.
    */
  def q327SlicedAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val xs: Seq[Column] = Seq(lit(1.0), col("l_quantity"), col("l_discount"))
    val z = LOGREG_W.zip(xs).map { case (w, x) => lit(w) * x }.reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val rows = t.lineitem
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        col("l_returnflag"))
      .join(t.orders.select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("slice"),
        floor(p * lit(1e6) + lit(0.5)).cast("long").as("p_micro"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val g = rows.groupBy("slice", "p_micro")
      .agg(count(lit(1)).as("c"), sum("y").as("pos"))
    val w = Window.partitionBy("slice").orderBy("p_micro")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum", coalesce(sum("c").over(w), lit(0L)))
      .groupBy("slice")
      .agg(
        sum(col("pos") * (lit(2L) * col("cum") + col("c") + lit(1L)))
          .as("sr2"),
        sum("pos").as("np"),
        sum(col("c") - col("pos")).as("nn"))
      .select(col("slice"), (col("np") + col("nn")).as("n"),
        col("np").as("n_pos"), col("nn").as("n_neg"),
        floor((col("sr2").cast("double") -
            col("np").cast("double") * (col("np") + lit(1L)).cast("double")) /
          (lit(2.0) * col("np").cast("double") * col("nn").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("auc_micro"))
  }

  val q327Sql: String = {
    val z = LOGREG_W.zip(Seq("1.0", "l_quantity", "l_discount"))
      .map { case (w, x) => s"$w * $x" }.mkString(" + ")
    s"""WITH e AS (
      |  SELECT o_orderpriority AS slice,
      |    CAST(floor(1.0 / (1.0 + exp(-($z))) * 1e6 + 0.5) AS BIGINT)
      |      AS p_micro,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |g AS (
      |  SELECT slice, p_micro, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(y) AS BIGINT) AS pos
      |  FROM e GROUP BY 1, 2),
      |w AS (
      |  SELECT slice, pos, c,
      |    CAST(coalesce(sum(c) OVER (PARTITION BY slice ORDER BY p_micro
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum
      |  FROM g),
      |a AS (
      |  SELECT slice,
      |    CAST(sum(pos * (2 * cum + c + 1)) AS BIGINT) AS sr2,
      |    CAST(sum(pos) AS BIGINT) AS np,
      |    CAST(sum(c - pos) AS BIGINT) AS nn
      |  FROM w GROUP BY 1)
      |SELECT slice, np + nn AS n, np AS n_pos, nn AS n_neg,
      |  CAST(floor((CAST(sr2 AS DOUBLE) -
      |      CAST(np AS DOUBLE) * CAST(np + 1 AS DOUBLE)) /
      |    (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS auc_micro
      |FROM a
      |ORDER BY slice""".stripMargin
  }

  /** q333 bin count (equal-width on the logistic score). */
  val ISO_BINS = 20

  /** q333: ISOTONIC CALIBRATION (pool-adjacent-violators) — fit the
    * monotone non-decreasing calibrator to the q128/q327 logistic
    * score's per-bin empirical positive rates, weighted by bin counts.
    * PAV is usually presented as a sequential pooling loop; here it is
    * computed CLOSED-FORM via the greatest-convex-minorant identity
    * fitted(i) = max_{j<=i} min_{k>=i} rate(j..k) (Ayer et al. 1955,
    * Ann. Math. Statist. 26:641 — the max-min formula), which is pure
    * relational algebra over the |bins|-bounded rollup: no loop, no
    * UDF, no state. Batch27Spec independently runs the classic
    * sequential PAV pooling and proves the outputs identical, plus
    * monotonicity.
    *
    * Scale shape: the fact-sized work is ONE pass building (bin, n,
    * n_pos) — 20 rows out; the max-min evaluates on bounded bin pairs
    * (≤ 20³ terms). Exactness: rates are BIGINT-difference prefix
    * sums divided once in IEEE (correctly rounded in both engines),
    * so even min/max over them are bit-identical; the gate emits
    * micro-quantized fits.
    */
  def q333IsotonicFit(spark: SparkSession, dir: String): DataFrame = {
    val xs: Seq[Column] = Seq(lit(1.0), col("l_quantity"), col("l_discount"))
    val z = LOGREG_W.zip(xs).map { case (w, x) => lit(w) * x }.reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val bins = Tables(spark, dir).lineitem
      .select(
        least(floor(floor(p * lit(1e6) + lit(0.5)).cast("long") * ISO_BINS
          / lit(1000000.0)).cast("long"), lit((ISO_BINS - 1).toLong))
          .as("bin"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
    // prefix sums in bin order over the <=20-row rollup (bounded window)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins.select(col("bin"), col("n"), col("n_pos"),
      sum("n").over(w).as("cn"), sum("n_pos").over(w).as("cp"))
    // rate(j..k) from prefix differences, for every bin pair j<=k
    val lo = pre.select(col("bin").as("j"),
      (col("cn") - col("n")).as("cn_j1"), (col("cp") - col("n_pos")).as("cp_j1"))
    val hi = pre.select(col("bin").as("k"),
      col("cn").as("cn_k"), col("cp").as("cp_k"))
    val rates = lo.crossJoin(hi).filter(col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cp_k") - col("cp_j1")).cast("double") /
          (col("cn_k") - col("cn_j1")).cast("double")).as("rate"))
    val fit = bins.select(col("bin"), col("n"), col("n_pos"))
      .join(rates, col("j") <= col("bin") && col("k") >= col("bin"))
      .groupBy("bin", "n", "n_pos", "j")
      .agg(min("rate").as("mn"))
      .groupBy("bin", "n", "n_pos")
      .agg(max("mn").as("iso"))
    fit.select(col("bin"), col("n"), col("n_pos"),
      floor(col("n_pos").cast("double") / col("n").cast("double") * lit(1e6)
        + lit(0.5)).cast("long").as("raw_micro"),
      floor(col("iso") * lit(1e6) + lit(0.5)).cast("long").as("iso_micro"))
  }

  val q333Sql: String = {
    val z = LOGREG_W.zip(Seq("1.0", "l_quantity", "l_discount"))
      .map { case (w, x) => s"$w * $x" }.mkString(" + ")
    s"""WITH e AS (
      |  SELECT least(CAST(floor(CAST(floor(1.0 / (1.0 + exp(-($z))) * 1e6
      |        + 0.5) AS BIGINT) * $ISO_BINS / 1000000.0) AS BIGINT),
      |        ${ISO_BINS - 1}) AS bin,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |bins AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS n_pos
      |  FROM e GROUP BY 1),
      |pre AS (
      |  SELECT bin, n, n_pos,
      |    sum(n) OVER (ORDER BY bin) AS cn,
      |    sum(n_pos) OVER (ORDER BY bin) AS cp
      |  FROM bins),
      |rates AS (
      |  SELECT l.bin AS j, h.bin AS k,
      |    CAST(h.cp - (l.cp - l.n_pos) AS DOUBLE) /
      |      CAST(h.cn - (l.cn - l.n) AS DOUBLE) AS rate
      |  FROM pre l, pre h WHERE l.bin <= h.bin),
      |fit AS (
      |  SELECT b.bin, b.n, b.n_pos, max(mn.mn) AS iso
      |  FROM bins b JOIN (
      |    SELECT r.j, b2.bin, min(r.rate) AS mn
      |    FROM bins b2 JOIN rates r ON r.j <= b2.bin AND r.k >= b2.bin
      |    GROUP BY 1, 2) mn ON mn.bin = b.bin
      |  GROUP BY 1, 2, 3)
      |SELECT bin, n, n_pos,
      |  CAST(floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
      |    AS BIGINT) AS raw_micro,
      |  CAST(floor(iso * 1e6 + 0.5) AS BIGINT) AS iso_micro
      |FROM fit ORDER BY bin""".stripMargin
  }

  /** q343: BRIER-SCORE MURPHY DECOMPOSITION + ECE — the forecast-
    * quality report behind a calibration plot: over the q333 bins of
    * the q128 logistic score, reliability REL = Σ nₖ(f̄ₖ−ōₖ)²/N
    * (calibration error, lower better), resolution RES = Σ nₖ(ōₖ−ō)²/N
    * (discrimination, higher better), uncertainty UNC = ō(1−ō), with
    * the Murphy (1973) identity Brier = REL − RES + UNC, plus the
    * expected calibration error ECE = Σ nₖ|f̄ₖ−ōₖ|/N. Emitted as one
    * metric/value_micro table; the identity is reproven independently
    * in Batch30Spec against a per-row Brier recompute.
    *
    * Exactness: per-bin forecast sums are per-row micro-quantized
    * BIGINTs (the q128 idiom), ōₖ and f̄ₖ are single IEEE divisions of
    * identical integers, and the bin terms (≤20 of them) are
    * micro-quantized before the final sum — every aggregate BIGINT.
    * Scale shape: ONE fact pass to the 20-bin rollup; the decomposition
    * is arithmetic over those 20 rows with the scalar totals broadcast.
    */
  def q343BrierDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val xs: Seq[Column] = Seq(lit(1.0), col("l_quantity"), col("l_discount"))
    val z = LOGREG_W.zip(xs).map { case (w, x) => lit(w) * x }.reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val pMicro = floor(p * lit(1e6) + lit(0.5)).cast("long")
    val bins = Tables(spark, dir).lineitem
      .select(
        least(floor(pMicro * ISO_BINS / lit(1000000.0)).cast("long"),
          lit((ISO_BINS - 1).toLong)).as("bin"),
        pMicro.as("pm"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"), sum("pm").as("pm_sum"))
    val tot = bins.agg(sum("n").as("nn"), sum("pos").as("pp"))
    val fbar = col("pm_sum").cast("double") / col("n").cast("double") /
      lit(1e6)
    val obar = col("pos").cast("double") / col("n").cast("double")
    val obarAll = col("pp").cast("double") / col("nn").cast("double")
    val terms = bins.crossJoin(broadcast(tot))
      .select(col("n"), col("nn"), col("pp"),
        floor(col("n").cast("double") * (fbar - obar) * (fbar - obar)
          * lit(1e6) + lit(0.5)).cast("long").as("rel_t"),
        floor(col("n").cast("double") * (obar - obarAll) * (obar - obarAll)
          * lit(1e6) + lit(0.5)).cast("long").as("res_t"),
        floor(col("n").cast("double") * abs(fbar - obar) * lit(1e6)
          + lit(0.5)).cast("long").as("ece_t"))
    val agg = terms.groupBy("nn", "pp")
      .agg(sum("rel_t").as("rel_s"), sum("res_t").as("res_s"),
        sum("ece_t").as("ece_s"))
    val unc = col("pp").cast("double") / col("nn").cast("double") *
      (lit(1.0) - col("pp").cast("double") / col("nn").cast("double"))
    agg.select(
      explode(array(
        struct(lit("reliability").as("metric"),
          floor(col("rel_s").cast("double") / col("nn").cast("double")
            + lit(0.5)).cast("long").as("value_micro")),
        struct(lit("resolution").as("metric"),
          floor(col("res_s").cast("double") / col("nn").cast("double")
            + lit(0.5)).cast("long").as("value_micro")),
        struct(lit("ece").as("metric"),
          floor(col("ece_s").cast("double") / col("nn").cast("double")
            + lit(0.5)).cast("long").as("value_micro")),
        struct(lit("uncertainty").as("metric"),
          floor(unc * lit(1e6) + lit(0.5)).cast("long").as("value_micro")),
        struct(lit("n").as("metric"), col("nn").as("value_micro"))))
        .as("m"))
      .select(col("m.metric").as("metric"), col("m.value_micro")
        .as("value_micro"))
  }

  val q343Sql: String = {
    val z = LOGREG_W.zip(Seq("1.0", "l_quantity", "l_discount"))
      .map { case (w, x) => s"$w * $x" }.mkString(" + ")
    s"""WITH e AS (
      |  SELECT least(CAST(floor(CAST(floor(1.0 / (1.0 + exp(-($z))) * 1e6
      |        + 0.5) AS BIGINT) * $ISO_BINS / 1000000.0) AS BIGINT),
      |        ${ISO_BINS - 1}) AS bin,
      |    CAST(floor(1.0 / (1.0 + exp(-($z))) * 1e6 + 0.5) AS BIGINT) AS pm,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |bins AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS pos, CAST(sum(pm) AS BIGINT) AS pm_sum
      |  FROM e GROUP BY 1),
      |tot AS (SELECT sum(n) AS nn, sum(pos) AS pp FROM bins),
      |terms AS (
      |  SELECT n, nn, pp,
      |    CAST(floor(CAST(n AS DOUBLE) *
      |      (CAST(pm_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 -
      |       CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) *
      |      (CAST(pm_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 -
      |       CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5)
      |      AS BIGINT) AS rel_t,
      |    CAST(floor(CAST(n AS DOUBLE) *
      |      (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) -
      |       CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)) *
      |      (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) -
      |       CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e6 + 0.5)
      |      AS BIGINT) AS res_t,
      |    CAST(floor(CAST(n AS DOUBLE) *
      |      abs(CAST(pm_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 -
      |          CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5)
      |      AS BIGINT) AS ece_t
      |  FROM bins CROSS JOIN tot),
      |agg AS (
      |  SELECT nn, pp, sum(rel_t) AS rel_s, sum(res_t) AS res_s,
      |    sum(ece_t) AS ece_s
      |  FROM terms GROUP BY 1, 2)
      |SELECT metric, CAST(value_micro AS BIGINT) AS value_micro FROM (
      |  SELECT 'reliability' AS metric,
      |    floor(CAST(rel_s AS DOUBLE) / CAST(nn AS DOUBLE) + 0.5)
      |      AS value_micro FROM agg
      |  UNION ALL
      |  SELECT 'resolution',
      |    floor(CAST(res_s AS DOUBLE) / CAST(nn AS DOUBLE) + 0.5) FROM agg
      |  UNION ALL
      |  SELECT 'ece',
      |    floor(CAST(ece_s AS DOUBLE) / CAST(nn AS DOUBLE) + 0.5) FROM agg
      |  UNION ALL
      |  SELECT 'uncertainty',
      |    floor(CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE) *
      |      (1.0 - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e6 + 0.5)
      |    FROM agg
      |  UNION ALL
      |  SELECT 'n', CAST(nn AS DOUBLE) FROM agg)
      |ORDER BY metric""".stripMargin
  }

  /** q346 bucket count (delete-a-group jackknife groups). */
  val JK_BUCKETS = 20

  /** q346: DELETE-A-GROUP JACKKNIFE FOR A RATIO METRIC — the standard
    * error of revenue-per-order, a RATIO whose variance a naive
    * per-row formula gets wrong (orders are the denominator, not a
    * constant): hash orders into [[JK_BUCKETS]] groups, compute each
    * leave-one-group-out ratio from the total-sums identity (no
    * rescans — the q342 trick), and report the jackknife SE
    * SE² = (B−1)/B · Σ(rᵢ−r̄)². The experimentation-platform
    * alternative to the delta method, exact enough to gate: per-group
    * sums are BIGINT cents, each rᵢ is one IEEE division of identical
    * integers quantized to cents (deviations are ~1e5 cents, so cent
    * resolution is 5 significant digits on the SE — and keeps dev²
    * inside BIGINT, which a 1e4-finer grid overflowed), and the
    * Σ(rᵢ−r̄)² terms are quantized per group before the 20-row sum.
    *
    * Scale shape: ONE fact pass to the 20-group rollup (uniform md5
    * buckets — no skew); everything after is arithmetic on 20 rows
    * with the scalar totals broadcast.
    */
  def q346JackknifeRatio(spark: SparkSession, dir: String): DataFrame = {
    val bucket = graft.functions.TextFunctions.md5Hash32(
      concat(lit("jk:"), col("o_orderkey"))) % JK_BUCKETS
    val groups = Tables(spark, dir).orders
      .select(bucket.as("b"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("rev_c"))
      .groupBy("b")
      .agg(count(lit(1)).as("n"), sum("rev_c").as("s"))
    val tot = groups.agg(sum("n").as("nn"), sum("s").as("ss"),
      count(lit(1)).as("bb"))
    // quantize each LOO ratio (to cents) BEFORE any cross-row sum: a
    // sum of raw doubles is summation-order-dependent and 20
    // near-equal ~1e7 terms carry enough ulp noise to flip the
    // squared-deviation quantization — integer r_i_q makes r̄ a ratio
    // of exact integers instead
    val loo = groups.crossJoin(broadcast(tot))
      .select(col("b"), col("nn"), col("ss"), col("bb"),
        floor((col("ss") - col("s")).cast("double") /
          (col("nn") - col("n")).cast("double") + lit(0.5))
          .cast("long").as("r_i_q"))
    val rbar = loo.groupBy("nn", "ss", "bb")
      .agg(sum("r_i_q").as("rsum"))
    loo.join(broadcast(rbar), Seq("nn", "ss", "bb"))
      .select(col("nn"), col("ss"), col("bb"), col("rsum"),
        floor((col("r_i_q").cast("double") -
          col("rsum").cast("double") / col("bb").cast("double")) *
          (col("r_i_q").cast("double") -
            col("rsum").cast("double") / col("bb").cast("double"))
          + lit(0.5)).cast("long").as("dev2"))
      .groupBy("nn", "ss", "bb", "rsum")
      .agg(sum("dev2").as("ssd"))
      .select(
        col("nn").as("n_orders"),
        floor(col("ss").cast("double") / col("nn").cast("double")
          + lit(0.5)).cast("long").as("ratio_c"),
        floor(col("rsum").cast("double") / col("bb").cast("double")
          + lit(0.5)).cast("long").as("jk_mean_c"),
        floor(sqrt((col("bb") - 1).cast("double") / col("bb").cast("double")
          * col("ssd").cast("double")) + lit(0.5)).cast("long")
          .as("jk_se_c"))
  }

  val q346Sql: String =
    s"""WITH g AS (
      |  SELECT CAST('0x' || substr(md5('jk:' || CAST(o_orderkey AS VARCHAR)),
      |      1, 8) AS BIGINT) % $JK_BUCKETS AS b,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS s
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT sum(n) AS nn, sum(s) AS ss, count(*) AS bb FROM g),
      |loo AS (
      |  SELECT b, nn, ss, bb,
      |    CAST(floor(CAST(ss - s AS DOUBLE) / CAST(nn - n AS DOUBLE)
      |      + 0.5) AS BIGINT) AS r_i_q
      |  FROM g, tot),
      |rb AS (SELECT nn, ss, bb, CAST(sum(r_i_q) AS BIGINT) AS rsum
      |       FROM loo GROUP BY 1, 2, 3),
      |dev AS (
      |  SELECT l.nn, l.ss, l.bb, rb.rsum,
      |    CAST(floor((CAST(l.r_i_q AS DOUBLE) -
      |        CAST(rb.rsum AS DOUBLE) / CAST(l.bb AS DOUBLE)) *
      |      (CAST(l.r_i_q AS DOUBLE) -
      |        CAST(rb.rsum AS DOUBLE) / CAST(l.bb AS DOUBLE)) + 0.5)
      |      AS BIGINT) AS dev2
      |  FROM loo l JOIN rb ON rb.nn = l.nn AND rb.ss = l.ss AND rb.bb = l.bb),
      |agg AS (
      |  SELECT nn, ss, bb, rsum, sum(dev2) AS ssd
      |  FROM dev GROUP BY 1, 2, 3, 4)
      |SELECT CAST(nn AS BIGINT) AS n_orders,
      |  CAST(floor(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) + 0.5)
      |    AS BIGINT) AS ratio_c,
      |  CAST(floor(CAST(rsum AS DOUBLE) / CAST(bb AS DOUBLE) + 0.5)
      |    AS BIGINT) AS jk_mean_c,
      |  CAST(floor(sqrt(CAST(bb - 1 AS DOUBLE) / CAST(bb AS DOUBLE) *
      |    CAST(ssd AS DOUBLE)) + 0.5) AS BIGINT) AS jk_se_c
      |FROM agg""".stripMargin

  /** q349 closeness bound: cells whose sensitive-attribute
    * distribution sits farther than this (total variation, micro)
    * from the global distribution are flagged. */
  val T_CLOSE_MICRO = 350000L

  /** q349: T-CLOSENESS AUDIT — the third leg of the privacy triad
    * (q279 k-anonymity, q299 l-diversity): a QI cell can be large AND
    * diverse yet still leak if its sensitive-value DISTRIBUTION skews
    * far from the global one (the skewness attack — "everyone in this
    * cell is diverse, but 90% share the rare value"). Per QI cell
    * (nation, market segment), the total-variation distance between
    * the cell's balance-band distribution and the global band
    * distribution, with the t = [[T_CLOSE_MICRO]] violation flag.
    *
    * Scale shape: one QI×band rollup over the table (|cells×bands|,
    * bounded by the attribute domains, map-side combined), a broadcast
    * of the |bands| global table cross the |cells| table, and one tiny
    * aggregate. Determinism: TVD's numerator Σ|cnt_gv·N − cnt_v·N_g|
    * is EXACT BIGINT arithmetic (both engines agree before any
    * float); only the final ÷(2·N_g·N) is IEEE, micro-quantized.
    */
  def q349TCloseness(spark: SparkSession, dir: String): DataFrame = {
    val banded = Tables(spark, dir).customer
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / ANON_BAND).cast("long").as("band"))
    val cellBand = banded.groupBy("nation", "segment", "band")
      .agg(count(lit(1)).as("cb"))
    val globBand = banded.groupBy("band").agg(count(lit(1)).as("gb"))
    val cells = cellBand.groupBy("nation", "segment")
      .agg(sum("cb").as("ng"))
    val tot = globBand.agg(sum("gb").as("nn"))
    // |cells| x |bands| frame: every cell scored against EVERY global
    // band (missing bands contribute |0 - gb*ng|), via broadcast of the
    // bounded band table — never a row-level join
    cells.crossJoin(broadcast(globBand)).crossJoin(broadcast(tot))
      .join(cellBand, Seq("nation", "segment", "band"), "left")
      .select(col("nation"), col("segment"), col("ng"), col("nn"),
        abs(coalesce(col("cb"), lit(0L)) * col("nn") -
          col("gb") * col("ng")).as("num"))
      .groupBy("nation", "segment", "ng")
      .agg(sum("num").as("num"), first("nn").as("nn"))
      .select(col("nation"), col("segment"), col("ng").as("n_rows"),
        floor(col("num").cast("double") /
          (lit(2.0d) * col("ng").cast("double") * col("nn").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("tvd_micro"))
      .withColumn("violates", col("tvd_micro") > T_CLOSE_MICRO)
  }

  val q349Sql: String =
    s"""WITH b AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    c_mktsegment AS segment,
      |    CAST(floor(c_acctbal / $ANON_BAND) AS BIGINT) AS band
      |  FROM customer),
      |cb AS (SELECT nation, segment, band, CAST(count(*) AS BIGINT) AS cb
      |       FROM b GROUP BY 1, 2, 3),
      |gb AS (SELECT band, CAST(count(*) AS BIGINT) AS gb FROM b GROUP BY 1),
      |cells AS (SELECT nation, segment, CAST(sum(cb) AS BIGINT) AS ng
      |          FROM cb GROUP BY 1, 2),
      |t AS (SELECT CAST(sum(gb) AS BIGINT) AS nn FROM gb),
      |x AS (
      |  SELECT c.nation, c.segment, c.ng, t.nn,
      |    abs(coalesce(cb.cb, 0) * t.nn - gb.gb * c.ng) AS num
      |  FROM cells c CROSS JOIN gb CROSS JOIN t
      |  LEFT JOIN cb ON cb.nation = c.nation AND cb.segment = c.segment
      |    AND cb.band = gb.band),
      |agg AS (
      |  SELECT nation, segment, ng, CAST(sum(num) AS BIGINT) AS num,
      |    first(nn) AS nn
      |  FROM x GROUP BY 1, 2, 3)
      |SELECT nation, segment, ng AS n_rows,
      |  CAST(floor(CAST(num AS DOUBLE) /
      |    (2.0 * CAST(ng AS DOUBLE) * CAST(nn AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS tvd_micro,
      |  CAST(floor(CAST(num AS DOUBLE) /
      |    (2.0 * CAST(ng AS DOUBLE) * CAST(nn AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) > $T_CLOSE_MICRO AS violates
      |FROM agg ORDER BY nation, segment""".stripMargin

  /** q350 false-discovery-rate target (micro units of alpha). */
  val FDR_ALPHA_MICRO = 50000L

  /** q350: BENJAMINI–HOCHBERG FDR CONTROL — the multiple-testing layer
    * q98's single Welch test is missing: run the A/B z-test on EVERY
    * (event type, day) segment (the "which segments moved?" scan every
    * experiment review runs), convert to two-sided normal p-values,
    * and apply the BH step-up rule at α = 0.05: reject the k smallest
    * p-values where k is the largest rank with p₍ₖ₎ ≤ k·α/m. Without
    * this, 150 segments at α=.05 hand back ~7 false positives per
    * review by construction.
    *
    * Scale shape: the log collapses to |types×days| segment moments in
    * ONE map-side-combined aggregate (decimal-exact sums, the q98
    * convention); ranking and the step-up scan are windows over that
    * bounded rollup, never the log. Determinism: z is a double
    * expression over exact decimal sums (bit-identical per engine);
    * Φ comes from the Zelen–Severo polynomial (identical literals and
    * association in both engines — note 1/√(2π) is WRITTEN as the
    * literal 0.3989422804014327, never computed); p is micro-quantized
    * BEFORE the integer step-up comparison p_micro·m ≤ k·α_micro, so
    * the reject frontier is integer arithmetic.
    */
  def q350BhFdr(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    val isB = col("user_id") % 2 === 1
    def n(v: Boolean) = sum(when(if (v) isB else !isB, 1L).otherwise(0L))
    def s1(v: Boolean) =
      sum(when(if (v) isB else !isB, Exact.dec(col("value")))).cast("double")
    def s2(v: Boolean) =
      sum(when(if (v) isB else !isB, Exact.dec(col("value") * col("value"))))
        .cast("double")
    val seg = Tables(spark, dir).events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(n(false).as("n_a"), n(true).as("n_b"),
        s1(false).as("_s1a"), s1(true).as("_s1b"),
        s2(false).as("_s2a"), s2(true).as("_s2b"))
      .filter(col("n_a") > 1 && col("n_b") > 1)
      .withColumn("se2",
        (col("_s2a") - col("_s1a") * col("_s1a") / col("n_a")) /
          (col("n_a") - 1) / col("n_a") +
        (col("_s2b") - col("_s1b") * col("_s1b") / col("n_b")) /
          (col("n_b") - 1) / col("n_b"))
      // variance > 0, not !isnan(z): Spark's x/0.0 is Inf while
      // DuckDB's is NULL — the guard must be on the input, where both
      // engines agree, or a degenerate segment silently diverges
      .filter(col("se2") > 0)
      .withColumn("z",
        (col("_s1a") / col("n_a") - col("_s1b") / col("n_b")) /
          sqrt(col("se2")))
    // Zelen–Severo 26.2.17 upper tail; identical literals in the oracle
    val az = abs(col("z"))
    val t = lit(1.0d) / (lit(1.0d) + lit(0.2316419d) * az)
    val poly = t * (lit(0.319381530d) + t * (lit(-0.356563782d) +
      t * (lit(1.781477937d) + t * (lit(-1.821255978d) +
        t * lit(1.330274429d)))))
    val p = lit(2.0d) * exp(lit(-0.5d) * az * az) *
      lit(0.3989422804014327d) * poly
    val withP = seg.withColumn("p_micro",
      floor(p * lit(1e6) + lit(0.5)).cast("long"))
    val byP = Window.orderBy(col("p_micro").asc, col("event_type").asc,
      col("day").asc)
    val all = Window.partitionBy()
    withP
      .withColumn("k", row_number().over(byP))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("kmax",
        max(when(col("p_micro") * col("m") <= col("k") * FDR_ALPHA_MICRO,
          col("k"))).over(all))
      .select(col("event_type"), col("day"), col("n_a"), col("n_b"),
        col("p_micro"), col("k"),
        (col("k") <= coalesce(col("kmax"), lit(0L))).as("rejected"))
  }

  val q350Sql: String =
    s"""WITH s AS (
      |  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_a,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_b,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,4))
      |      END) AS DOUBLE) AS s1a,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN CAST(value AS DECIMAL(18,4))
      |      END) AS DOUBLE) AS s1b,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN
      |      CAST(value * value AS DECIMAL(18,4)) END) AS DOUBLE) AS s2a,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN
      |      CAST(value * value AS DECIMAL(18,4)) END) AS DOUBLE) AS s2b
      |  FROM events GROUP BY 1, 2
      |  HAVING n_a > 1 AND n_b > 1),
      |se AS (
      |  SELECT event_type, day, n_a, n_b, s1a, s1b,
      |    (s2a - s1a * s1a / n_a) / (n_a - 1) / n_a
      |      + (s2b - s1b * s1b / n_b) / (n_b - 1) / n_b AS se2
      |  FROM s),
      |z1 AS (
      |  SELECT event_type, day, n_a, n_b,
      |    (s1a / n_a - s1b / n_b) / sqrt(se2) AS z
      |  FROM se WHERE se2 > 0),
      |pv AS (
      |  SELECT event_type, day, n_a, n_b,
      |    CAST(floor(2.0 * exp(-0.5 * abs(z) * abs(z)) *
      |      0.3989422804014327 *
      |      ((1.0 / (1.0 + 0.2316419 * abs(z))) * (0.319381530 +
      |        (1.0 / (1.0 + 0.2316419 * abs(z))) * (-0.356563782 +
      |        (1.0 / (1.0 + 0.2316419 * abs(z))) * (1.781477937 +
      |        (1.0 / (1.0 + 0.2316419 * abs(z))) * (-1.821255978 +
      |        (1.0 / (1.0 + 0.2316419 * abs(z))) * 1.330274429))))) * 1e6
      |      + 0.5) AS BIGINT) AS p_micro
      |  FROM z1),
      |rk AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY p_micro, event_type, day)
      |      AS BIGINT) AS k,
      |    CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM pv),
      |km AS (
      |  SELECT *, max(CASE WHEN p_micro * m <= k * $FDR_ALPHA_MICRO
      |    THEN k END) OVER () AS kmax
      |  FROM rk)
      |SELECT event_type, day, n_a, n_b, p_micro, k,
      |  k <= coalesce(kmax, 0) AS rejected
      |FROM km ORDER BY event_type, day""".stripMargin

  /** q358 dispersion-index flag threshold (micro): variance/mean > 2. */
  val OVERDISP_MICRO = 2000000L

  /** q358: POISSON OVERDISPERSION CHECK — per event type, is the daily
    * count series consistent with a Poisson process (variance ≈ mean)
    * or burst-clumped (variance ≫ mean)? Reports the dispersion index
    * D = s²/x̄ and the χ² dispersion statistic Σ(xᵢ−x̄)²/x̄ with its
    * df. This decides whether q99's z-thresholds (which assume
    * mean-scaled noise) are calibrated or whether a negative-binomial
    * model is needed — the check that belongs BEFORE any count-based
    * alerting.
    *
    * Scale shape: the log collapses to |types×days| counts in one
    * map-side-combined pass; the per-type moments are a second tiny
    * rollup. Both χ² = (n·Sxx − Sx²)/Sx and D = (n·Sxx − Sx²)/((n−1)·Sx)
    * are single IEEE expressions over exact BIGINT count moments,
    * micro-quantized.
    */
  def q358Overdispersion(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val m = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n_days") > 1 && col("sx") > 0)
    val num = col("n_days").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    m.select(col("event_type"), col("n_days"), col("sx").as("n_events"),
      floor(num / col("sx").cast("double") * lit(1e6) + lit(0.5))
        .cast("long").as("chi2_micro"),
      (col("n_days") - 1).as("df"),
      floor(num / ((col("n_days") - 1).cast("double") *
        col("sx").cast("double")) * lit(1e6) + lit(0.5))
        .cast("long").as("dispersion_micro"))
      .withColumn("overdispersed", col("dispersion_micro") > OVERDISP_MICRO)
  }

  val q358Sql: String =
    s"""WITH d AS (
      |  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000
      |      AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM d GROUP BY 1
      |  HAVING count(*) > 1 AND sum(x) > 0)
      |SELECT event_type, n_days, sx AS n_events,
      |  CAST(floor((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
      |    CAST(sx AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS chi2_micro,
      |  n_days - 1 AS df,
      |  CAST(floor((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
      |    (CAST(n_days - 1 AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS dispersion_micro,
      |  CAST(floor((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
      |    (CAST(n_days - 1 AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) > $OVERDISP_MICRO AS overdispersed
      |FROM m ORDER BY event_type""".stripMargin

  /** q360 "large order" cut for the trend test (cents threshold is
    * applied to the raw price — one deterministic comparison). */
  val CA_PRICE_CUT = 250000.0

  /** q360: COCHRAN–ARMITAGE TREND TEST — is the share of large orders
    * MONOTONE in order priority (scores 1..5 from the priority
    * prefix), not merely different somewhere (which is all q169's
    * general chi-square independence test can say)? The dose-response
    * test: T = Σsᵢ(rᵢ − nᵢR/N), Var(T) = (R/N)(1−R/N)(Σsᵢ²nᵢ −
    * (Σsᵢnᵢ)²/N), z = T/√Var. The standard A/B-over-ordered-buckets
    * significance test (price tiers, latency buckets, dose levels).
    *
    * Scale shape: ONE map-side-combined rollup to the 5 priority rows;
    * the test statistic is arithmetic on those 5 rows (broadcast
    * scalar totals). Determinism: every moment (nᵢ, rᵢ, Σsᵢnᵢ, Σsᵢrᵢ,
    * Σsᵢ²nᵢ) is an exact BIGINT; T, Var and z are one double
    * expression each over those integers, micro-quantized.
    */
  def q360CochranArmitage(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables(spark, dir).orders
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("s"),
        when(col("o_totalprice") > CA_PRICE_CUT, 1L).otherwise(0L).as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("n"), sum("y").as("r"))
    val tot = g.agg(sum("n").as("nn"), sum("r").as("rr"),
      sum(col("s") * col("n")).as("sn"), sum(col("s") * col("r")).as("sr"),
      sum(col("s") * col("s") * col("n")).as("ssn"))
    def d(c: String) = col(c).cast("double")
    val t = d("sr") - d("sn") * d("rr") / d("nn")
    val p = d("rr") / d("nn")
    val v = p * (lit(1.0d) - p) * (d("ssn") - d("sn") * d("sn") / d("nn"))
    tot.select(col("nn").as("n_orders"), col("rr").as("n_large"),
      floor(t * lit(1e6) + lit(0.5)).cast("long").as("t_micro"),
      floor(v * lit(1e6) + lit(0.5)).cast("long").as("var_micro"),
      floor(t / sqrt(v) * lit(1e6) + lit(0.5)).cast("long").as("z_micro"))
  }

  val q360Sql: String =
    s"""WITH g AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN o_totalprice > $CA_PRICE_CUT THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr,
      |    CAST(sum(s * n) AS BIGINT) AS sn, CAST(sum(s * r) AS BIGINT) AS sr,
      |    CAST(sum(s * s * n) AS BIGINT) AS ssn
      |  FROM g)
      |SELECT nn AS n_orders, rr AS n_large,
      |  CAST(floor((CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) *
      |    CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |    AS t_micro,
      |  CAST(floor(CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE) *
      |    (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) *
      |    (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) /
      |     CAST(nn AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS var_micro,
      |  CAST(floor((CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) *
      |    CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |    sqrt(CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE) *
      |      (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) *
      |      (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) /
      |       CAST(nn AS DOUBLE))) * 1e6 + 0.5) AS BIGINT) AS z_micro
      |FROM t""".stripMargin

  /** q369: ONE-WAY ANOVA F-TEST across the event types — does the
    * value level differ ANYWHERE among k groups, in one test (running
    * C(k,2) Welch tests and BH-correcting, q350, loses power; ANOVA
    * is the front door). SSB = Σsₘ²/nₘ − S²/N and SSW = Σx² − Σsₘ²/nₘ
    * from exact BIGINT cents moments; the per-group sₘ²/nₘ terms are
    * quantized to the UNIT (cents²) grid BEFORE the cross-group sum —
    * the q372 rule, not the micro grid: s²/n reaches ~5e13 cents² at
    * sf1 and a micro grid overflows BIGINT (caught by the sf1 scale
    * run). A 0.5 cents² error moves F by ~1e-13. Σx² stays a raw
    * exact integer, and F is one double expression over those
    * integers.
    *
    * Scale shape: one map-side-combined rollup to k rows; arithmetic
    * after.
    */
  def q369AnovaF(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val g = Tables(spark, dir).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(cents).as("s"),
        sum(cents * cents).as("ss"))
    val terms = g.select(col("n"), col("s"), col("ss"),
      floor(col("s").cast("double") * col("s").cast("double") /
        col("n").cast("double") + lit(0.5)).cast("long")
        .as("aq"))
    val tot = terms.agg(sum("n").as("nn"), sum("s").as("stot"),
      sum("ss").as("sstot"), sum("aq").as("a_unit"),
      count(lit(1)).as("k"))
    def d(c: String) = col(c).cast("double")
    val bUnit = floor(d("stot") * d("stot") / d("nn") +
      lit(0.5)).cast("long")
    tot.select(col("nn").as("n_total"), col("k").as("k_groups"),
      (col("a_unit") - bUnit).as("ssb_unit"),
      floor(((d("a_unit") - bUnit.cast("double")) /
        (d("k") - lit(1.0d))) /
        ((d("sstot") - d("a_unit")) /
          (d("nn") - d("k"))) * lit(1e6) + lit(0.5)).cast("long")
        .as("f_micro"))
  }

  val q369Sql: String =
    """WITH g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS s,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) *
      |             CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS ss
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT n, s, ss,
      |    CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |      CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS aq
      |  FROM g),
      |a AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS stot,
      |    CAST(sum(ss) AS BIGINT) AS sstot,
      |    CAST(sum(aq) AS BIGINT) AS a_unit,
      |    CAST(count(*) AS BIGINT) AS k
      |  FROM t)
      |SELECT nn AS n_total, k AS k_groups,
      |  a_unit - CAST(floor(CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) /
      |    CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS ssb_unit,
      |  CAST(floor(
      |    ((CAST(a_unit AS DOUBLE) -
      |      CAST(CAST(floor(CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) /
      |        CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS DOUBLE)) /
      |     (CAST(k AS DOUBLE) - 1.0)) /
      |    ((CAST(sstot AS DOUBLE) - CAST(a_unit AS DOUBLE)) /
      |     (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6 + 0.5)
      |    AS BIGINT) AS f_micro
      |FROM a""".stripMargin

  /** q372: KRUSKAL–WALLIS RANK TEST — q369's ANOVA without the
    * normality assumption and q211's Mann–Whitney generalized to k
    * groups: H = [12/(N(N+1))·ΣR²ₘ/nₘ − 3(N+1)] / (1 − Σ(t³−t)/(N³−N))
    * over POOLED MIDRANKS. Midranks never touch a global sort: on the
    * cents-quantized value grid (bounded by the value DOMAIN, q211's
    * trick), twice-the-midrank 2·cumBefore + t + 1 is an exact BIGINT
    * from one running sum over the grid; per-group rank sums are
    * integer dot products; the per-group R²ₘ/nₘ terms are quantized
    * to the UNIT grid before the cross-group sum (they reach ~5e18 at
    * sf1 — a micro grid would overflow; a 0.5 unit error moves H by
    * 12/(N(N+1)) ≈ 1e-9).
    */
  def q372KruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val grid = Tables(spark, dir).events
      .groupBy(cents.as("v"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("g0"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("g1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("g2"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("g3"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("g4"))
    // exclusive prefix over the value grid via the distributed
    // running sum — the grid is |distinct cents| rows, which for a
    // continuous value column scales with the data, so no
    // ORDER-BY-only window (round-7 verdict item 3)
    val ranked = graft.operators.GlobalRank
      .withRunningSums(grid, Seq("below" -> col("t")),
        inclusive = false, col("v"))
      .withColumn("mr2", lit(2L) * col("below") + col("t") + 1L)
    val agg = ranked.agg(
      sum("t").as("nn"), sum(col("t") * col("t") * col("t") - col("t"))
        .as("ties"),
      sum(col("g0") * col("mr2")).as("r0"), sum("g0").as("n0"),
      sum(col("g1") * col("mr2")).as("r1"), sum("g1").as("n1"),
      sum(col("g2") * col("mr2")).as("r2"), sum("g2").as("n2"),
      sum(col("g3") * col("mr2")).as("r3"), sum("g3").as("n3"),
      sum(col("g4") * col("mr2")).as("r4"), sum("g4").as("n4"))
    def d(c: String) = col(c).cast("double")
    def term(r: String, n: String) =
      floor(d(r) * d(r) / (lit(4.0d) * d(n)) + lit(0.5)).cast("long")
    val s = (0 to 4).map(i => term(s"r$i", s"n$i")).reduce(_ + _)
    val nD = d("nn")
    val hRaw = lit(12.0d) / (nD * (nD + lit(1.0d))) * s.cast("double") -
      lit(3.0d) * (nD + lit(1.0d))
    val corr = lit(1.0d) - d("ties") / (nD * nD * nD - nD)
    agg.select(col("nn").as("n_total"), lit(5L).as("k_groups"),
      col("ties").as("tie_term"),
      floor(hRaw * lit(1e6) + lit(0.5)).cast("long").as("h_micro"),
      floor(hRaw / corr * lit(1e6) + lit(0.5)).cast("long")
        .as("h_tiecorr_micro"))
  }

  val q372Sql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val gcols = types.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS g$i"
    }.mkString(",\n      |    ")
    val rsums = (0 to 4).map(i =>
      s"CAST(sum(g$i * mr2) AS BIGINT) AS r$i, CAST(sum(g$i) AS BIGINT) AS n$i")
      .mkString(",\n      |    ")
    val terms = (0 to 4).map(i =>
      s"CAST(floor(CAST(r$i AS DOUBLE) * CAST(r$i AS DOUBLE) / " +
        s"(4.0 * CAST(n$i AS DOUBLE)) + 0.5) AS BIGINT)").mkString(" + ")
    s"""WITH grid AS (
      |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS t,
      |    $gcols
      |  FROM events GROUP BY 1),
      |rk AS (
      |  SELECT *, 2 * CAST(coalesce(sum(t) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    + t + 1 AS mr2
      |  FROM grid),
      |a AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS nn,
      |    CAST(sum(t * t * t - t) AS BIGINT) AS ties,
      |    $rsums
      |  FROM rk)
      |SELECT nn AS n_total, CAST(5 AS BIGINT) AS k_groups,
      |  ties AS tie_term,
      |  CAST(floor((12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
      |    * CAST($terms AS DOUBLE)
      |    - 3.0 * (CAST(nn AS DOUBLE) + 1.0)) * 1e6 + 0.5) AS BIGINT)
      |    AS h_micro,
      |  CAST(floor((12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
      |    * CAST($terms AS DOUBLE)
      |    - 3.0 * (CAST(nn AS DOUBLE) + 1.0)) /
      |    (1.0 - CAST(ties AS DOUBLE) /
      |     (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
      |      - CAST(nn AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)
      |    AS h_tiecorr_micro
      |FROM a""".stripMargin
  }

  /** q373: SPEARMAN RANK CORRELATION of (l_quantity, l_discount) —
    * the monotone-association complement of q121's Pearson matrix:
    * Pearson on POOLED MIDRANKS, both computed on bounded value
    * grids (50 quantities × 11 discount ticks), so the joint rollup
    * is ≤550 cells and no global rank sort exists. Twice-the-midranks
    * are exact BIGINTs; the five weighted moments are per-cell double
    * products quantized to the unit grid (identical IEEE sequences
    * both engines; the 0.5 unit error is ~1e-17 relative), summed and
    * cross-multiplied in 128-bit integers — the plain BIGINT sum is
    * ~4n³ and crossed 2^63 at sf1 (round-8 ANSI gate catch); ρ is one
    * double expression over those exact wide integers. Remaining
    * headroom bound: the per-cell quantized product c·(2n)² must fit
    * BIGINT — good to roughly sf5 on this fixture; past that the
    * per-cell quantization itself must widen.
    */
  def q373SpearmanRho(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_quantity").cast("long").as("q"),
        floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("p"))
    val cells = li.groupBy("q", "p").agg(count(lit(1)).as("c"))
    def mr2(keyCol: String): DataFrame = {
      val m = cells.groupBy(keyCol).agg(sum("c").as("t"))
      // distributed exclusive prefix (no ORDER-BY-only window): these
      // grids are schema-bounded today (50 quantities / 11 ticks) but
      // the midrank identity must not depend on that
      graft.operators.GlobalRank
        .withRunningSums(m, Seq("below" -> col("t")),
          inclusive = false, col(keyCol))
        .withColumn(s"mr2_$keyCol",
          lit(2L) * col("below") + col("t") + 1L)
        .select(col(keyCol), col(s"mr2_$keyCol"))
    }
    val joined = cells
      .join(broadcast(mr2("q")), "q")
      .join(broadcast(mr2("p")), "p")
    def d(c: Column) = c.cast("double")
    // per-cell quantized products stay BIGINT (max c*(2n)^2 ~ 3.6e17
    // at sf1, inside 2^63 to ~sf5); the cross-cell SUMS and the
    // num/den PRODUCTS run in 128-bit integers (DECIMAL(38,0) /
    // HUGEINT) — the plain BIGINT sum crossed 2^63 at sf1 (~8e20) and
    // was caught by the round-8 ANSI sf1 gate
    def quant(x: Column) =
      floor(x + lit(0.5)).cast("long").cast("decimal(38,0)")
    val moments = joined.agg(
      sum("c").as("nn"),
      sum(quant(d(col("c")) * d(col("mr2_q")))).as("sx"),
      sum(quant(d(col("c")) * d(col("mr2_p")))).as("sy"),
      sum(quant(d(col("c")) * d(col("mr2_q")) * d(col("mr2_q")))).as("sxx"),
      sum(quant(d(col("c")) * d(col("mr2_q")) * d(col("mr2_p")))).as("sxy"),
      sum(quant(d(col("c")) * d(col("mr2_p")) * d(col("mr2_p")))).as("syy"))
    def w(c: String) = col(c).cast("decimal(38,0)")
    val num = (w("nn") * w("sxy") - w("sx") * w("sy")).cast("double")
    val den = sqrt((w("nn") * w("sxx") - w("sx") * w("sx")).cast("double") *
      (w("nn") * w("syy") - w("sy") * w("sy")).cast("double"))
    moments.select(col("nn").as("n_rows"),
      floor(num / den * lit(1e6) + lit(0.5)).cast("long").as("rho_micro"))
  }

  val q373Sql: String =
    """WITH li AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS p
      |  FROM lineitem),
      |cells AS (SELECT q, p, CAST(count(*) AS BIGINT) AS c
      |          FROM li GROUP BY 1, 2),
      |mq AS (
      |  SELECT q, 2 * CAST(coalesce(sum(t) OVER (ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    + t + 1 AS mr2_q
      |  FROM (SELECT q, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1)),
      |mp AS (
      |  SELECT p, 2 * CAST(coalesce(sum(t) OVER (ORDER BY p
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    + t + 1 AS mr2_p
      |  FROM (SELECT p, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1)),
      |j AS (
      |  SELECT c.c, mq.mr2_q, mp.mr2_p
      |  FROM cells c JOIN mq ON mq.q = c.q JOIN mp ON mp.p = c.p),
      |a AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS nn,
      |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * CAST(mr2_q AS DOUBLE)
      |      + 0.5) AS BIGINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * CAST(mr2_p AS DOUBLE)
      |      + 0.5) AS BIGINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * CAST(mr2_q AS DOUBLE) *
      |      CAST(mr2_q AS DOUBLE) + 0.5) AS BIGINT)) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * CAST(mr2_q AS DOUBLE) *
      |      CAST(mr2_p AS DOUBLE) + 0.5) AS BIGINT)) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * CAST(mr2_p AS DOUBLE) *
      |      CAST(mr2_p AS DOUBLE) + 0.5) AS BIGINT)) AS HUGEINT) AS syy
      |  FROM j)
      |SELECT nn AS n_rows,
      |  CAST(floor(CAST(CAST(nn AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
      |    sqrt(CAST(CAST(nn AS HUGEINT) * sxx - sx * sx AS DOUBLE) *
      |      CAST(CAST(nn AS HUGEINT) * syy - sy * sy AS DOUBLE))
      |    * 1e6 + 0.5)
      |    AS BIGINT) AS rho_micro
      |FROM a""".stripMargin

  /** q374: KENDALL τ-b of (l_quantity, l_discount) — the
    * pair-concordance complement of q373's Spearman: where Spearman is
    * Pearson-on-midranks, Kendall counts CONCORDANT vs DISCORDANT
    * pairs directly, and τ-b corrects both tie margins. The O(n²)
    * pair space never materializes: pairs live on the ≤550-cell
    * (quantity × discount-tick) GRID, so concordance is a self-join
    * of the tiny grid on qa < qb (broadcast nested loop over ≤550²/2
    * cell pairs) with per-pair weight c_a·c_b — exact BIGINTs.
    * Tie terms n₁ = Σt(t−1)/2 on each margin come from the grid's
    * marginals (integer div — t(t−1) is always even);
    * τ_b = (C−D)/√((n₀−n₁)(n₀−n₂)) is one double expression over
    * those integers ((n₀−n₁)(n₀−n₂) crosses 2^63 at sf1, so the
    * product is taken in double — exact inputs, one rounding).
    */
  def q374KendallTau(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_quantity").cast("long").as("q"),
        floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("p"))
    val cells = li.groupBy("q", "p").agg(count(lit(1)).as("c"))
    val a = cells.select(col("q").as("qa"), col("p").as("pa"),
      col("c").as("ca"))
    val b = cells.select(col("q").as("qb"), col("p").as("pb"),
      col("c").as("cb"))
    val cd = a.join(broadcast(b), col("qa") < col("qb")).agg(
      sum(when(col("pa") < col("pb"), col("ca") * col("cb"))
        .otherwise(0L)).as("conc"),
      sum(when(col("pa") > col("pb"), col("ca") * col("cb"))
        .otherwise(0L)).as("disc"))
    val tq = cells.groupBy("q").agg(sum("c").as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n1"), sum("t").as("nn"))
    val tp = cells.groupBy("p").agg(sum("c").as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n2"))
    val j = cd.crossJoin(broadcast(tq)).crossJoin(broadcast(tp))
      .withColumn("n0", expr("nn * (nn - 1) div 2"))
    def d(c: String) = col(c).cast("double")
    j.select(col("nn").as("n_rows"), col("conc").as("concordant"),
      col("disc").as("discordant"), col("n1").as("tie_q"),
      col("n2").as("tie_p"),
      floor((d("conc") - d("disc")) /
        sqrt((d("n0") - d("n1")) * (d("n0") - d("n2"))) * lit(1e6) +
        lit(0.5)).cast("long").as("tau_b_micro"))
  }

  val q374Sql: String =
    """WITH li AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS p
      |  FROM lineitem),
      |cells AS (SELECT q, p, CAST(count(*) AS BIGINT) AS c
      |          FROM li GROUP BY 1, 2),
      |cd AS (
      |  SELECT
      |    CAST(sum(CASE WHEN a.p < b.p THEN a.c * b.c ELSE 0 END)
      |      AS BIGINT) AS conc,
      |    CAST(sum(CASE WHEN a.p > b.p THEN a.c * b.c ELSE 0 END)
      |      AS BIGINT) AS disc
      |  FROM cells a JOIN cells b ON a.q < b.q),
      |tq AS (
      |  SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1,
      |    CAST(sum(t) AS BIGINT) AS nn
      |  FROM (SELECT q, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1)),
      |tp AS (
      |  SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2
      |  FROM (SELECT p, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1))
      |SELECT nn AS n_rows, conc AS concordant, disc AS discordant,
      |  n1 AS tie_q, n2 AS tie_p,
      |  CAST(floor((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE)) /
      |    sqrt((CAST(nn * (nn - 1) // 2 AS DOUBLE) - CAST(n1 AS DOUBLE)) *
      |      (CAST(nn * (nn - 1) // 2 AS DOUBLE) - CAST(n2 AS DOUBLE)))
      |    * 1e6 + 0.5) AS BIGINT) AS tau_b_micro
      |FROM cd, tq, tp""".stripMargin

  /** q376: BROWN–FORSYTHE TEST (Levene with medians) — variance
    * HOMOGENEITY across the event types, the assumption-check behind
    * q369's ANOVA (equal means is only half the story; pooled tests
    * also assume equal spread, and B-F is the robust way to check).
    * Per group: the DISCRETE lower median (the ⌈n/2⌉-th order
    * statistic — an actual cents value, so both engines agree exactly)
    * from one running sum over the per-group cents grid; then the
    * classic one-way F on the absolute deviations z = |x − med|, all
    * moments exact BIGINTs with the per-group s²/n terms quantized to
    * the UNIT grid before the cross-group sum (the q372 rule — a
    * micro grid overflows BIGINT at sf1, caught by the scale run).
    * Output: one row per group (n, median, mean |dev|) plus the '_all'
    * row carrying the F statistic.
    *
    * Scale shape: the grid is bounded by |groups × value domain|, the
    * median selection and moments never touch row-level data after the
    * first map-side-combined rollup; the only windows partition by
    * event_type over the bounded grid.
    */
  def q376BrownForsythe(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val grid = Tables(spark, dir).events
      .groupBy(col("event_type"), cents.as("v"))
      .agg(count(lit(1)).as("t"))
    val wcum = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.withColumn("cum", sum("t").over(wcum))
    val ng = grid.groupBy("event_type").agg(sum("t").as("n"))
    val med = cum.join(broadcast(ng), "event_type")
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("event_type").agg(min("v").as("med"))
    val g = grid.join(broadcast(med), "event_type")
      .select(col("event_type"), col("t"),
        abs(col("v") - col("med")).as("z"), col("med"))
      .groupBy("event_type")
      .agg(sum("t").as("n"), max("med").as("med"),
        sum(col("t") * col("z")).as("s"),
        sum(col("t") * col("z") * col("z")).as("ss"))
    def d(c: String) = col(c).cast("double")
    val terms = g.withColumn("aq",
      floor(d("s") * d("s") / d("n") + lit(0.5)).cast("long"))
    val tot = terms.agg(sum("n").as("nn"), sum("s").as("stot"),
      sum("ss").as("sstot"), sum("aq").as("a_unit"),
      count(lit(1)).as("k"))
    val bUnit = floor(d("stot") * d("stot") / d("nn") +
      lit(0.5)).cast("long")
    val allRow = tot.select(lit("_all").as("event_type"),
      col("nn").as("n"), lit(0L).as("med_cents"),
      floor(d("stot") / d("nn") * lit(1e6) + lit(0.5)).cast("long")
        .as("mad_micro"),
      floor(((d("a_unit") - bUnit.cast("double")) /
        (d("k") - lit(1.0d))) /
        ((d("sstot") - d("a_unit")) /
          (d("nn") - d("k"))) * lit(1e6) + lit(0.5)).cast("long")
        .as("f_micro"))
    terms.select(col("event_type"), col("n"), col("med").as("med_cents"),
      floor(d("s") / d("n") * lit(1e6) + lit(0.5)).cast("long")
        .as("mad_micro"),
      lit(0L).as("f_micro"))
      .unionByName(allRow)
  }

  val q376Sql: String =
    """WITH grid AS (
      |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS t
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT *, CAST(sum(t) OVER (PARTITION BY event_type ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum
      |  FROM grid),
      |ng AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n
      |       FROM grid GROUP BY 1),
      |med AS (
      |  SELECT c.event_type, CAST(min(c.v) AS BIGINT) AS med
      |  FROM cum c JOIN ng ON ng.event_type = c.event_type
      |  WHERE c.cum >= (ng.n + 1) // 2
      |  GROUP BY 1),
      |g AS (
      |  SELECT grid.event_type, CAST(sum(t) AS BIGINT) AS n,
      |    CAST(max(med) AS BIGINT) AS med,
      |    CAST(sum(t * abs(v - med)) AS BIGINT) AS s,
      |    CAST(sum(t * abs(v - med) * abs(v - med)) AS BIGINT) AS ss
      |  FROM grid JOIN med ON med.event_type = grid.event_type
      |  GROUP BY 1),
      |terms AS (
      |  SELECT *, CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |    CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS aq
      |  FROM g),
      |tot AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS stot,
      |    CAST(sum(ss) AS BIGINT) AS sstot,
      |    CAST(sum(aq) AS BIGINT) AS a_unit,
      |    CAST(count(*) AS BIGINT) AS k
      |  FROM terms)
      |SELECT event_type, n, med AS med_cents,
      |  CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
      |    AS BIGINT) AS mad_micro,
      |  CAST(0 AS BIGINT) AS f_micro
      |FROM terms
      |UNION ALL
      |SELECT '_all', nn, CAST(0 AS BIGINT),
      |  CAST(floor(CAST(stot AS DOUBLE) / CAST(nn AS DOUBLE) * 1e6 + 0.5)
      |    AS BIGINT),
      |  CAST(floor(
      |    ((CAST(a_unit AS DOUBLE) -
      |      CAST(CAST(floor(CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) /
      |        CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS DOUBLE)) /
      |     (CAST(k AS DOUBLE) - 1.0)) /
      |    ((CAST(sstot AS DOUBLE) - CAST(a_unit AS DOUBLE)) /
      |     (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6 + 0.5)
      |    AS BIGINT)
      |FROM tot
      |ORDER BY event_type""".stripMargin

  /** q377: CRAMÉR'S V + THEIL'S U — the NORMALIZED association
    * measures over the (event_type × weekday) contingency table:
    * q169 tests whether association EXISTS (χ²), q141 measures it in
    * nats (MI); a feature screen needs it on a 0–1 scale — V
    * (symmetric, from χ²) and U (asymmetric, MI/H(X) — "how much of
    * event_type does the weekday explain"). All three come from ONE
    * ≤|types×7|-cell rollup: χ² per-cell terms (c·n − rx·cy)²/(n·rx·cy)
    * and MI terms (c/n)·ln(cn/(rx·cy)) are nano-quantized per cell
    * (the q141 rule: identical IEEE op sequences on exact integers,
    * then integer sums); H(event_type) from the row margins the same
    * way. Scale shape: one map-side-combined rollup, two windows over
    * the tiny grid, arithmetic after.
    *
    * Definition note: χ² (and hence V) is computed over OBSERVED
    * contingency cells only — an (event_type, weekday) cell with
    * count 0 would contribute rx·cy/n to the textbook statistic but
    * is absent from the rollup. Both engines agree exactly (the
    * oracle makes the same choice); on this data every type occurs on
    * every weekday so the distinction is empty, but on a sparse table
    * V here is a lower bound on the textbook V. MI/U are unaffected
    * (empty cells contribute exactly 0 to MI).
    */
  def q377CramerTheil(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir).events
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("wd"))
      .groupBy("event_type", "wd")
      .agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum("c").as("n"))
    val m = cells
      .withColumn("rx", sum("c").over(Window.partitionBy("event_type")))
      .withColumn("cy", sum("c").over(Window.partitionBy("wd")))
      .crossJoin(broadcast(tot))
    def d(c: Column) = c.cast("double")
    val chiT = (d(col("c")) * d(col("n")) - d(col("rx")) * d(col("cy"))) *
      (d(col("c")) * d(col("n")) - d(col("rx")) * d(col("cy"))) /
      (d(col("n")) * d(col("rx")) * d(col("cy")))
    val miT = d(col("c")) / d(col("n")) *
      log(d(col("c")) * d(col("n")) / (d(col("rx")) * d(col("cy"))))
    val perCell = m.select(col("event_type"), col("rx"), col("n"),
      floor(chiT * lit(1e9) + lit(0.5)).cast("long").as("chi_nano"),
      floor(miT * lit(1e9) + lit(0.5)).cast("long").as("mi_nano"))
    val agg = perCell.agg(max("n").as("n"),
      countDistinct("event_type").as("r_levels"),
      sum("chi_nano").as("chi_nano"), sum("mi_nano").as("mi_nano"))
    // H(event_type) from the row margins (one row per type)
    val hx = perCell.groupBy("event_type")
      .agg(max("rx").as("rx"), max("n").as("n"))
      .select(floor(d(col("rx")) / d(col("n")) *
        log(d(col("n")) / d(col("rx"))) * lit(1e9) + lit(0.5))
        .cast("long").as("hx_nano"))
      .agg(sum("hx_nano").as("hx_nano"))
    val j = agg.crossJoin(broadcast(hx))
      .withColumn("c_levels", lit(7L))
    j.select(col("n"), col("r_levels"), col("c_levels"),
      floor(d(col("chi_nano")) / lit(1e3) + lit(0.5)).cast("long")
        .as("chi2_micro"),
      floor(sqrt(d(col("chi_nano")) / lit(1e9) /
        (d(col("n")) * (least(col("r_levels"), col("c_levels"))
          .cast("double") - lit(1.0d)))) * lit(1e6) + lit(0.5))
        .cast("long").as("v_micro"),
      floor(d(col("mi_nano")) / d(col("hx_nano")) * lit(1e6) + lit(0.5))
        .cast("long").as("u_micro"))
  }

  val q377Sql: String =
    """WITH cells AS (
      |  SELECT event_type,
      |    (epoch_us(ts) // 86400000000) % 7 AS wd,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT *,
      |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS rx,
      |    CAST(sum(c) OVER (PARTITION BY wd) AS BIGINT) AS cy,
      |    CAST(sum(c) OVER () AS BIGINT) AS n
      |  FROM cells),
      |pc AS (
      |  SELECT event_type, rx, n,
      |    CAST(floor((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
      |        - CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)) *
      |      (CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
      |        - CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)) /
      |      (CAST(n AS DOUBLE) * CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE))
      |      * 1e9 + 0.5) AS BIGINT) AS chi_nano,
      |    CAST(floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) *
      |      ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE) /
      |        (CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)))
      |      * 1e9 + 0.5) AS BIGINT) AS mi_nano
      |  FROM m),
      |a AS (
      |  SELECT CAST(max(n) AS BIGINT) AS n,
      |    CAST(count(DISTINCT event_type) AS BIGINT) AS r_levels,
      |    CAST(sum(chi_nano) AS BIGINT) AS chi_nano,
      |    CAST(sum(mi_nano) AS BIGINT) AS mi_nano
      |  FROM pc),
      |hx AS (
      |  SELECT CAST(sum(CAST(floor(CAST(rx AS DOUBLE) / CAST(n AS DOUBLE) *
      |      ln(CAST(n AS DOUBLE) / CAST(rx AS DOUBLE)) * 1e9 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS hx_nano
      |  FROM (SELECT event_type, CAST(max(rx) AS BIGINT) AS rx,
      |          CAST(max(n) AS BIGINT) AS n
      |        FROM pc GROUP BY 1))
      |SELECT n, r_levels, CAST(7 AS BIGINT) AS c_levels,
      |  CAST(floor(CAST(chi_nano AS DOUBLE) / 1e3 + 0.5) AS BIGINT)
      |    AS chi2_micro,
      |  CAST(floor(sqrt(CAST(chi_nano AS DOUBLE) / 1e9 /
      |    (CAST(n AS DOUBLE) *
      |     (CAST(least(r_levels, 7) AS DOUBLE) - 1.0))) * 1e6 + 0.5)
      |    AS BIGINT) AS v_micro,
      |  CAST(floor(CAST(mi_nano AS DOUBLE) / CAST(hx_nano AS DOUBLE)
      |    * 1e6 + 0.5) AS BIGINT) AS u_micro
      |FROM a, hx""".stripMargin

  /** q378 rater cuts: rater A passes a doc on raw length, rater B on
    * whitespace token count — two correlated-but-different quality
    * annotators over the same corpus. */
  val KAPPA_LEN_CUT = 300L
  val KAPPA_TOK_CUT = 50L

  /** q378: COHEN'S KAPPA between two quality raters — the
    * inter-annotator-agreement statistic every labeling/filtering
    * pipeline reports before trusting a rater pair: raw agreement p_o
    * corrected by the agreement p_e two INDEPENDENT raters with the
    * same marginals would reach by chance. Raters here are two
    * deterministic document-quality rules (length ≥ cut vs whitespace
    * tokens ≥ cut). The whole statistic is four BIGINT cell counts
    * from one scan; κ = (p_o − p_e)/(1 − p_e) is one double
    * expression over them.
    */
  def q378CohenKappa(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(
        when(col("n_chars") >= KAPPA_LEN_CUT, 1L).otherwise(0L).as("a"),
        when(size(TextFunctions.tokens(col("text"))) >= KAPPA_TOK_CUT, 1L)
          .otherwise(0L).as("b"))
    val cnt = docs.agg(count(lit(1)).as("n"),
      sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
        .as("n11"),
      sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
        .as("n10"),
      sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L))
        .as("n01"),
      sum(when(col("a") === 0 && col("b") === 0, 1L).otherwise(0L))
        .as("n00"))
    def d(c: String) = col(c).cast("double")
    val po = (d("n11") + d("n00")) / d("n")
    val pe = ((d("n11") + d("n10")) * (d("n11") + d("n01")) +
      (d("n01") + d("n00")) * (d("n10") + d("n00"))) / (d("n") * d("n"))
    cnt.select(col("n").as("n_docs"), col("n11"), col("n10"),
      col("n01"), col("n00"),
      floor(po * lit(1e6) + lit(0.5)).cast("long").as("po_micro"),
      floor(pe * lit(1e6) + lit(0.5)).cast("long").as("pe_micro"),
      floor((po - pe) / (lit(1.0d) - pe) * lit(1e6) + lit(0.5))
        .cast("long").as("kappa_micro"))
  }

  val q378Sql: String =
    s"""WITH r AS (
      |  SELECT
      |    CASE WHEN n_chars >= $KAPPA_LEN_CUT THEN 1 ELSE 0 END AS a,
      |    CASE WHEN len(list_filter(regexp_split_to_array(lower(text),
      |      '\\s+'), t -> t != '')) >= $KAPPA_TOK_CUT THEN 1 ELSE 0 END
      |      AS b
      |  FROM documents),
      |c AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n11,
      |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n10,
      |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n01,
      |    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n00
      |  FROM r)
      |SELECT n AS n_docs, n11, n10, n01, n00,
      |  CAST(floor((CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) /
      |    CAST(n AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS po_micro,
      |  CAST(floor(((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE)) *
      |      (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE)) +
      |      (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE)) *
      |      (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE))) /
      |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |    AS pe_micro,
      |  CAST(floor(((CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) /
      |      CAST(n AS DOUBLE) -
      |      ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE)) *
      |       (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE)) +
      |       (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE)) *
      |       (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE))) /
      |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
      |    (1.0 - ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE)) *
      |       (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE)) +
      |       (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE)) *
      |       (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE))) /
      |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 1e6 + 0.5)
      |    AS BIGINT) AS kappa_micro
      |FROM c""".stripMargin

  /** Euler–Mascheroni constant and √6/π, VERBATIM literals in both
    * engines (deriving one from the other would differ in the last
    * ulp; q308 rule). */
  val EULER_GAMMA = "0.5772156649015329"
  val SQRT6_OVER_PI = "0.7796968012336609"

  /** q384 return period (in blocks) for the reported return level. */
  val GUMBEL_T = 30L

  /** q384: GUMBEL BLOCK-MAXIMA FIT — extreme-value analysis of the
    * daily event-value MAXIMA by the method of moments: β̂ = s·√6/π,
    * μ̂ = m̄ − γ·β̂, and the T-block return level
    * x_T = μ̂ − β̂·ln(−ln(1 − 1/T)) — "what's the worst value we should
    * expect once per T days". The body-statistics complement of q368's
    * Hill tail index (Hill: how heavy is the tail; Gumbel: how high do
    * block records run). Block maxima are exact BIGINT cents from one
    * map-side-combined rollup to |days| rows; mean/variance come from
    * exact integer moments over those ≤|days| maxima; γ and √6/π are
    * verbatim literals in both engines and the rest is one identical
    * IEEE expression.
    */
  def q384GumbelFit(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .select(expr("unix_micros(ts) div 86400000000").as("x"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("x").agg(max("cents").as("m"))
    val mom = daily.agg(count(lit(1)).as("n"), sum("m").as("s"),
      sum(col("m") * col("m")).as("ss"), max("m").as("mx"))
    def d(c: String) = col(c).cast("double")
    val mean = d("s") / d("n")
    val sd = sqrt((d("n") * d("ss") - d("s") * d("s")) /
      (d("n") * (d("n") - lit(1.0d))))
    val beta = sd * lit(SQRT6_OVER_PI.toDouble)
    val mu = mean - lit(EULER_GAMMA.toDouble) * beta
    val rl = mu - beta * log(-log(lit(1.0d) - lit(1.0d) / GUMBEL_T))
    mom.select(col("n").as("n_blocks"), col("mx").as("max_cents"),
      floor(mean * lit(1e6) + lit(0.5)).cast("long").as("mean_micro"),
      floor(beta * lit(1e6) + lit(0.5)).cast("long").as("beta_micro"),
      floor(mu * lit(1e6) + lit(0.5)).cast("long").as("mu_micro"),
      floor(rl * lit(1e6) + lit(0.5)).cast("long").as("rl_micro"))
  }

  val q384Sql: String =
    s"""WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS x,
      |    CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS m
      |  FROM events GROUP BY 1),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS s,
      |    CAST(sum(m * m) AS BIGINT) AS ss, CAST(max(m) AS BIGINT) AS mx
      |  FROM daily)
      |SELECT n AS n_blocks, mx AS max_cents,
      |  CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
      |    AS BIGINT) AS mean_micro,
      |  CAST(floor(sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
      |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
      |    * $SQRT6_OVER_PI * 1e6 + 0.5) AS BIGINT) AS beta_micro,
      |  CAST(floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |    - $EULER_GAMMA * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
      |      * $SQRT6_OVER_PI) * 1e6 + 0.5) AS BIGINT) AS mu_micro,
      |  CAST(floor((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |    - $EULER_GAMMA * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
      |      * $SQRT6_OVER_PI
      |    - sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
      |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
      |      * $SQRT6_OVER_PI
      |      * ln(-ln(1.0 - 1.0 / CAST($GUMBEL_T AS DOUBLE)))) * 1e6
      |    + 0.5) AS BIGINT)
      |    AS rl_micro
      |FROM mom""".stripMargin

  /** q387 cluster-sample inclusion: a user (cluster) is sampled iff
    * user_id % 10 < 3 — a deterministic 30% first-stage sample. */
  val CLUSTER_MOD = 10L
  val CLUSTER_KEEP = 3L

  /** q387: CLUSTER-SAMPLE DESIGN EFFECT — sample whole USERS (then
    * keep all their events: the two-stage design every event-log
    * survey actually runs, because sampling rows breaks sessions),
    * and report what that design COSTS: the intraclass correlation ρ
    * (ANOVA estimator, unequal-size m₀ correction) and
    * deff = 1 + (m̄−1)ρ — "how many times more rows this sample needs
    * to match a simple random sample's variance". Complements q354
    * (Neyman allocation = what stratification SAVES). Per-cluster
    * s²/n terms are micro-quantized before the cross-cluster sums
    * (the q369 rule, at |clusters| terms); everything else is exact
    * BIGINT moments.
    */
  def q387ClusterDeff(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val g = Tables(spark, dir).events
      .filter(col("user_id") % CLUSTER_MOD < CLUSTER_KEEP)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(cents).as("s"),
        sum(cents * cents).as("ss"))
    def d(c: Column) = c.cast("double")
    val terms = g.select(col("n"), col("s"), col("ss"),
      floor(d(col("s")) * d(col("s")) / d(col("n")) * lit(1e6) +
        lit(0.5)).cast("long").as("aq"))
    val tot = terms.agg(count(lit(1)).as("k"), sum("n").as("nn"),
      sum("s").as("stot"), sum("ss").as("sstot"),
      sum("aq").as("a_micro"), sum(col("n") * col("n")).as("snn"))
    val kD = d(col("k")); val nD = d(col("nn"))
    val aD = d(col("a_micro")) / lit(1e6)
    val ssb = aD - d(col("stot")) * d(col("stot")) / nD
    val ssw = d(col("sstot")) - aD
    val msb = ssb / (kD - lit(1.0d))
    val msw = ssw / (nD - kD)
    val m0 = (nD - d(col("snn")) / nD) / (kD - lit(1.0d))
    val rho = (msb - msw) / (msb + (m0 - lit(1.0d)) * msw)
    val deff = lit(1.0d) + (nD / kD - lit(1.0d)) * rho
    tot.select(col("k").as("k_clusters"), col("nn").as("n_rows"),
      floor(m0 * lit(1e6) + lit(0.5)).cast("long").as("m0_micro"),
      floor(rho * lit(1e6) + lit(0.5)).cast("long").as("icc_micro"),
      floor(deff * lit(1e6) + lit(0.5)).cast("long").as("deff_micro"))
  }

  val q387Sql: String =
    s"""WITH g AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS s,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) *
      |             CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS ss
      |  FROM events WHERE user_id % $CLUSTER_MOD < $CLUSTER_KEEP
      |  GROUP BY 1),
      |t AS (
      |  SELECT n, s, ss,
      |    CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |      CAST(n AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS aq
      |  FROM g),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
      |    CAST(sum(s) AS BIGINT) AS stot, CAST(sum(ss) AS BIGINT) AS sstot,
      |    CAST(sum(aq) AS BIGINT) AS a_micro,
      |    CAST(sum(n * n) AS BIGINT) AS snn
      |  FROM t)
      |SELECT k AS k_clusters, nn AS n_rows,
      |  CAST(floor((CAST(nn AS DOUBLE) - CAST(snn AS DOUBLE) /
      |    CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0) * 1e6 + 0.5)
      |    AS BIGINT) AS m0_micro,
      |  CAST(floor(
      |    ((CAST(a_micro AS DOUBLE) / 1e6 - CAST(stot AS DOUBLE) *
      |        CAST(stot AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |      (CAST(k AS DOUBLE) - 1.0) -
      |     (CAST(sstot AS DOUBLE) - CAST(a_micro AS DOUBLE) / 1e6) /
      |      (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))) /
      |    ((CAST(a_micro AS DOUBLE) / 1e6 - CAST(stot AS DOUBLE) *
      |        CAST(stot AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |      (CAST(k AS DOUBLE) - 1.0) +
      |     ((CAST(nn AS DOUBLE) - CAST(snn AS DOUBLE) /
      |        CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0) - 1.0) *
      |     (CAST(sstot AS DOUBLE) - CAST(a_micro AS DOUBLE) / 1e6) /
      |      (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6 + 0.5)
      |    AS BIGINT) AS icc_micro,
      |  CAST(floor((1.0 + (CAST(nn AS DOUBLE) / CAST(k AS DOUBLE) - 1.0) *
      |    ((CAST(a_micro AS DOUBLE) / 1e6 - CAST(stot AS DOUBLE) *
      |        CAST(stot AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |      (CAST(k AS DOUBLE) - 1.0) -
      |     (CAST(sstot AS DOUBLE) - CAST(a_micro AS DOUBLE) / 1e6) /
      |      (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))) /
      |    ((CAST(a_micro AS DOUBLE) / 1e6 - CAST(stot AS DOUBLE) *
      |        CAST(stot AS DOUBLE) / CAST(nn AS DOUBLE)) /
      |      (CAST(k AS DOUBLE) - 1.0) +
      |     ((CAST(nn AS DOUBLE) - CAST(snn AS DOUBLE) /
      |        CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0) - 1.0) *
      |     (CAST(sstot AS DOUBLE) - CAST(a_micro AS DOUBLE) / 1e6) /
      |      (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))) * 1e6 + 0.5)
      |    AS BIGINT) AS deff_micro
      |FROM a""".stripMargin

  /** q389 SPRT design: H0 p=0.15 vs H1 p=0.25 on the purchase share,
    * α = β = 0.05. The per-event log-likelihood-ratio increments and
    * the decision thresholds are DRIVER-precomputed micro constants
    * (the q294 discount-table rule) so both engines sum identical
    * integers. */
  val SPRT_P0 = 0.15
  val SPRT_P1 = 0.25
  val SPRT_ALPHA = 0.05
  /** floor(ln(p1/p0)·1e6 + 0.5): LLR micro-units per success. */
  val SPRT_A_MICRO: Long =
    math.floor(math.log(SPRT_P1 / SPRT_P0) * 1e6 + 0.5).toLong
  /** floor(ln((1−p1)/(1−p0))·1e6 + 0.5): LLR micro-units per failure. */
  val SPRT_B_MICRO: Long =
    math.floor(math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0)) * 1e6 + 0.5)
      .toLong
  /** Upper/lower decision bounds: ±ln((1−α)/α) in micro-units. */
  val SPRT_UPPER_MICRO: Long =
    math.floor(math.log((1.0 - SPRT_ALPHA) / SPRT_ALPHA) * 1e6 + 0.5)
      .toLong
  val SPRT_LOWER_MICRO: Long = -SPRT_UPPER_MICRO

  /** q389: SEQUENTIAL PROBABILITY RATIO TEST (Wald's SPRT) on the
    * daily purchase share — the experimentation primitive that STOPS
    * AS SOON AS THE DATA DECIDES, where q98/q350's fixed-horizon tests
    * must wait out the horizon (and q353's CUSUM watches for change,
    * SPRT chooses between two hypotheses). The log-likelihood ratio is
    * LINEAR in the counts — LLR_day = A·k + B·m with driver-precomputed
    * integer constants — so the whole sequential walk is one running
    * sum over the ≤|days| rollup; the first boundary crossing is the
    * decision (latched: later days report the crossing-day decision).
    */
  def q389Sprt(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("k"), count(lit(1)).as("n"))
      .select(col("day"), col("k"), col("n"),
        (lit(SPRT_A_MICRO) * col("k") +
          lit(SPRT_B_MICRO) * (col("n") - col("k"))).as("llr_day"))
    val byDay = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.withColumn("llr_micro", sum("llr_day").over(byDay))
      .withColumn("crossed",
        when(col("llr_micro") >= SPRT_UPPER_MICRO, 1L)
          .when(col("llr_micro") <= SPRT_LOWER_MICRO, -1L)
          .otherwise(0L))
    val wAll = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum.withColumn("fcd",
        min(when(col("crossed") =!= 0L, col("day"))).over(wAll))
      .withColumn("dec_at",
        when(col("crossed") =!= 0L && col("day") === col("fcd"),
          col("crossed")))
      .withColumn("decision", coalesce(max("dec_at").over(wAll), lit(0L)))
      .select(col("day"), col("k"), col("n"), col("llr_micro"),
        coalesce(col("fcd"), lit(-1L)).as("first_cross_day"),
        col("decision"))
  }

  val q389Sql: String =
    s"""WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |cum AS (
      |  SELECT day, k, n,
      |    CAST(sum($SPRT_A_MICRO * k + $SPRT_B_MICRO * (n - k))
      |      OVER (ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS llr_micro
      |  FROM daily),
      |c2 AS (
      |  SELECT *, CASE WHEN llr_micro >= $SPRT_UPPER_MICRO THEN 1
      |    WHEN llr_micro <= $SPRT_LOWER_MICRO THEN -1 ELSE 0 END
      |    AS crossed
      |  FROM cum),
      |c3 AS (
      |  SELECT *,
      |    CAST(min(CASE WHEN crossed != 0 THEN day END)
      |      OVER (ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS fcd
      |  FROM c2)
      |SELECT day, k, n, llr_micro,
      |  COALESCE(fcd, -1) AS first_cross_day,
      |  CAST(COALESCE(max(CASE WHEN crossed != 0 AND day = fcd
      |      THEN crossed END)
      |    OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
      |    AS BIGINT) AS decision
      |FROM c3 ORDER BY day""".stripMargin

  /** q390: JONCKHEERE–TERPSTRA ORDERED-ALTERNATIVE TEST — does
    * l_quantity shift MONOTONICALLY with order priority (1-URGENT →
    * 5-LOW)? q372's Kruskal–Wallis asks "different anywhere"; JT asks
    * the sharper ordered question the priority scale implies. The
    * O(N²) pairwise U-statistic never materializes: on the
    * (priority × quantity) grid (≤ 5×50 cells), U_{a<b} decomposes as
    * Σ_v [cnt_b(v)·cumBefore_a(v) + ½·cnt_a(v)·cnt_b(v)], so doubled
    * JT2 is one pass of integer window sums over the 50-row value
    * grid with the 10 group pairs as explicit column arithmetic.
    * The null mean is exact integer; the null variance crosses 2^63
    * at scale and is one double expression over exact BIGINTs.
    */
  def q390Jonckheere(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("v"))
    val ord = Tables(spark, dir).orders
      .select(col("o_orderkey"),
        expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").as("g"))
    val gAggs = (1 to 5).map(i =>
      sum(when(col("g") === i, 1L).otherwise(0L)).as(s"g$i"))
    val grid = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("v")
      .agg(gAggs.head, gAggs.tail: _*)
    // all five groups' exclusive prefixes from ONE distributed
    // running-sum pass (the quantity grid is schema-bounded today, but
    // the trend statistic must not rely on that)
    val cums = graft.operators.GlobalRank.withRunningSums(
      grid, (1 to 5).map(i => s"c$i" -> col(s"g$i")),
      inclusive = false, col("v"))
    val pairTerms = (for {
      a <- 1 to 5; b <- (a + 1) to 5
    } yield lit(2L) * col(s"g$b") * col(s"c$a") +
      col(s"g$a") * col(s"g$b")).reduce(_ + _)
    val agg = cums.agg(
      sum(pairTerms).as("jt2"),
      (1 to 5).map(i => sum(col(s"g$i")).as(s"n$i")): _*)
    val nTot = (1 to 5).map(i => col(s"n$i")).reduce(_ + _)
    val sumSq = (1 to 5).map(i => col(s"n$i") * col(s"n$i")).reduce(_ + _)
    def d(c: Column) = c.cast("double")
    val sumVar = (1 to 5).map(i =>
      d(col(s"n$i")) * d(col(s"n$i")) *
        (lit(2.0d) * d(col(s"n$i")) + lit(3.0d))).reduce(_ + _)
    val varJt = (d(nTot) * d(nTot) * (lit(2.0d) * d(nTot) + lit(3.0d)) -
      sumVar) / lit(72.0d)
    // N² − Σn² = Σ_{a≠b} n_a·n_b is always even; the double division
    // is exact to 2^53 (safe past sf1)
    val e2 = ((nTot * nTot - sumSq) / lit(2L)).cast("long")
    agg.select(nTot.as("n_rows"), col("jt2"), e2.as("e2"),
      floor((d(col("jt2")) - d(e2)) / (lit(2.0d) * sqrt(varJt)) *
        lit(1e6) + lit(0.5)).cast("long").as("z_micro"))
  }

  val q390Sql: String = {
    val gcols = (1 to 5).map(i =>
      s"CAST(sum(CASE WHEN g = $i THEN 1 ELSE 0 END) AS BIGINT) AS g$i")
      .mkString(",\n      |    ")
    val ccols = (1 to 5).map(i =>
      s"""CAST(coalesce(sum(g$i) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS c$i""".stripMargin).mkString(",\n      |    ")
    val pairTerms = (for {
      a <- 1 to 5; b <- (a + 1) to 5
    } yield s"2 * g$b * c$a + g$a * g$b").mkString(" + ")
    val ns = (1 to 5).map(i =>
      s"CAST(sum(g$i) AS BIGINT) AS n$i").mkString(", ")
    val nTot = (1 to 5).map(i => s"n$i").mkString(" + ")
    val sumSq = (1 to 5).map(i => s"n$i * n$i").mkString(" + ")
    val sumVar = (1 to 5).map(i =>
      s"CAST(n$i AS DOUBLE) * CAST(n$i AS DOUBLE) * " +
        s"(2.0 * CAST(n$i AS DOUBLE) + 3.0)").mkString(" + ")
    s"""WITH j AS (
      |  SELECT CAST(l.l_quantity AS BIGINT) AS v,
      |    CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS g
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |grid AS (
      |  SELECT v,
      |    $gcols
      |  FROM j GROUP BY 1),
      |cums AS (
      |  SELECT *,
      |    $ccols
      |  FROM grid),
      |a AS (
      |  SELECT CAST(sum($pairTerms) AS BIGINT) AS jt2, $ns
      |  FROM cums)
      |SELECT CAST($nTot AS BIGINT) AS n_rows, jt2,
      |  CAST((($nTot) * ($nTot) - ($sumSq)) // 2 AS BIGINT) AS e2,
      |  CAST(floor((CAST(jt2 AS DOUBLE) -
      |    CAST((($nTot) * ($nTot) - ($sumSq)) // 2 AS DOUBLE)) /
      |    (2.0 * sqrt((CAST($nTot AS DOUBLE) * CAST($nTot AS DOUBLE) *
      |        (2.0 * CAST($nTot AS DOUBLE) + 3.0) - ($sumVar)) / 72.0))
      |    * 1e6 + 0.5) AS BIGINT) AS z_micro
      |FROM a""".stripMargin
  }

  /** q393: QUANTILE TREATMENT EFFECTS — the A/B readout q98's mean
    * difference hides: how the arms differ AT EACH QUANTILE of the
    * outcome (a treatment can move the median down and the p75 up —
    * a heavy-tail shift no mean test sees). Arms are the q391
    * user-parity assignment; the per-arm p25/p50/p75 are DISCRETE
    * order statistics (the ⌈p·n⌉-th value) read off one running sum
    * over the per-arm cents grid — actual data values, so both
    * engines agree exactly and QTE is pure BIGINT subtraction.
    */
  def q393Qte(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val grid = Tables(spark, dir).events
      .groupBy((col("user_id") % 2).as("arm"), cents.as("v"))
      .agg(count(lit(1)).as("t"))
    val wcum = Window.partitionBy("arm").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.withColumn("cum", sum("t").over(wcum))
    val ns = grid.groupBy("arm").agg(sum("t").as("n"))
    val ps = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L))
    val plist = ps.map { case (l, nu, de) =>
      struct(lit(l).as("p_label"), lit(nu).as("nu"), lit(de).as("de"))
    }
    val quants = cum.join(broadcast(ns), "arm")
      .crossJoin(broadcast(
        Tables(spark, dir).events.sparkSession.range(1)
          .select(explode(array(plist: _*)).as("p"))
          .select(col("p.p_label"), col("p.nu"), col("p.de"))))
      .filter(col("cum") * col("de") >= col("n") * col("nu"))
      .groupBy("p_label", "arm").agg(min("v").as("q"))
    quants.groupBy("p_label")
      .agg(max(when(col("arm") === 0, col("q"))).as("q_a_cents"),
        max(when(col("arm") === 1, col("q"))).as("q_b_cents"))
      .select(col("p_label"), col("q_a_cents"), col("q_b_cents"),
        (col("q_a_cents") - col("q_b_cents")).as("qte_cents"))
  }

  val q393Sql: String =
    """WITH grid AS (
      |  SELECT user_id % 2 AS arm,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS t
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT *, CAST(sum(t) OVER (PARTITION BY arm ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum
      |  FROM grid),
      |ns AS (SELECT arm, CAST(sum(t) AS BIGINT) AS n
      |       FROM grid GROUP BY 1),
      |ps AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
      |        ('p75', 3, 4)) AS t(p_label, nu, de)),
      |qq AS (
      |  SELECT p.p_label, c.arm, CAST(min(c.v) AS BIGINT) AS q
      |  FROM cum c JOIN ns ON ns.arm = c.arm, ps p
      |  WHERE c.cum * p.de >= ns.n * p.nu
      |  GROUP BY 1, 2)
      |SELECT p_label,
      |  CAST(max(CASE WHEN arm = 0 THEN q END) AS BIGINT) AS q_a_cents,
      |  CAST(max(CASE WHEN arm = 1 THEN q END) AS BIGINT) AS q_b_cents,
      |  CAST(max(CASE WHEN arm = 0 THEN q END)
      |    - max(CASE WHEN arm = 1 THEN q END) AS BIGINT) AS qte_cents
      |FROM qq GROUP BY 1 ORDER BY p_label""".stripMargin

  /** q395: CRAMÉR–VON MISES TWO-SAMPLE TEST — does the value
    * distribution of 'click' events differ from 'view' events ACROSS
    * THE WHOLE CDF? The integral complement of q210's KS (KS sees the
    * single worst gap; CvM integrates every gap, so it catches broad
    * mild shifts KS misses). On the pooled cents grid the statistic is
    * T = (n₁n₂/N²)·Σ_v t_v·(F₁(v) − F₂(v))²: the CDF difference per
    * grid value is the exact integer cross-product c₁n₂ − c₂n₁, the
    * per-value terms t_v·(diff/(n₁n₂))² are pico-quantized before the
    * cross-value sum (diff² crosses 2^63 at sf1 — the integer form is
    * kept only inside the exact BIGINT diff), and T is one double
    * expression over the integer sum.
    */
  val CVM_A = "click"
  val CVM_B = "view"

  def q395CramerVonMises(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val grid = Tables(spark, dir).events
      .filter(col("event_type").isin(CVM_A, CVM_B))
      .groupBy(cents.as("v"))
      .agg(sum(when(col("event_type") === CVM_A, 1L).otherwise(0L))
        .as("t1"),
        sum(when(col("event_type") === CVM_B, 1L).otherwise(0L))
          .as("t2"))
    // both empirical CDFs from ONE distributed running-sum pass over
    // the cents grid (|distinct cents| scales with the data — no
    // ORDER-BY-only window, round-7 verdict item 3)
    val cum = graft.operators.GlobalRank.withRunningSums(
      grid, Seq("c1" -> col("t1"), "c2" -> col("t2")),
      inclusive = true, col("v"))
    val ns = grid.agg(sum("t1").as("n1"), sum("t2").as("n2"))
    def d(c: Column) = c.cast("double")
    val terms = cum.crossJoin(broadcast(ns))
      .select(col("n1"), col("n2"),
        floor((col("t1") + col("t2")).cast("double") *
          (d(col("c1") * col("n2") - col("c2") * col("n1")) /
            (d(col("n1")) * d(col("n2")))) *
          (d(col("c1") * col("n2") - col("c2") * col("n1")) /
            (d(col("n1")) * d(col("n2")))) * lit(1e12) + lit(0.5))
          .cast("long").as("term_pico"))
    terms.agg(max("n1").as("n1"), max("n2").as("n2"),
      sum("term_pico").as("sp"))
      .select(col("n1"), col("n2"),
        floor(d(col("sp")) / lit(1e12) *
          d(col("n1")) * d(col("n2")) /
          ((d(col("n1")) + d(col("n2"))) * (d(col("n1")) + d(col("n2"))))
          * lit(1e6) + lit(0.5)).cast("long").as("t_micro"))
  }

  val q395Sql: String =
    s"""WITH grid AS (
      |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_type = '$CVM_A' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS t1,
      |    CAST(sum(CASE WHEN event_type = '$CVM_B' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS t2
      |  FROM events WHERE event_type IN ('$CVM_A', '$CVM_B')
      |  GROUP BY 1),
      |cum AS (
      |  SELECT *,
      |    CAST(sum(t1) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS c1,
      |    CAST(sum(t2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS c2
      |  FROM grid),
      |ns AS (SELECT CAST(sum(t1) AS BIGINT) AS n1,
      |         CAST(sum(t2) AS BIGINT) AS n2 FROM grid),
      |terms AS (
      |  SELECT ns.n1, ns.n2,
      |    CAST(floor(CAST(t1 + t2 AS DOUBLE) *
      |      (CAST(c1 * ns.n2 - c2 * ns.n1 AS DOUBLE) /
      |        (CAST(ns.n1 AS DOUBLE) * CAST(ns.n2 AS DOUBLE))) *
      |      (CAST(c1 * ns.n2 - c2 * ns.n1 AS DOUBLE) /
      |        (CAST(ns.n1 AS DOUBLE) * CAST(ns.n2 AS DOUBLE))) * 1e12
      |      + 0.5) AS BIGINT) AS term_pico
      |  FROM cum, ns)
      |SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
      |  CAST(floor(CAST(sum(term_pico) AS DOUBLE) / 1e12 *
      |    CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE) /
      |    ((CAST(max(n1) AS DOUBLE) + CAST(max(n2) AS DOUBLE)) *
      |     (CAST(max(n1) AS DOUBLE) + CAST(max(n2) AS DOUBLE))) * 1e6
      |    + 0.5) AS BIGINT) AS t_micro
      |FROM terms""".stripMargin

  /** q396 design: K=4 weekly interims, O'Brien–Fleming two-sided
    * z-boundaries for overall α=0.05 (O'Brien & Fleming 1979; the
    * classic table values), null rate p0 = the q389 design's 0.20
    * midpoint. Boundaries are VERBATIM micro literals in both
    * engines. */
  val OBF_BOUNDS_MICRO: Seq[Long] =
    Seq(4048000L, 2862000L, 2337000L, 2024000L)
  val OBF_P0 = 0.20

  /** q396: GROUP-SEQUENTIAL INTERIM ANALYSIS (O'Brien–Fleming) — the
    * regulated-trial cousin of q389's SPRT: look at the data K=4
    * times (weekly), spend almost no α early (boundary 4.05σ at week
    * 1) and retain full power at the end (2.02σ at week 4), so early
    * stopping is possible WITHOUT inflating the false-positive rate
    * the way repeated fixed-level peeking does. Per interim: the
    * cumulative purchase-share z against p0 from exact BIGINT counts,
    * the boundary literal, and the latched first-crossing decision.
    */
  def q396ObfInterims(spark: SparkSession, dir: String): DataFrame = {
    val minDay = Tables(spark, dir).events
      .agg(min(expr("unix_micros(ts) div 86400000000")).as("d0"))
    val weekly = Tables(spark, dir).events
      .crossJoin(broadcast(minDay))
      .select(least(
        expr("(unix_micros(ts) div 86400000000 - d0) div 7 + 1"),
        lit(4L)).as("k"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("p"))
      .groupBy("k").agg(count(lit(1)).as("dn"), sum("p").as("dk"))
    val wK = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = weekly
      .withColumn("n", sum("dn").over(wK))
      .withColumn("x", sum("dk").over(wK))
    val bound = (2 to 4).foldLeft(
      when(col("k") === 1, lit(OBF_BOUNDS_MICRO.head))) {
      (acc, i) => acc.when(col("k") === i, lit(OBF_BOUNDS_MICRO(i - 1)))
    }
    def d(c: Column) = c.cast("double")
    val z = (d(col("x")) / d(col("n")) - lit(OBF_P0)) /
      sqrt(lit(OBF_P0 * (1.0 - OBF_P0)) / d(col("n")))
    val scored = cum.select(col("k"), col("n"), col("x"),
      floor(z * lit(1e6) + lit(0.5)).cast("long").as("z_micro"),
      bound.as("bound_micro"))
      .withColumn("crossed",
        when(abs(col("z_micro")) >= col("bound_micro"), 1L)
          .otherwise(0L))
    val wAll = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("first_cross_k",
        coalesce(min(when(col("crossed") === 1L, col("k"))).over(wAll),
          lit(-1L)))
      .select(col("k"), col("n"), col("x"), col("z_micro"),
        col("bound_micro"), col("crossed"), col("first_cross_k"))
  }

  val q396Sql: String = {
    val bounds = OBF_BOUNDS_MICRO.zipWithIndex.map { case (b, i) =>
      s"WHEN k = ${i + 1} THEN $b"
    }.mkString(" ")
    s"""WITH d0 AS (
      |  SELECT CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS d0
      |  FROM events),
      |weekly AS (
      |  SELECT least((epoch_us(ts) // 86400000000 - d0.d0) // 7 + 1, 4)
      |    AS k,
      |    CAST(count(*) AS BIGINT) AS dn,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS dk
      |  FROM events, d0 GROUP BY 1),
      |cum AS (
      |  SELECT k,
      |    CAST(sum(dn) OVER (ORDER BY k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n,
      |    CAST(sum(dk) OVER (ORDER BY k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS x
      |  FROM weekly),
      |scored AS (
      |  SELECT k, n, x,
      |    CAST(floor((CAST(x AS DOUBLE) / CAST(n AS DOUBLE) - $OBF_P0) /
      |      sqrt(${OBF_P0 * (1.0 - OBF_P0)} / CAST(n AS DOUBLE)) * 1e6
      |      + 0.5) AS BIGINT) AS z_micro,
      |    CAST(CASE $bounds END AS BIGINT) AS bound_micro
      |  FROM cum),
      |s2 AS (
      |  SELECT *, CASE WHEN abs(z_micro) >= bound_micro THEN 1 ELSE 0 END
      |    AS crossed
      |  FROM scored)
      |SELECT k, n, x, z_micro, bound_micro, CAST(crossed AS BIGINT)
      |    AS crossed,
      |  CAST(COALESCE(min(CASE WHEN crossed = 1 THEN k END)
      |    OVER (ORDER BY k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
      |    AS BIGINT) AS first_cross_k
      |FROM s2 ORDER BY k""".stripMargin
  }

  /** q399: DELTA-METHOD CI FOR A RATIO METRIC — revenue per click
    * with a linearization standard error: the closed-form cousin of
    * q346's delete-a-group jackknife (same estimand; the jackknife
    * resamples, the delta method expands — production dashboards run
    * this one because it's one scan). The residual sum of squares
    * needs no second pass: Σ(yᵢ − r·xᵢ)² = Σy² − 2rΣxy + r²Σx² with
    * every moment an exact per-user BIGINT; r, SE and the 1.96 CI are
    * one double expression over those integers.
    */
  def q399DeltaRatio(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir).events
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100 + lit(0.5)).cast("long"))
          .otherwise(0L)).as("y"))
    val m = perUser.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val r = d("sy") / d("sx")
    val rss = d("syy") - lit(2.0d) * r * d("sxy") + r * r * d("sxx")
    val se = sqrt(d("n") / (d("n") - lit(1.0d)) * rss) / d("sx")
    m.select(col("n").as("n_users"), col("sx").as("n_clicks"),
      col("sy").as("rev_cents"),
      floor(r * lit(1e6) + lit(0.5)).cast("long").as("ratio_micro"),
      floor(se * lit(1e6) + lit(0.5)).cast("long").as("se_micro"),
      floor((r - lit(1.96d) * se) * lit(1e6) + lit(0.5)).cast("long")
        .as("lo_micro"),
      floor((r + lit(1.96d) * se) * lit(1e6) + lit(0.5)).cast("long")
        .as("hi_micro"))
  }

  val q399Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM pu)
      |SELECT n AS n_users, sx AS n_clicks, sy AS rev_cents,
      |  CAST(floor(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) * 1e6 + 0.5)
      |    AS BIGINT) AS ratio_micro,
      |  CAST(floor(sqrt(CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0) *
      |    (CAST(syy AS DOUBLE)
      |      - 2.0 * CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |        CAST(sxy AS DOUBLE)
      |      + CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |        CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |        CAST(sxx AS DOUBLE))) / CAST(sx AS DOUBLE) * 1e6 + 0.5)
      |    AS BIGINT) AS se_micro,
      |  CAST(floor((CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)
      |    - 1.96 * sqrt(CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0) *
      |      (CAST(syy AS DOUBLE)
      |        - 2.0 * CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |          CAST(sxy AS DOUBLE)
      |        + CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |          CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |          CAST(sxx AS DOUBLE))) / CAST(sx AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS lo_micro,
      |  CAST(floor((CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)
      |    + 1.96 * sqrt(CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0) *
      |      (CAST(syy AS DOUBLE)
      |        - 2.0 * CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |          CAST(sxy AS DOUBLE)
      |        + CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |          CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) *
      |          CAST(sxx AS DOUBLE))) / CAST(sx AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS hi_micro
      |FROM m""".stripMargin

  /** q400 permutation count (pseudo-assignments 1..P from md5 — both
    * engines share the hex, so the "randomization" replays exactly). */
  val PERM_P = 32

  /** q400: RANDOMIZATION (PERMUTATION) TEST — exact inference for the
    * arm difference in per-user mean spend, no normality assumption:
    * re-assign users to pseudo-arms P times by a deterministic hash
    * (parity of the first md5 hex char — uniform over the 16 hex
    * chars), recompute the mean difference under each, and report
    * p = (1 + #{|diff_p| ≥ |diff_obs|})/(P + 1). All P re-assignments
    * are conditional aggregates in ONE pass over the per-user rollup
    * — the scan cost is independent of P. Output: one row per
    * permutation plus the observed row (p = -1) carrying the p-value.
    */
  def q400PermutationTest(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir).events
      .groupBy("user_id")
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
        .as("spend"))
      .withColumn("obs_arm", (col("user_id") % 2).cast("long"))
    val withBits = (1 to PERM_P).foldLeft(perUser) { (df, p) =>
      df.withColumn(s"b$p",
        (ascii(substring(md5(concat(lit(s"perm$p:"),
          col("user_id").cast("string"))), 1, 1)) % 2).cast("long"))
    }
    def diffCols(arm: Column, tag: String) = Seq(
      sum(when(arm === 0L, col("spend"))).as(s"s0_$tag"),
      sum(when(arm === 0L, 1L).otherwise(0L)).as(s"n0_$tag"),
      sum(when(arm === 1L, col("spend"))).as(s"s1_$tag"),
      sum(when(arm === 1L, 1L).otherwise(0L)).as(s"n1_$tag"))
    val aggs = diffCols(col("obs_arm"), "obs") ++
      (1 to PERM_P).flatMap(p => diffCols(col(s"b$p"), s"p$p"))
    val m = withBits.agg(aggs.head, aggs.tail: _*)
    def d(c: String) = col(c).cast("double")
    def diff(tag: String) =
      d(s"s0_$tag") / d(s"n0_$tag") - d(s"s1_$tag") / d(s"n1_$tag")
    def diffM(tag: String) =
      floor(diff(tag) * lit(1e6) + lit(0.5)).cast("long")
    val rows = (1 to PERM_P).map { p =>
      struct(lit(p.toLong).as("p"), diffM(s"p$p").as("diff_micro"),
        when(abs(diffM(s"p$p")) >= abs(diffM("obs")), 1L).otherwise(0L)
          .as("extreme"), lit(0L).as("p_value_ppm"))
    }
    val nExtreme = (1 to PERM_P).map(p =>
      when(abs(diffM(s"p$p")) >= abs(diffM("obs")), 1L).otherwise(0L))
      .reduce(_ + _)
    val obsRow = struct(lit(-1L).as("p"), diffM("obs").as("diff_micro"),
      lit(0L).as("extreme"),
      expr(s"(1 + ${"__ne__"}) * 1000000 div ${PERM_P + 1}")
        .as("p_value_ppm"))
    m.withColumn("__ne__", nExtreme)
      .select(explode(array(rows :+ obsRow: _*)).as("r"))
      .select(col("r.p").as("p"), col("r.diff_micro").as("diff_micro"),
        col("r.extreme").as("extreme"),
        col("r.p_value_ppm").as("p_value_ppm"))
  }

  lazy val q400Sql: String = {
    val bits = (1 to PERM_P).map(p =>
      s"(ascii(substr(md5('perm$p:' || CAST(user_id AS VARCHAR)), 1, 1))"
        + s" % 2) AS b$p").mkString(",\n      |    ")
    val aggs = (Seq("obs") ++ (1 to PERM_P).map(p => s"p$p")).map { tag =>
      val arm = if (tag == "obs") "obs_arm" else s"b${tag.drop(1)}"
      s"""CAST(sum(CASE WHEN $arm = 0 THEN spend END) AS BIGINT)
        |      AS s0_$tag,
        |    CAST(sum(CASE WHEN $arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0_$tag,
        |    CAST(sum(CASE WHEN $arm = 1 THEN spend END) AS BIGINT)
        |      AS s1_$tag,
        |    CAST(sum(CASE WHEN $arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1_$tag""".stripMargin
    }.mkString(",\n      |    ")
    def diffSql(tag: String) =
      s"CAST(floor((CAST(s0_$tag AS DOUBLE) / CAST(n0_$tag AS DOUBLE) " +
        s"- CAST(s1_$tag AS DOUBLE) / CAST(n1_$tag AS DOUBLE)) * 1e6 " +
        s"+ 0.5) AS BIGINT)"
    val permRows = (1 to PERM_P).map { p =>
      s"""SELECT $p AS p, ${diffSql(s"p$p")} AS diff_micro,
        |  CAST(CASE WHEN abs(${diffSql(s"p$p")})
        |    >= abs(${diffSql("obs")}) THEN 1 ELSE 0 END AS BIGINT)
        |    AS extreme,
        |  CAST(0 AS BIGINT) AS p_value_ppm
        |FROM m""".stripMargin
    }.mkString("\n      |UNION ALL\n      |")
    val ext = (1 to PERM_P).map(p =>
      s"CASE WHEN abs(${diffSql(s"p$p")}) >= abs(${diffSql("obs")}) " +
        "THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH pu AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS spend,
      |    user_id % 2 AS obs_arm
      |  FROM events GROUP BY 1),
      |pb AS (
      |  SELECT *,
      |    $bits
      |  FROM pu),
      |m AS (
      |  SELECT
      |    $aggs
      |  FROM pb)
      |SELECT * FROM (
      |$permRows
      |UNION ALL
      |SELECT -1, ${diffSql("obs")}, CAST(0 AS BIGINT),
      |  CAST((1 + ($ext)) * 1000000 // ${PERM_P + 1} AS BIGINT)
      |FROM m)
      |ORDER BY p""".stripMargin
  }

  /** q401: WINSORIZED WELCH TEST — the robust A/B mean test: clip
    * both arms at the POOLED discrete p05/p95 cuts (actual data
    * values from the cents grid, the q370/q376 idiom — so both
    * engines clip identically), then Welch's t with the
    * Welch–Satterthwaite df on the clipped values. This is the test
    * teams actually ship when heavy spenders would otherwise hand the
    * decision to three users; q98 is its fragile unclipped sibling.
    * All moments are exact BIGINTs of clipped cents; t and df are one
    * double expression.
    */
  def q401WinsorWelch(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val base = Tables(spark, dir).events
      .select((col("user_id") % 2).as("arm"), cents.as("v"))
    val grid = base.groupBy("v").agg(count(lit(1)).as("t"))
    // distributed running sum over the cents grid (|distinct cents|
    // scales with the data — no ORDER-BY-only window)
    val cum = graft.operators.GlobalRank
      .withRunningSum(grid, "cum", col("t"), col("v"))
    val n = grid.agg(sum("t").as("n"))
    val cuts = cum.crossJoin(broadcast(n))
      .agg(min(when(col("cum") * 20 >= col("n"), col("v"))).as("lo"),
        min(when(col("cum") * 20 >= col("n") * 19, col("v"))).as("hi"))
    val clipped = base.crossJoin(broadcast(cuts))
      .select(col("arm"),
        least(greatest(col("v"), col("lo")), col("hi")).as("w"),
        col("lo"), col("hi"))
    val m = clipped.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("w").as("s"),
        sum(col("w") * col("w")).as("ss"),
        max("lo").as("lo"), max("hi").as("hi"))
    def d(c: Column) = c.cast("double")
    val p = m.agg(
      max(when(col("arm") === 0, col("n"))).as("n0"),
      max(when(col("arm") === 0, col("s"))).as("s0"),
      max(when(col("arm") === 0, col("ss"))).as("ss0"),
      max(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 1, col("s"))).as("s1"),
      max(when(col("arm") === 1, col("ss"))).as("ss1"),
      max("lo").as("lo_cut"), max("hi").as("hi_cut"))
    def mean(s: String, nn: String) = d(col(s)) / d(col(nn))
    def va(ss: String, s: String, nn: String) =
      (d(col(ss)) - d(col(s)) * d(col(s)) / d(col(nn))) /
        (d(col(nn)) - lit(1.0d))
    val v0 = va("ss0", "s0", "n0"); val v1 = va("ss1", "s1", "n1")
    val se2 = v0 / d(col("n0")) + v1 / d(col("n1"))
    val t = (mean("s0", "n0") - mean("s1", "n1")) / sqrt(se2)
    val df = se2 * se2 /
      (v0 * v0 / (d(col("n0")) * d(col("n0")) * (d(col("n0")) - lit(1.0d))) +
        v1 * v1 / (d(col("n1")) * d(col("n1")) * (d(col("n1")) - lit(1.0d))))
    p.select(col("n0").as("n_a"), col("n1").as("n_b"),
      col("lo_cut"), col("hi_cut"),
      floor((mean("s0", "n0") - mean("s1", "n1")) * lit(1e6) + lit(0.5))
        .cast("long").as("diff_micro"),
      floor(t * lit(1e6) + lit(0.5)).cast("long").as("t_micro"),
      floor(df * lit(1e6) + lit(0.5)).cast("long").as("df_micro"))
  }

  val q401Sql: String =
    """WITH base AS (
      |  SELECT user_id % 2 AS arm,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      |  FROM events),
      |grid AS (SELECT v, CAST(count(*) AS BIGINT) AS t
      |         FROM base GROUP BY 1),
      |cum AS (
      |  SELECT *, CAST(sum(t) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum
      |  FROM grid),
      |n AS (SELECT CAST(sum(t) AS BIGINT) AS n FROM grid),
      |cuts AS (
      |  SELECT CAST(min(CASE WHEN cum * 20 >= n.n THEN v END) AS BIGINT)
      |      AS lo,
      |    CAST(min(CASE WHEN cum * 20 >= n.n * 19 THEN v END) AS BIGINT)
      |      AS hi
      |  FROM cum, n),
      |clipped AS (
      |  SELECT arm, least(greatest(v, cuts.lo), cuts.hi) AS w,
      |    cuts.lo, cuts.hi
      |  FROM base, cuts),
      |m AS (
      |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(w) AS BIGINT) AS s, CAST(sum(w * w) AS BIGINT) AS ss,
      |    CAST(max(lo) AS BIGINT) AS lo, CAST(max(hi) AS BIGINT) AS hi
      |  FROM clipped GROUP BY 1),
      |p AS (
      |  SELECT
      |    CAST(max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
      |    CAST(max(CASE WHEN arm = 0 THEN s END) AS BIGINT) AS s0,
      |    CAST(max(CASE WHEN arm = 0 THEN ss END) AS BIGINT) AS ss0,
      |    CAST(max(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
      |    CAST(max(CASE WHEN arm = 1 THEN s END) AS BIGINT) AS s1,
      |    CAST(max(CASE WHEN arm = 1 THEN ss END) AS BIGINT) AS ss1,
      |    CAST(max(lo) AS BIGINT) AS lo_cut,
      |    CAST(max(hi) AS BIGINT) AS hi_cut
      |  FROM m)
      |SELECT n0 AS n_a, n1 AS n_b, lo_cut, hi_cut,
      |  CAST(floor((CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |    - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS diff_micro,
      |  CAST(floor((CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |    - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
      |    sqrt((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) *
      |        CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
      |      (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE) +
      |      (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) *
      |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
      |      (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS t_micro,
      |  CAST(floor(
      |    ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) *
      |        CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
      |      (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE) +
      |     (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) *
      |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
      |      (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)) *
      |    ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) *
      |        CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
      |      (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE) +
      |     (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) *
      |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
      |      (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)) /
      |    ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) *
      |        CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
      |      (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE) *
      |     ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) *
      |        CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
      |      (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE)) /
      |      (CAST(n0 AS DOUBLE) - 1.0) +
      |     (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) *
      |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
      |      (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE) *
      |     ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) *
      |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
      |      (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)) /
      |      (CAST(n1 AS DOUBLE) - 1.0)) * 1e6 + 0.5) AS BIGINT)
      |    AS df_micro
      |FROM p""".stripMargin

  /** q403 report cut: the shrinkage table reports the K highest-n
    * users (TakeOrdered — never a global sort). */
  val JS_TOP_K = 20

  /** q403: EMPIRICAL-BAYES (JAMES–STEIN) SHRINKAGE of per-user mean
    * spend — the smoothing every ranking/CTR system applies before
    * trusting a small-n mean: the normal-normal model shrinks each
    * user's mean toward the grand mean with λ_u = τ²/(τ² + σ²/n_u),
    * where σ² is the pooled WITHIN-user variance and τ² the
    * method-of-moments BETWEEN-user variance (clamped at 0). Both
    * hyperparameters come from exact BIGINT moments (per-user s²/n
    * quantized to the unit grid — the q372/q369 rule); the output is
    * the '_hyper' row plus the [[JS_TOP_K]] highest-n users with raw
    * mean, λ, and the shrunken estimate.
    */
  def q403JamesStein(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val g = Tables(spark, dir).events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(cents).as("s"),
        sum(cents * cents).as("ss"))
    def d(c: Column) = c.cast("double")
    // per-user terms quantized BEFORE any cross-user sum (the
    // q372/q369 rule): s²/n to the unit grid, the user mean to whole
    // cents, 1/n to the pico grid — no cross-row double sum exists
    val terms = g.select(col("user_id"), col("n"), col("s"), col("ss"),
      floor(d(col("s")) * d(col("s")) / d(col("n")) + lit(0.5))
        .cast("long").as("aq"),
      floor(d(col("s")) / d(col("n")) + lit(0.5)).cast("long").as("xbu"),
      floor(lit(1e12) / d(col("n")) + lit(0.5)).cast("long").as("hq"))
      .localCheckpoint(true)
    val tot = terms.agg(count(lit(1)).as("m"), sum("n").as("nn"),
      sum("ss").as("sstot"), sum("aq").as("a_unit"),
      sum("hq").as("hp12"), sum("xbu").as("sxb"),
      sum(col("xbu") * col("xbu")).as("sxb2"))
    val sig2 = (d(col("sstot")) - d(col("a_unit"))) /
      (d(col("nn")) - d(col("m")))
    val sB = (d(col("sxb2")) - d(col("sxb")) * d(col("sxb")) /
      d(col("m"))) / (d(col("m")) - lit(1.0d))
    val tau2 = greatest(lit(0.0d),
      sB - sig2 * (d(col("hp12")) / lit(1e12)) / d(col("m")))
    val hp = tot.select(col("m"), sig2.as("sig2"),
      (d(col("sxb")) / d(col("m"))).as("gmean"), tau2.as("tau2"))
    val topUsers = terms.orderBy(col("n").desc, col("user_id"))
      .limit(JS_TOP_K)
    val rows = topUsers.crossJoin(broadcast(hp))
      .select(col("user_id"), col("n"),
        floor(d(col("s")) / d(col("n")) * lit(1e6) + lit(0.5))
          .cast("long").as("mean_micro"),
        floor(col("tau2") / (col("tau2") + col("sig2") / d(col("n"))) *
          lit(1e6) + lit(0.5)).cast("long").as("lambda_micro"),
        floor((col("tau2") / (col("tau2") + col("sig2") / d(col("n"))) *
          (d(col("s")) / d(col("n"))) +
          (lit(1.0d) - col("tau2") /
            (col("tau2") + col("sig2") / d(col("n")))) * col("gmean")) *
          lit(1e6) + lit(0.5)).cast("long").as("shrunk_micro"))
    val hyperRow = hp.select(lit(-1L).as("user_id"),
      col("m").as("n"),
      floor(col("gmean") * lit(1e6) + lit(0.5)).cast("long")
        .as("mean_micro"),
      floor(col("sig2") + lit(0.5)).cast("long").as("lambda_micro"),
      floor(col("tau2") + lit(0.5)).cast("long").as("shrunk_micro"))
    rows.unionByName(hyperRow)
  }

  lazy val q403Sql: String =
    s"""WITH g AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS s,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) *
      |             CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS ss
      |  FROM events GROUP BY 1),
      |terms AS (
      |  SELECT *,
      |    CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |      CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS aq,
      |    CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5)
      |      AS BIGINT) AS xbu,
      |    CAST(floor(1e12 / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS hq
      |  FROM g),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(n) AS BIGINT) AS nn,
      |    CAST(sum(ss) AS BIGINT) AS sstot,
      |    CAST(sum(aq) AS BIGINT) AS a_unit,
      |    CAST(sum(hq) AS BIGINT) AS hp12,
      |    CAST(sum(xbu) AS BIGINT) AS sxb,
      |    CAST(sum(xbu * xbu) AS BIGINT) AS sxb2
      |  FROM terms),
      |hp AS (
      |  SELECT m,
      |    (CAST(sstot AS DOUBLE) - CAST(a_unit AS DOUBLE)) /
      |      (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE)) AS sig2,
      |    CAST(sxb AS DOUBLE) / CAST(m AS DOUBLE) AS gmean,
      |    greatest(0.0, (CAST(sxb2 AS DOUBLE) - CAST(sxb AS DOUBLE) *
      |        CAST(sxb AS DOUBLE) / CAST(m AS DOUBLE)) /
      |      (CAST(m AS DOUBLE) - 1.0) -
      |      (CAST(sstot AS DOUBLE) - CAST(a_unit AS DOUBLE)) /
      |        (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE)) *
      |        (CAST(hp12 AS DOUBLE) / 1e12) / CAST(m AS DOUBLE))
      |      AS tau2
      |  FROM tot),
      |top AS (
      |  SELECT * FROM terms ORDER BY n DESC, user_id LIMIT $JS_TOP_K)
      |SELECT t.user_id, t.n,
      |  CAST(floor(CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) * 1e6
      |    + 0.5) AS BIGINT) AS mean_micro,
      |  CAST(floor(hp.tau2 / (hp.tau2 + hp.sig2 / CAST(t.n AS DOUBLE))
      |    * 1e6 + 0.5) AS BIGINT) AS lambda_micro,
      |  CAST(floor((hp.tau2 / (hp.tau2 + hp.sig2 / CAST(t.n AS DOUBLE))
      |      * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
      |    + (1.0 - hp.tau2 / (hp.tau2 + hp.sig2 / CAST(t.n AS DOUBLE)))
      |      * hp.gmean) * 1e6 + 0.5) AS BIGINT) AS shrunk_micro
      |FROM top t, hp
      |UNION ALL
      |SELECT -1, m,
      |  CAST(floor(gmean * 1e6 + 0.5) AS BIGINT),
      |  CAST(floor(sig2 + 0.5) AS BIGINT),
      |  CAST(floor(tau2 + 0.5) AS BIGINT)
      |FROM hp
      |ORDER BY user_id""".stripMargin

  /** q404: McNEMAR'S PAIRED TEST — q378's kappa asks "do the two
    * quality raters AGREE"; McNemar asks the sharper question a model
    * comparison needs: "when they disagree, is one SYSTEMATICALLY
    * stricter?" — only the discordant cells matter, χ² = (b−c)²/(b+c)
    * (with the continuity correction as a second column). This is THE
    * test for comparing two classifiers on the same examples; four
    * BIGINT cells from one scan, χ² one double expression.
    */
  def q404McNemar(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(
        when(col("n_chars") >= KAPPA_LEN_CUT, 1L).otherwise(0L).as("a"),
        when(size(TextFunctions.tokens(col("text"))) >= KAPPA_TOK_CUT, 1L)
          .otherwise(0L).as("b"))
    val cnt = docs.agg(count(lit(1)).as("n"),
      sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
        .as("b_only"),
      sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L))
        .as("c_only"))
    def d(c: String) = col(c).cast("double")
    val chi = (d("b_only") - d("c_only")) * (d("b_only") - d("c_only")) /
      (d("b_only") + d("c_only"))
    val chiCc = (abs(d("b_only") - d("c_only")) - lit(1.0d)) *
      (abs(d("b_only") - d("c_only")) - lit(1.0d)) /
      (d("b_only") + d("c_only"))
    cnt.select(col("n").as("n_docs"), col("b_only"), col("c_only"),
      floor(chi * lit(1e6) + lit(0.5)).cast("long").as("chi2_micro"),
      floor(chiCc * lit(1e6) + lit(0.5)).cast("long")
        .as("chi2_cc_micro"))
  }

  val q404Sql: String =
    s"""WITH r AS (
      |  SELECT
      |    CASE WHEN n_chars >= $KAPPA_LEN_CUT THEN 1 ELSE 0 END AS a,
      |    CASE WHEN len(list_filter(regexp_split_to_array(lower(text),
      |      '\\s+'), t -> t != '')) >= $KAPPA_TOK_CUT THEN 1 ELSE 0 END
      |      AS b
      |  FROM documents),
      |c AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b_only,
      |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c_only
      |  FROM r)
      |SELECT n AS n_docs, b_only, c_only,
      |  CAST(floor((CAST(b_only AS DOUBLE) - CAST(c_only AS DOUBLE)) *
      |    (CAST(b_only AS DOUBLE) - CAST(c_only AS DOUBLE)) /
      |    (CAST(b_only AS DOUBLE) + CAST(c_only AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS chi2_micro,
      |  CAST(floor((abs(CAST(b_only AS DOUBLE) - CAST(c_only AS DOUBLE))
      |      - 1.0) *
      |    (abs(CAST(b_only AS DOUBLE) - CAST(c_only AS DOUBLE)) - 1.0) /
      |    (CAST(b_only AS DOUBLE) + CAST(c_only AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS chi2_cc_micro
      |FROM c""".stripMargin

  /** q368 order statistics in the Hill tail (top-k). */
  val HILL_K = 100

  /** q368: HILL TAIL-INDEX ESTIMATOR — α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎)
    * over the top-k order statistics: the standard heavy-tail
    * diagnostic (α < 2 → infinite variance, sample means are lies;
    * α < 1 → infinite mean). q123 fits a Zipf slope to RANK
    * frequencies and q218 reports Pareto concentration shares; Hill
    * is the ESTIMATOR with known asymptotics that decides whether
    * mean-based stats (q98/q351...) are even defined on this column.
    *
    * Scale shape: the ONLY corpus-sized work is a TakeOrdered top-
    * (k+1) cut (no global sort, no window over the fact table);
    * everything after runs on k+1 rows. Determinism: per-order-
    * statistic ln ratios are micro-quantized BEFORE the k-term sum;
    * α̂ is one integer-fed division.
    */
  def q368HillTail(spark: SparkSession, dir: String): DataFrame = {
    val top = Tables(spark, dir).orders
      .select(col("o_totalprice").as("x"), col("o_orderkey"))
      .orderBy(col("x").desc, col("o_orderkey").asc)
      .limit(HILL_K + 1)
    val w = Window.orderBy(col("x").desc, col("o_orderkey").asc)
    val ranked = top.withColumn("rk", row_number().over(w))
    val xk1 = ranked.filter(col("rk") === HILL_K + 1)
      .select(col("x").as("xk1"))
    ranked.filter(col("rk") <= HILL_K)
      .crossJoin(broadcast(xk1))
      .select(floor(log(col("x") / col("xk1")) * lit(1e6) + lit(0.5))
        .cast("long").as("t"), col("xk1"))
      .groupBy("xk1")
      .agg(count(lit(1)).as("k"), sum("t").as("sum_ln_micro"))
      .select(col("k"),
        floor(col("xk1") * 100 + lit(0.5)).cast("long").as("xk1_c"),
        col("sum_ln_micro"),
        floor(col("k").cast("double") * lit(1e12) /
          col("sum_ln_micro").cast("double") + lit(0.5)).cast("long")
          .as("alpha_micro"))
  }

  val q368Sql: String =
    s"""WITH top AS (
      |  SELECT o_totalprice AS x,
      |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
      |      AS rk
      |  FROM orders
      |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT ${HILL_K + 1}),
      |k1 AS (SELECT x AS xk1 FROM top WHERE rk = ${HILL_K + 1}),
      |t AS (
      |  SELECT CAST(floor(ln(x / xk1) * 1e6 + 0.5) AS BIGINT) AS t, xk1
      |  FROM top CROSS JOIN k1 WHERE rk <= $HILL_K),
      |agg AS (
      |  SELECT xk1, CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(t) AS BIGINT) AS sum_ln_micro
      |  FROM t GROUP BY xk1)
      |SELECT k, CAST(floor(xk1 * 100 + 0.5) AS BIGINT) AS xk1_c,
      |  sum_ln_micro,
      |  CAST(floor(CAST(k AS DOUBLE) * 1e12 /
      |    CAST(sum_ln_micro AS DOUBLE) + 0.5) AS BIGINT) AS alpha_micro
      |FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q349_t_closeness" -> Gate.sorted(q349TCloseness _, "nation", "segment"),
    "q350_bh_fdr" -> Gate.sorted(q350BhFdr _, "event_type", "day"),
    "q358_overdispersion" ->
      Gate.sorted(q358Overdispersion _, "event_type"),
    "q360_cochran_armitage" -> ((s, d) => q360CochranArmitage(s, d)),
    "q368_hill_tail" -> ((s, d) => q368HillTail(s, d)),
    "q369_anova_f" -> ((s, d) => q369AnovaF(s, d)),
    "q372_kruskal_wallis" -> ((s, d) => q372KruskalWallis(s, d)),
    "q373_spearman_rho" -> ((s, d) => q373SpearmanRho(s, d)),
    "q374_kendall_tau" -> ((s, d) => q374KendallTau(s, d)),
    "q376_brown_forsythe" ->
      Gate.sorted(q376BrownForsythe _, "event_type"),
    "q377_cramer_theil" -> ((s, d) => q377CramerTheil(s, d)),
    "q378_cohen_kappa" -> ((s, d) => q378CohenKappa(s, d)),
    "q384_gumbel_fit" -> ((s, d) => q384GumbelFit(s, d)),
    "q387_cluster_deff" -> ((s, d) => q387ClusterDeff(s, d)),
    "q389_sprt" -> Gate.sorted(q389Sprt _, "day"),
    "q390_jonckheere" -> ((s, d) => q390Jonckheere(s, d)),
    "q393_qte" -> Gate.sorted(q393Qte _, "p_label"),
    "q395_cvm_test" -> ((s, d) => q395CramerVonMises(s, d)),
    "q396_obf_interims" -> Gate.sorted(q396ObfInterims _, "k"),
    "q399_delta_ratio" -> ((s, d) => q399DeltaRatio(s, d)),
    "q400_permutation_test" ->
      Gate.sorted(q400PermutationTest _, "p"),
    "q401_winsor_welch" -> ((s, d) => q401WinsorWelch(s, d)),
    "q403_james_stein" -> Gate.sorted(q403JamesStein _, "user_id"),
    "q404_mcnemar" -> ((s, d) => q404McNemar(s, d)),
    "q346_jackknife_ratio" ->
      ((s, d) => q346JackknifeRatio(s, d)),
    "q343_brier_decomposition" ->
      Gate.sorted(q343BrierDecomposition _, "metric"),
    "q333_isotonic_fit" -> Gate.sorted(q333IsotonicFit _, "bin"),
    "q327_sliced_auc" -> Gate.sorted(q327SlicedAuc _, "slice"),
    "q320_split_finder" -> Gate.sorted(q320SplitFinder _, "split_bin"),
    "q321_woe_iv" -> Gate.sorted(q321WoeIv _, "bin"),
    "q226_group_trend" -> Gate.sorted(q226GroupTrend _, "event_type"),
    "q210_ks_drift" -> ((s, d) => q210KsDrift(s, d)),
    "q211_mann_whitney" -> ((s, d) => q211MannWhitney(s, d)),
    "q197_wilson_ci" -> Gate.sorted(q197WilsonCi _, "event_type"),
    "q198_weekday_index" -> Gate.sorted(q198WeekdayIndex _, "weekday"),
    "q188_gap_quantiles" -> Gate.sorted(q188GapQuantiles _, "event_type"),
    "q190_decile_lift" -> Gate.sorted(q190DecileLift _, "decile"),
    "q169_chi2_independence" -> ((s, d) => q169Chi2Independence(s, d)),
    "q157_skew_probe" -> Gate.sorted(q157SkewProbe _, "metric"),
    "q148_bootstrap_ci" -> Gate.sorted(q148BootstrapCi _, "b"),
    "q143_cusum_changepoint" -> Gate.sorted(q143CusumChangepoint _, "day"),
    "q141_mutual_info" -> Gate.sorted(q141MutualInfo _, "event_type", "wd"),
    "q142_gini_spend" -> ((s, d) => q142GiniSpend(s, d)),
    "q134_psi_drift" -> Gate.sorted(q134PsiDrift _, "bin"),
    "q135_calibration_bins" -> Gate.sorted(q135CalibrationBins _, "bin"),
    "q128_logreg_step" -> Gate.sorted(q128LogregStep _, "dim"),
    "q121_corr_matrix" -> Gate.sorted(q121CorrMatrix _, "col_a", "col_b"),
    "q123_zipf_slope" -> ((s, d) => q123ZipfSlope(s, d)),
    "q125_private_release" -> Gate.sorted(q125PrivateRelease _, "event_type", "day"),
    "q409_randomized_response" ->
      Gate.sorted(q409RandomizedResponse _, "n_users"),
    "q279_k_anonymity" -> Gate.sorted(q279KAnonymity _, "nation"),
    "q299_l_diversity" -> Gate.sorted(q299LDiversity _, "nation", "segment"),
    "q301_trend_test" -> Gate.sorted(q301TrendTest _, "prio"),
    "q136_roc_auc" -> ((s, d) => q136RocAuc(s, d)),
    "q137_pr_thresholds" -> Gate.sorted(q137PrThresholds _, "threshold_micro"))

  val oracles: Map[String, String] = Map(
    "q349_t_closeness" -> q349Sql,
    "q350_bh_fdr" -> q350Sql,
    "q358_overdispersion" -> q358Sql,
    "q360_cochran_armitage" -> q360Sql,
    "q368_hill_tail" -> q368Sql,
    "q369_anova_f" -> q369Sql,
    "q372_kruskal_wallis" -> q372Sql,
    "q373_spearman_rho" -> q373Sql,
    "q374_kendall_tau" -> q374Sql,
    "q376_brown_forsythe" -> q376Sql,
    "q377_cramer_theil" -> q377Sql,
    "q378_cohen_kappa" -> q378Sql,
    "q384_gumbel_fit" -> q384Sql,
    "q387_cluster_deff" -> q387Sql,
    "q389_sprt" -> q389Sql,
    "q390_jonckheere" -> q390Sql,
    "q393_qte" -> q393Sql,
    "q395_cvm_test" -> q395Sql,
    "q396_obf_interims" -> q396Sql,
    "q399_delta_ratio" -> q399Sql,
    "q400_permutation_test" -> q400Sql,
    "q401_winsor_welch" -> q401Sql,
    "q403_james_stein" -> q403Sql,
    "q404_mcnemar" -> q404Sql,
    "q346_jackknife_ratio" -> q346Sql,
    "q343_brier_decomposition" -> q343Sql,
    "q333_isotonic_fit" -> q333Sql,
    "q327_sliced_auc" -> q327Sql,
    "q320_split_finder" -> q320Sql,
    "q321_woe_iv" -> q321Sql,
    "q226_group_trend" -> q226Sql,
    "q210_ks_drift" -> q210Sql,
    "q211_mann_whitney" -> q211Sql,
    "q197_wilson_ci" -> q197Sql,
    "q198_weekday_index" -> q198Sql,
    "q188_gap_quantiles" -> q188Sql,
    "q190_decile_lift" -> q190Sql,
    "q169_chi2_independence" -> q169Sql,
    "q157_skew_probe" -> q157Sql,
    "q148_bootstrap_ci" -> q148Sql,
    "q143_cusum_changepoint" -> q143Sql,
    "q141_mutual_info" -> q141Sql,
    "q142_gini_spend" -> q142Sql,
    "q134_psi_drift" -> q134Sql,
    "q135_calibration_bins" -> q135Sql,
    "q128_logreg_step" -> q128Sql,
    "q121_corr_matrix" -> q121Sql,
    "q123_zipf_slope" -> q123Sql,
    "q125_private_release" -> q125Sql,
    "q409_randomized_response" -> q409Sql,
    "q279_k_anonymity" -> q279Sql,
    "q299_l_diversity" -> q299Sql,
    "q301_trend_test" -> q301Sql,
    "q136_roc_auc" -> q136Sql,
    "q137_pr_thresholds" -> q137Sql)
}
