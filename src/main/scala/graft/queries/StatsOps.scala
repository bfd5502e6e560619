package graft.queries

import graft.Tables
import graft.functions.{Exact, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * correlations from a single aggregate over the fact table (4 sums,
    * 4 sums of squares, 6 cross sums, one count — 15 partial-agg
    * columns in ONE map-side-combined pass), in contrast to
    * df.stat.corr which scans once PER PAIR. All moments are exact
    * DECIMAL(18,4) sums (2-decimal inputs make every product exact at
    * scale 4 — the Exact contract), so the double-space correlation
    * formula evaluates bit-identically in both engines; results are
    * quantized to integer micro-units. The matrix rows are exploded
    * from the single 1-row aggregate — no second scan, no join.
    */
  def q121CorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val pairs = for {
      i <- CORR_COLS.indices; j <- CORR_COLS.indices if i <= j
    } yield (i, j)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        CORR_COLS.zipWithIndex.map { case (c, i) =>
          sum(Exact.dec(col(c))).cast("double").as(s"s$i")
        } ++
        pairs.map { case (i, j) =>
          sum(Exact.dec(col(CORR_COLS(i)) * col(CORR_COLS(j))))
            .cast("double").as(s"s${i}_$j")
        }
    val m = Tables(spark, dir).lineitem
      .select(CORR_COLS.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val entries = pairs.filter { case (i, j) => i < j }.map { case (i, j) =>
      struct(
        lit(CORR_COLS(i)).as("col_a"), lit(CORR_COLS(j)).as("col_b"),
        floor((col("n") * col(s"s${i}_$j") - col(s"s$i") * col(s"s$j")) /
          (sqrt(col("n") * col(s"s${i}_$i") - col(s"s$i") * col(s"s$i")) *
            sqrt(col("n") * col(s"s${j}_$j") - col(s"s$j") * col(s"s$j")))
          * lit(1e6) + lit(0.5)).cast("long").as("corr_micro"))
    }
    m.select(col("n"), explode(array(entries: _*)).as("e"))
      .select(col("e.col_a").as("col_a"), col("e.col_b").as("col_b"),
        col("n"), col("e.corr_micro").as("corr_micro"))
  }

  val q121Sql: String = {
    val sums =
      CORR_COLS.zipWithIndex.map { case (c, i) =>
        s"${Exact.sumSql(c)} AS s$i"
      } ++ (for {
        i <- CORR_COLS.indices; j <- CORR_COLS.indices if i <= j
      } yield s"${Exact.sumSql(s"${CORR_COLS(i)} * ${CORR_COLS(j)}")} AS s${i}_$j")
    val rows = (for {
      i <- CORR_COLS.indices; j <- CORR_COLS.indices if i < j
    } yield
      s"""SELECT '${CORR_COLS(i)}' AS col_a, '${CORR_COLS(j)}' AS col_b, n,
         |  CAST(floor((n*s${i}_$j - s$i*s$j)
         |    / (sqrt(n*s${i}_$i - s$i*s$i) * sqrt(n*s${j}_$j - s$j*s$j))
         |    * 1e6 + 0.5) AS BIGINT) AS corr_micro FROM m""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    s"""WITH m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    ${sums.mkString(",\n    ")}
      |  FROM lineitem)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_corr_matrix" -> Gate.sorted(q121CorrMatrix _, "col_a", "col_b"),
    "q123_zipf_slope" -> ((s, d) => q123ZipfSlope(s, d)))

  val oracles: Map[String, String] = Map(
    "q121_corr_matrix" -> q121Sql,
    "q123_zipf_slope" -> q123Sql)
}
