package graft.queries

import graft.Tables
import graft.operators.{DistributedQuantile, ZOrderLayout}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 promotions: two components that until now were spec-only
  * (DistributedQuantileSpec, ZOrderLayoutSpec) exposed through
  * oracle-gated queries, so the driver's DuckDB gate proves their
  * semantics too, not just the Scala specs.
  */
object LayoutOps {

  /** q165: EXACT GROUPED QUANTILES via the bucket-prune operator — the
    * `quantile_cont` p25/p50/p75 of l_extendedprice per return flag,
    * computed WITHOUT a per-group total sort (see
    * operators/DistributedQuantile.scala: histogram locate + survivor-
    * only local sort; nothing sorts more than ~1/256 of a group). The
    * oracle is DuckDB's own quantile_cont — the operator's
    * `lo + (hi-lo)*frac` interpolation on `(n-1)*q` ranks is the same
    * arithmetic, so doubles match bit-for-bit.
    */
  def q165GroupQuantiles(spark: SparkSession, dir: String): DataFrame =
    DistributedQuantile.quantiles(
      Tables(spark, dir).lineitem.select("l_returnflag", "l_extendedprice"),
      Seq("l_returnflag"), "l_extendedprice",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))

  val q165Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.25) AS p25,
      |  quantile_cont(l_extendedprice, 0.50) AS p50,
      |  quantile_cont(l_extendedprice, 0.75) AS p75
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** q166 z-key normalization bounds — fixed literals shared with the
    * oracle (at production scale these come from table stats).
    */
  val PRICE_LO = 900.0; val PRICE_HI = 1000.0
  val SIZE_LO = 0.0; val SIZE_HI = 64.0

  /** q166: MORTON-KEY PROFILE — the z-order clustering key
    * (operators/ZOrderLayout.scala) computed for every part from
    * (p_retailprice, p_size) and profiled per brand (count, min, max,
    * sum). Gating the KEY VALUES proves the shift-or-mask spread
    * ladder and the rank normalization are exactly the documented
    * Morton interleave — the oracle replicates the ladder in SQL bit
    * ops. Zero shuffle beyond the tiny brand rollup; the expression is
    * pure codegen'd column arithmetic (no UDF).
    */
  def q166ZorderProfile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .select(col("p_brand"),
        ZOrderLayout.zkey(
          ZOrderLayout.rank16(col("p_retailprice"), PRICE_LO, PRICE_HI),
          ZOrderLayout.rank16(col("p_size"), SIZE_LO, SIZE_HI)).as("z"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), min("z").as("z_min"),
        max("z").as("z_max"), sum("z").as("z_sum"))

  val q166Sql: String = {
    def rank16(v: String, lo: Double, hi: Double): String =
      s"least(65535, greatest(0, CAST(floor((($v - $lo) / ${hi - lo}) * 65536.0) AS BIGINT)))"
    val ra = rank16("p_retailprice", PRICE_LO, PRICE_HI)
    val rb = rank16("CAST(p_size AS DOUBLE)", SIZE_LO, SIZE_HI)
    // One CTE per shift-or-mask ladder step, both lanes carried
    // side-by-side so the row pairing stays intact.
    s"""WITH r AS (
       |  SELECT p_brand, ($ra) AS a, ($rb) AS b FROM part),
       |s1 AS (SELECT p_brand,
       |  ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
       |  FROM r),
       |s2 AS (SELECT p_brand,
       |  ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
       |  FROM s1),
       |s3 AS (SELECT p_brand,
       |  ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
       |  FROM s2),
       |s4 AS (SELECT p_brand,
       |  ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
       |  FROM s3),
       |z AS (SELECT p_brand, (a | (b << 1)) AS z FROM s4)
       |SELECT p_brand, count(*) AS n,
       |  CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max,
       |  CAST(sum(z) AS BIGINT) AS z_sum
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q174: WEIGHTED MEDIAN per group through
    * operators/DistributedQuantile.weightedCrossing — the first
    * l_extendedprice whose quantity-weighted cumulative mass reaches
    * half the group total (the same crossing machinery as the astro
    * half-mass radius q12, here DuckDB-gated on the warehouse tables).
    * Bucket histogram + survivor-only fine pass; weights aggregate in
    * DECIMAL so prefix sums are exact and the crossing value is
    * partitioning-independent.
    */
  def q174WeightedMedian(spark: SparkSession, dir: String): DataFrame =
    DistributedQuantile.weightedCrossing(
      Tables(spark, dir).lineitem
        .select("l_returnflag", "l_extendedprice", "l_quantity",
          "l_orderkey", "l_linenumber"),
      Seq("l_returnflag"), "l_extendedprice",
      Seq("l_orderkey", "l_linenumber"),
      col("l_quantity"), scale = 2)

  val q174Sql: String =
    """WITH w AS (
      |  SELECT l_returnflag, l_extendedprice AS v,
      |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS wc
      |  FROM lineitem),
      |c AS (
      |  SELECT l_returnflag, v,
      |    sum(wc) OVER (PARTITION BY l_returnflag ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    sum(wc) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM w)
      |SELECT l_returnflag, min(v) AS crossing
      |FROM c WHERE cw * 2 >= tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_group_quantiles" -> Gate.sorted(q165GroupQuantiles _, "l_returnflag"),
    "q166_zorder_profile" -> Gate.sorted(q166ZorderProfile _, "p_brand"),
    "q174_weighted_median" -> Gate.sorted(q174WeightedMedian _, "l_returnflag"))

  val oracles: Map[String, String] = Map(
    "q165_group_quantiles" -> q165Sql,
    "q166_zorder_profile" -> q166Sql,
    "q174_weighted_median" -> q174Sql)
}
