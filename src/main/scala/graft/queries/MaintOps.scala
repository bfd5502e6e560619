package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 6: lakehouse-maintenance planning and two feature/
  * ranking transforms.
  */
object MaintOps {

  /** q179 compaction target: bytes per output bin (64 KB at test
    * scale; the same plan runs with 128 MB bins in production).
    */
  val COMPACT_TARGET = 64L * 1024L

  /** q179: SMALL-FILE COMPACTION PLAN — the OPTIMIZE pass every
    * lakehouse table needs: given per-file sizes (here: per-order
    * lineitem byte estimates standing in for data files), assign files
    * to merge bins so each bin approaches the target size. The
    * assignment is the deterministic running-sum rule: files ordered
    * by key, bin = floor(exclusive-prefix-sum / target) — one window
    * pass, no driver loop, reproducible on any cluster. The window is
    * global but its input is the FILE MANIFEST, not data rows — 1e5-1e6
    * entries even at 100 TB — so the single-partition sort is metadata-
    * sized. Emits the bin manifest (bin, n_files, bytes) a rewrite job
    * would execute.
    */
  def q179CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables(spark, dir).lineitem
      .groupBy(col("l_orderkey").as("file_id"))
      .agg(sum(floor(col("l_extendedprice")).cast("long")).as("bytes"))
    val w = Window.orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("bin",
        (coalesce(sum("bytes").over(w), lit(0L)) / COMPACT_TARGET)
          .cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bin_bytes"))
  }

  val q179Sql: String =
    s"""WITH f AS (
      |  SELECT l_orderkey AS file_id,
      |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS bytes
      |  FROM lineitem GROUP BY 1),
      |b AS (
      |  SELECT file_id, bytes,
      |    COALESCE(sum(bytes) OVER (ORDER BY file_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      // $COMPACT_TARGET AS bin
      |  FROM f)
      |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_files,
      |  CAST(sum(bytes) AS BIGINT) AS bin_bytes
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** q180: TOP-K PER GROUP WITH TIES — dense_rank <= 3 keeps ALL parts
    * tied at a kept price (q07's row_number arbitrarily drops
    * co-priced rows; this is the semantics a "top 3 price points per
    * brand" report actually wants). Same single window pass as q07.
    */
  def q180DenseTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("price_c").desc)
    Tables(spark, dir).part
      .select(col("p_brand"), col("p_partkey"),
        floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
          .as("price_c"))
      .withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 3)
      .select("p_brand", "rk", "price_c", "p_partkey")
  }

  val q180Sql: String =
    """WITH r AS (
      |  SELECT p_brand, p_partkey,
      |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
      |    CAST(dense_rank() OVER (PARTITION BY p_brand
      |      ORDER BY CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) DESC)
      |      AS INTEGER) AS rk
      |  FROM part)
      |SELECT p_brand, rk, price_c, p_partkey
      |FROM r WHERE rk <= 3
      |ORDER BY p_brand, rk, p_partkey""".stripMargin

  /** q181: CDF / PERCENTILE-RANK NORMALIZATION — the monotone feature
    * transform (empirical CDF in permille) for a bounded-domain column:
    * quantity's ~50 distinct values per flag mean the CDF table is
    * tiny, so the big table contributes ONE count aggregate and the
    * running sum + permille division run on the |flags| x |values|
    * rollup. cume_dist() over the raw rows would range-sort the whole
    * fact table for the identical result.
    */
  def q181CdfNormalize(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"),
        floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("qty_c"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("l_returnflag").orderBy("qty_c")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("l_returnflag")
    counts
      .withColumn("cum", sum("n").over(w))
      .withColumn("tot", sum("n").over(wAll))
      .select(col("l_returnflag"), col("qty_c"), col("n"),
        floor(col("cum") * lit(1000) / col("tot")).cast("long")
          .as("cdf_permille"))
  }

  val q181Sql: String =
    """WITH c AS (
      |  SELECT l_returnflag,
      |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
      |    count(*) AS n
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, qty_c, n,
      |  CAST(floor(sum(n) OVER (PARTITION BY l_returnflag ORDER BY qty_c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000.0 /
      |    sum(n) OVER (PARTITION BY l_returnflag)) AS BIGINT) AS cdf_permille
      |FROM c ORDER BY l_returnflag, qty_c""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_compaction_plan" -> Gate.sorted(q179CompactionPlan _, "bin"),
    "q180_dense_topk" ->
      Gate.sorted(q180DenseTopk _, "p_brand", "rk", "p_partkey"),
    "q181_cdf_normalize" ->
      Gate.sorted(q181CdfNormalize _, "l_returnflag", "qty_c"))

  val oracles: Map[String, String] = Map(
    "q179_compaction_plan" -> q179Sql,
    "q180_dense_topk" -> q180Sql,
    "q181_cdf_normalize" -> q181Sql)
}
