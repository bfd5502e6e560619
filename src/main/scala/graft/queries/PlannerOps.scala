package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 batch 8 (non-streaming half): optimizer-statistic and
  * sampling operators.
  */
object PlannerOps {

  /** q186: SELF-JOIN CARDINALITY ESTIMATE — the cost-based-optimizer
    * statistic behind join planning (and the companion to q157's skew
    * probe): for an equi self-join of events on user_id, the EXACT
    * output cardinality is sum(c_k^2) over the key histogram, the hot
    * key contributes max(c_k)^2 of it, and their ratio is the skew
    * share that decides plain vs salted (q120) execution. ONE
    * map-side-combined count plus a one-row aggregate — the estimate
    * costs a scan, not the join.
    */
  def q186JoinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables(spark, dir).events
      .groupBy("user_id").agg(count(lit(1)).as("c"))
    hist.agg(
        count(lit(1)).as("n_keys"),
        sum("c").as("n_rows"),
        sum(col("c") * col("c")).as("join_rows"),
        max("c").as("max_key_rows"))
      .select(col("n_keys"), col("n_rows"), col("join_rows"),
        col("max_key_rows"),
        floor(col("max_key_rows") * col("max_key_rows") * lit(1e6) /
          col("join_rows") + lit(0.5)).cast("long").as("skew_share_micro"))
  }

  val q186Sql: String =
    """WITH h AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
      |SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
      |  CAST(sum(c * c) AS BIGINT) AS join_rows,
      |  CAST(max(c) AS BIGINT) AS max_key_rows,
      |  CAST(floor(max(c) * max(c) * 1e6 / sum(c * c) + 0.5) AS BIGINT)
      |    AS skew_share_micro
      |FROM h""".stripMargin

  /** q187 sample size per stratum. */
  val STRATUM_N = 20

  /** q187: FIXED-N STRATIFIED SAMPLE — exactly N docs per language,
    * chosen DETERMINISTICALLY by md5(doc_id) rank (the same
    * seeded-hash idiom as q25's fractional split, but with an exact
    * per-stratum count, which a Bernoulli fraction cannot guarantee).
    * One window per stratum; reproducible on any cluster and any
    * partitioning, so training sets built from it are byte-stable.
    */
  def q187StratifiedFixedN(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables(spark, dir).documents
      .select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= STRATUM_N)
      .select("lang", "rk", "doc_id")
  }

  val q187Sql: String =
    s"""WITH r AS (
      |  SELECT lang, doc_id,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      |  FROM documents)
      |SELECT lang, rk, doc_id FROM r WHERE rk <= $STRATUM_N
      |ORDER BY lang, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q186_join_cardinality" -> ((s, d) => q186JoinCardinality(s, d)),
    "q187_stratified_fixed_n" -> Gate.sorted(q187StratifiedFixedN _, "lang", "rk"))

  val oracles: Map[String, String] = Map(
    "q186_join_cardinality" -> q186Sql,
    "q187_stratified_fixed_n" -> q187Sql)
}
