package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin accessors for the driver-generated test tables (TESTDATA.md).
  *
  * Every accessor is a plain parquet scan — Catalyst pushes filters and
  * prunes columns down to the scan, so callers should NOT pre-select or
  * cache here. At production scale these would be partitioned tables;
  * the API surface is identical.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; the session must set
    * spark.sql.legacy.parquet.nanosAsLong=true (GraftSession does) so
    * the scan yields nanos as long, truncated here to a microsecond
    * timestamp (matches DuckDB's ns->us truncation). The accessor
    * itself is side-effect-free.
    */
  def events: DataFrame = {
    val raw = t("events")
    import org.apache.spark.sql.functions._
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
