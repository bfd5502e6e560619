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
  def orders: DataFrame = Tables.normalizeTs(t("orders"), "o_orderdate")
  def lineitem: DataFrame = Tables.normalizeTs(t("lineitem"), "l_shipdate")

  /** Schema-adaptive `ts` normalization: upstream test data has shipped
    * `events.ts` both as parquet TIMESTAMP(NANOS) (surfaced as a nanos
    * long under spark.sql.legacy.parquet.nanosAsLong, which GraftSession
    * sets and which is harmless for other encodings) and as
    * TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ). Rather than
    * hard-coding one physical encoding, branch on the scanned schema so
    * either file decodes to the same session-TZ `timestamp` column.
    * GraftSession pins spark.sql.session.timeZone=UTC, so the NTZ→TZ
    * cast is epoch-preserving and unix_micros matches DuckDB epoch_us.
    */
  def events: DataFrame = Tables.normalizeTs(t("events"))
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {

  /** Normalize an event-stream `ts` column to a session-TZ timestamp
    * regardless of the file's physical encoding. Works on batch AND
    * streaming DataFrames (schema-only dispatch, no data inspection):
    *  - long        → nanos-as-long (legacy TIMESTAMP(NANOS) under
    *                  spark.sql.legacy.parquet.nanosAsLong), truncated
    *                  to micros exactly as DuckDB truncates ns→us;
    *  - timestamp   → already session-TZ, pass through;
    *  - anything else (TIMESTAMP_NTZ micros, string) → cast; the cast
    *    is epoch-preserving because GraftSession pins the session time
    *    zone to UTC, keeping unix_micros aligned with DuckDB epoch_us.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampType => df
      case _ => df.withColumn(tsCol, col(tsCol).cast(TimestampType))
    }
  }
}
