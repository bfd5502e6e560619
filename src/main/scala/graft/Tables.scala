package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Thin accessors for the driver-generated test tables (TESTDATA.md).
  *
  * Every accessor is a plain parquet scan — Catalyst pushes filters and
  * prunes columns down to the scan, so callers should NOT pre-select or
  * cache here. At production scale these would be partitioned tables;
  * the API surface is identical.
  *
  * Each accessor CONFORMS the scan to the table's canonical schema
  * (Tables.conform): upstream regenerations have already flipped
  * physical encodings once (events.ts TIMESTAMP(NANOS) ->
  * TIMESTAMP(MICROS), which killed every events query for a round), so
  * integer widths, float widths, and timestamp encodings are normalized
  * by schema-dispatch instead of assumed. When the file already matches,
  * conform returns the scan UNTOUCHED — no cast nodes, pushdown and
  * pruning intact.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = Tables.conform(t("region"),
    "r_regionkey" -> IntegerType, "r_name" -> StringType)
  def nation: DataFrame = Tables.conform(t("nation"),
    "n_nationkey" -> IntegerType, "n_name" -> StringType,
    "n_regionkey" -> IntegerType)
  def customer: DataFrame = Tables.conform(t("customer"),
    "c_custkey" -> LongType, "c_name" -> StringType,
    "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
    "c_mktsegment" -> StringType)
  def supplier: DataFrame = Tables.conform(t("supplier"),
    "s_suppkey" -> LongType, "s_name" -> StringType,
    "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
  def part: DataFrame = Tables.conform(t("part"),
    "p_partkey" -> LongType, "p_name" -> StringType,
    "p_brand" -> StringType, "p_type" -> StringType,
    "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  def orders: DataFrame = Tables.conform(
    Tables.normalizeTs(t("orders"), "o_orderdate"),
    "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
    "o_orderpriority" -> StringType)
  def lineitem: DataFrame = Tables.conform(
    Tables.normalizeTs(t("lineitem"), "l_shipdate"),
    "l_orderkey" -> LongType, "l_partkey" -> LongType,
    "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
    "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
    "l_discount" -> DoubleType, "l_tax" -> DoubleType,
    "l_returnflag" -> StringType, "l_linestatus" -> StringType)

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
  def events: DataFrame = Tables.conform(Tables.normalizeTs(t("events")),
    "event_id" -> LongType, "user_id" -> LongType,
    "event_type" -> StringType, "value" -> DoubleType,
    "props" -> StringType)
  def documents: DataFrame = Tables.conform(t("documents"),
    "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
    "source" -> StringType, "n_chars" -> LongType)
  def embeddings: DataFrame = Tables.conform(t("embeddings"),
    "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
    "label" -> IntegerType)
}

object Tables {

  /** Unsplittable-input mitigation (optimization guide §2.5, round 9).
    *
    * The driver's test parquet is written as ONE row group per file,
    * so every scan stage runs as a single task no matter how many
    * byte-splits the reader plans — and any CPU-heavy projection
    * sitting on the scan (codec decode, shingling, unpivot) runs
    * serially while the other cores idle. The guide's remedy for
    * unsplittable inputs is a repartition immediately after the read;
    * this helper applies it ONLY when the scan actually under-splits
    * (fewer scan partitions than the session's parallelism), so on a
    * production table with normally-split files it is a provable
    * no-op — never an accidental extra exchange at scale. The hash
    * keys keep row placement deterministic under task retries (the
    * round-robin repartition hazard, guide §2.5).
    *
    * Call it on RAW SCANS ONLY: probing partition count builds the
    * plan's RDD, which is free for a scan but would materialize query
    * stages through an AQE plan with exchanges. Round 10 (ADVICE r09):
    * the contract is now asserted — a plan that already contains an
    * exchange or an aggregate fails fast instead of silently running
    * query stages at DataFrame-build time.
    */
  def fanOut(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    require(!df.queryExecution.logical.exists(p =>
      p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation] ||
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate] ||
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join]),
      "fanOut is for raw scans: probing a plan with exchanges/aggregates/joins " +
        "would materialize query stages at build time")
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p, keys: _*)
  }

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
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampType => df
      case _ => df.withColumn(tsCol, col(tsCol).cast(TimestampType))
    }
  }

  /** Cast any drifted columns to their canonical types; a no-op (the
    * exact input plan, no cast nodes, pushdown intact) when the file
    * already matches. Columns absent from the file or from `canonical`
    * pass through untouched — schema-dispatch, no data inspection, so
    * it works on batch and streaming frames alike.
    */
  def conform(df: DataFrame, canonical: (String, DataType)*): DataFrame = {
    import org.apache.spark.sql.functions.col
    val want = canonical.toMap
    val present = df.schema.fields
    val drifted = present.exists(f =>
      want.get(f.name).exists(_ != f.dataType))
    if (!drifted) df
    else df.select(present.map { f =>
      want.get(f.name) match {
        case Some(t) if t != f.dataType => col(f.name).cast(t).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
  }
}
