package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus reader — the de-facto interchange format for LLM
  * training data (one JSON document per line, shipped as .jsonl /
  * .jsonl.gz shards). Three properties make the read production-safe
  * at 100 TB:
  *
  *  1. EXPLICIT schema — no inference pass (schema inference is a
  *     second full scan of the corpus, and a sampled inference can
  *     silently type a sparse field wrong).
  *  2. PERMISSIVE mode with a corrupt-record column — a malformed
  *     line becomes a quarantined row, not a dead job; at corpus
  *     scale some lines are ALWAYS broken.
  *  3. Line-splittable text input — Spark parallelizes a JSONL file
  *     by byte ranges, so one giant shard still fans out across the
  *     cluster (unlike a single JSON array document, which is one
  *     task).
  *
  * The corrupt column must be materialized before filtering on it
  * (Spark refuses a filter on the corrupt column over a bare scan —
  * we cache the split point via the documented from-scan projection).
  */
object JsonlCorpus {

  /** The corpus schema: matches the driver `documents` table plus an
    * optional per-doc metadata map (additive fields stay readable —
    * unknown keys land in `meta`-less rows as nulls, the
    * SchemaEvolution property).
    */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("meta", MapType(StringType, StringType))))

  val CORRUPT_COL = "_corrupt"

  private def withCorrupt(s: StructType): StructType =
    s.add(StructField(CORRUPT_COL, StringType))

  /** Raw read: every input line becomes a row — well-formed lines
    * parse into the schema columns, malformed lines carry their
    * original text in [[CORRUPT_COL]] and nulls elsewhere.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CORRUPT_COL)
      .json(path)

  /** Parsed documents only (corrupt rows dropped, corrupt column
    * removed). Rows missing a doc_id or text are malformed for the
    * pipeline's purposes even when they parse as JSON.
    */
  def clean(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col(CORRUPT_COL).isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .drop(CORRUPT_COL)

  /** Quarantine stream: the raw text of every line that failed to
    * parse (for repair/re-drive), plus structurally-empty parses.
    */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col(CORRUPT_COL).isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(coalesce(col(CORRUPT_COL),
        to_json(struct(schema.fieldNames.map(col): _*))).as("raw_line"))

  /** Ingest health report: one row — total / parsed / quarantined
    * counts from a single pass (the numbers an ingestion job logs and
    * alerts on).
    */
  def report(spark: SparkSession, path: String): DataFrame =
    read(spark, path).agg(
      count(lit(1)).as("n_lines"),
      sum(when(col(CORRUPT_COL).isNull &&
        col("doc_id").isNotNull && col("text").isNotNull, 1L)
        .otherwise(0L)).as("n_parsed"),
      sum(when(col(CORRUPT_COL).isNotNull ||
        col("doc_id").isNull || col("text").isNull, 1L)
        .otherwise(0L)).as("n_quarantined"))
}
