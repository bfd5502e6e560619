package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV corpus reader — the other interchange format corpora actually
  * arrive in (exports from warehouses, crawler manifests, labeling
  * vendors). Same production-safety contract as [[JsonlCorpus]]:
  *
  *  1. EXPLICIT schema — no inference scan, no sampled mistyping.
  *  2. PERMISSIVE + corrupt-record column — a line with the wrong
  *     arity or an unparseable field becomes a quarantined row
  *     carrying its raw text, not a dead job.
  *  3. Line-splittable (multiLine stays OFF) — embedded newlines are
  *     the one CSV feature deliberately NOT supported, because
  *     multiLine=true makes a shard single-task at 100 TB; upstream
  *     must escape newlines (the JSONL format exists for a reason).
  *     Quoted commas and doubled quotes ARE handled — they don't cost
  *     splittability.
  */
object CsvCorpus {

  /** Matches the driver `documents` table's exchange columns. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  val CORRUPT_COL = "_corrupt"

  private def withCorrupt(s: StructType): StructType =
    s.add(StructField(CORRUPT_COL, StringType))

  /** Raw read: well-formed lines parse into columns; wrong-arity or
    * unparseable-field lines carry their text in [[CORRUPT_COL]].
    *
    * Deliberately text() + from_csv, NOT spark.read.csv: the CSV file
    * scan prunes the parse to the columns a query references, and a
    * record is judged malformed only against that pruned subset — so
    * `df.count()` and `df.collect()` can disagree on which rows are
    * corrupt (count requires no columns at all). Parsing through an
    * expression pins the FULL schema for every consumer: quarantine
    * semantics are a property of the line, not of the downstream
    * projection. Still line-splittable — text() scans by byte range.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CORRUPT_COL,
      "header" -> "false",
      "multiLine" -> "false",
      // RFC-4180 doubled-quote escaping (Spark's default escape is a
      // backslash, which no warehouse export actually emits)
      "escape" -> "\"")
    spark.read.text(path)
      .filter(length(col("value")) > 0)
      .select(from_csv(col("value"), withCorrupt(schema), opts).as("r"))
      .select(col("r.*"))
  }

  /** Parsed documents only. A row whose doc_id or text is null is
    * malformed for the pipeline even when the CSV parser accepted it.
    */
  def clean(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col(CORRUPT_COL).isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .drop(CORRUPT_COL)

  /** Raw text of every rejected line, for repair/re-drive. */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col(CORRUPT_COL).isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(coalesce(col(CORRUPT_COL),
        concat_ws(",", schema.fieldNames.map(col): _*)).as("raw_line"))

  /** One-row ingest health report (logged and alerted on). */
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
