package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema-evolution-tolerant parquet reads (SURVEY §2 spec-only;
  * the source-robustness counterpart of [[graft.Tables.conform]]).
  *
  * A long-lived 100 TB table is written by many pipeline versions:
  * early shards lack columns that later shards carry, and widths
  * drift (int -> long, float -> double). Spark's default parquet read
  * takes the schema from ONE footer — old shards would silently drop
  * the new columns. `readMerged` unions all footer schemas
  * (mergeSchema), so every column ever written surfaces (absent ones
  * as NULL), then conforms any drifted primitive widths to the
  * expected types. Filter pushdown and column pruning survive both
  * steps — mergeSchema is a planning-time union, and the conform cast
  * is a no-op projection when nothing drifted.
  *
  * The events.ts regression (round 3: one upstream encoding flip took
  * out 26 queries) is the failure class this guards against at the
  * source layer.
  */
object SchemaEvolution {

  /** Read a parquet directory written by multiple schema versions:
    * union of all shard schemas, missing columns null-filled.
    */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** [[readMerged]] + conform the named columns to canonical types
    * (drift-only casts, exact no-op otherwise).
    */
  def readMergedAs(spark: SparkSession, path: String,
                   canonical: (String, DataType)*): DataFrame =
    graft.Tables.conform(readMerged(spark, path), canonical: _*)

  /** The merged schema alone (for validation / drift reports). */
  def mergedSchema(spark: SparkSession, path: String): StructType =
    readMerged(spark, path).schema

  /** Width-drift-tolerant evolved read. Spark's mergeSchema handles
    * ADDITIVE evolution only — an int->long width flip fails the
    * footer merge outright (CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE). This
    * path reads each shard with its OWN schema, conforms it to the
    * canonical types (drift-only casts), and unions by name with
    * null-fill for columns a shard predates. Predicate pushdown and
    * pruning apply per shard under the union — each scan keeps its own
    * footer schema, so nothing is read twice and nothing silently
    * truncates.
    */
  def readEvolved(spark: SparkSession, path: String,
                  canonical: (String, DataType)*): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString).sorted
    require(shards.nonEmpty, s"no shards under $path")
    shards
      .map(p => graft.Tables.conform(spark.read.parquet(p), canonical: _*))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
