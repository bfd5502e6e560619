package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once streaming file sink via foreachBatch + idempotent
  * partition overwrite — the production counterpart of the memory
  * sinks the gate queries use (README "Running on a real cluster").
  *
  * Structured Streaming guarantees each micro-batch a stable
  * `batchId`, and re-runs the SAME batch (same id, same data) after a
  * failure — at-least-once delivery. Writing every batch into its own
  * `_batch_id=` partition with DYNAMIC partition overwrite turns the
  * redelivery into an overwrite of the batch's own partition: the
  * second attempt replaces the first attempt's files byte-for-byte
  * instead of appending duplicates, so the table converges to
  * exactly-once CONTENT with no transaction log. Readers prune the
  * partition column like any other (and a compaction job — q49's
  * operator — can fold partitions down later).
  */
object ExactlyOnceSink {

  /** A `foreachBatch` function writing each micro-batch to
    * `path/_batch_id=<id>/` idempotently.
    */
  def parquetBatchWriter(path: String): (DataFrame, Long) => Unit =
    (df, batchId) => writeBatch(df, batchId, path)

  /** The idempotent write itself (also callable directly, e.g. for a
    * redelivery simulation in tests).
    */
  def writeBatch(df: DataFrame, batchId: Long, path: String): Unit =
    df.withColumn("_batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(path)
}
