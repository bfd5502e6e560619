package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard sink: materialize a prepared corpus as
  * `dir/source=<s>/part-*.parquet` with deterministic shard membership
  * and intra-file order — the write side of the q57 manifest, and the
  * corpus counterpart of the astro layer's partitioned snapshot store
  * (SnapshotStats.writePartitioned / Assembled.load).
  *
  * Layout choices that matter at 100 TB:
  *  - `partitionBy(source)` makes the directory the coarse pruning
  *    unit: a reader filtering on source never opens other domains'
  *    files (PartitionFilters in the scan, asserted in the spec).
  *  - rows are hash-routed to `shards` tasks by (source, doc_id) and
  *    sorted by (source, doc_id) within each task, so shard membership
  *    and file content are pure functions of the data — a re-run
  *    produces byte-identical shards for the manifest to pin. No
  *    global sort: the exchange is a plain hash partitioning.
  *  - one pass, no driver-side state; `maxRecordsPerFile` (left to the
  *    caller's session conf) caps file size without changing routing.
  */
object CorpusSink {

  /** Write `docs` (must carry source + doc_id) as partitioned shards. */
  def write(docs: DataFrame, dir: String, shards: Int): Unit =
    docs
      .repartition(shards, col("source"), col("doc_id"))
      .sortWithinPartitions("source", "doc_id")
      .write.mode("overwrite").partitionBy("source").parquet(dir)

  /** Read the shard store back; source is a partition column again. */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
