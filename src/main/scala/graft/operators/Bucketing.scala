package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (SURVEY §4: co-located joins).
  *
  * Writing both sides of a recurring join bucketed by the join key
  * removes the shuffle from EVERY subsequent join — at 100 TB the
  * bucketed layout is paid once at ingest and amortized over the whole
  * query mix. Requires saveAsTable (bucket metadata lives in the
  * catalog, not the parquet files).
  */
object Bucketing {

  /** Save `df` as a bucketed managed table on `keys`. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — shuffle-free when
    * bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
