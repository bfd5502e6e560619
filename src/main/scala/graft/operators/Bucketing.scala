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

  /** Drop a managed table AND its warehouse directory. The in-memory
    * catalog forgets tables at session end but their LOCATION persists,
    * so a bare DROP TABLE IF EXISTS in a fresh session is a no-op that
    * leaves an orphan directory which then fails the next CTAS
    * (non-empty-location check). Scrubbing both makes fixed table
    * names safe across sessions.
    */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(
      if (wh.getScheme == null) wh.toString else new java.io.File(wh).toString,
      table)
    def rec(f: java.io.File): Unit = {
      val kids = f.listFiles
      if (kids != null) kids.foreach(rec)
      f.delete(); ()
    }
    if (dir.exists) rec(dir)
  }
}
