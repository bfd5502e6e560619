package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log/CDC compaction: reduce an append-only event or changelog table
  * to the latest record per key.
  *
  * Built on `max_by` aggregation, NOT a row_number window: partial
  * aggregation (map-side combine) collapses each partition to one row
  * per key before the exchange, so the shuffle carries keys — not the
  * full history — and no task ever sorts a partition of the log. This
  * is the shape that compacts a 100 TB changelog; a window over the
  * same data shuffles and sorts every row.
  *
  * `ord` must be a TOTAL order per key (e.g. a timestamp packed with a
  * unique sequence number); with ties the surviving row would be
  * nondeterministic run-to-run.
  */
object Compaction {

  /** One row per `keys`: `last_<c>` for each value column (the value at
    * max `ord`) plus `n_rows`, the compacted-away history depth.
    */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      ord: Column,
      valueCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        max_by(col(valueCols.head), ord).as(s"last_${valueCols.head}"),
        valueCols.tail.map(c => max_by(col(c), ord).as(s"last_$c")) :+
          count(lit(1)).as("n_rows"): _*)
}
