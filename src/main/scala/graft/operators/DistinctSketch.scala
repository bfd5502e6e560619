package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog, via Spark's
  * Apache DataSketches bindings).
  *
  * The scale pattern q08's `approx_count_distinct` cannot express:
  * persist a SKETCH per shard/partition/day as a tiny binary column,
  * then answer any rollup (per source, per month, global) by UNIONING
  * sketches — no rescan of the data that produced them. At 100 TB the
  * corpus is written once with per-shard sketch rows (bytes each), and
  * every later cardinality query runs over the sketch table alone.
  * Sketch build/merge/estimate are deterministic for a fixed lgK, so
  * rollups are reproducible; estimates carry the usual ~1/sqrt(2^lgK)
  * relative error (spec-pinned, no SQL-oracle row — DuckDB's HLL is a
  * different implementation).
  */
object DistinctSketch {

  /** log2 of the HLL register count (2^12 = 4096 registers, ~1.6%
    * standard error) — the DataSketches default.
    */
  val LG_K = 12

  /** Per-group sketch table: groupCols ++ (n_rows, sketch binary). */
  def sketchBy(df: DataFrame, valueCol: String, groupCols: String*): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col(valueCol), lit(LG_K)).as("sketch"))

  /** Roll sketches up to a coarser grouping (possibly global) without
    * touching the base data: union per-group sketches, estimate.
    */
  def rollup(sketches: DataFrame, groupCols: String*): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sketches.groupBy()
      else sketches.groupBy(groupCols.map(col): _*)
    grouped
      .agg(sum("n_rows").as("n_rows"),
        hll_union_agg(col("sketch"), lit(true)).as("sketch"))
      .withColumn("n_distinct_est", hll_sketch_estimate(col("sketch")))
  }

  /** Estimate column for a sketch table (per-row, no merge). */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
