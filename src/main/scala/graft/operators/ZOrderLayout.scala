package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout — multi-dimensional data
  * skipping for the lakehouse tables every other operator scans.
  *
  * Range-partitioning a table by ONE column gives perfect file-level
  * min/max pruning on that column and none on any other. Interleaving
  * the bits of two (or more) normalized key columns into a single
  * Morton key and range-partitioning by THAT gives every file a small
  * bounding box in BOTH dimensions, so a scan filtered on either
  * column — or a box on both — skips most files on footer stats alone.
  * This is the standard OPTIMIZE ZORDER BY layout pass; at 100 TB it
  * runs once per ingest batch and every downstream query pays fewer
  * scan bytes (parquet row-group stats + file pruning).
  *
  * Everything here is codegen'd column arithmetic (shift/mask spreads,
  * no UDF); the only exchange is the range repartition that the layout
  * exists to produce.
  */
object ZOrderLayout {

  /** Morton spread: the low 16 bits of `c` distributed to the even bit
    * positions of a 32-bit lane (classic shift-or-mask ladder).
    */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Normalize a numeric column to a 16-bit rank given its (driver-
    * known, e.g. from table stats) value bounds.
    */
  def rank16(v: Column, lo: Double, hi: Double): Column = {
    val scaled = (v.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-300))
    least(lit(65535L), greatest(lit(0L), floor(scaled * 65536.0).cast("long")))
  }

  /** 32-bit Morton key interleaving two 16-bit ranks (a in even bits,
    * b in odd).
    */
  def zkey(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** Lay `df` out in `nFiles` z-ordered ranges over two numeric
    * columns: each output partition (= written file) covers a compact
    * Morton range, hence a small bounding box in (colA, colB). The
    * caller writes the result; the `_z` key is dropped.
    */
  def layout(
      df: DataFrame,
      colA: String, loA: Double, hiA: Double,
      colB: String, loB: Double, hiB: Double,
      nFiles: Int): DataFrame =
    df.withColumn("_z",
        zkey(rank16(col(colA), loA, hiA), rank16(col(colB), loB, hiB)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
