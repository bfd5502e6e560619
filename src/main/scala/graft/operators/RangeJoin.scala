package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range join: points joined to the intervals containing them,
  * without the cartesian product a plain `p BETWEEN lo AND hi` join
  * plans in Spark (BroadcastNestedLoop at best, O(P*I) compares).
  *
  * Equi-ization by grid cells: every interval explodes to the integer
  * cells it covers, every point maps to exactly one cell, the join
  * runs on the cell key (hash shuffle, partial-dedup-friendly), and an
  * exact containment post-filter removes same-cell near-misses. Pick
  * `cellSize` near the typical interval width: explosion factor is
  * ~width/cellSize + 1 while a cell's population stays bounded — both
  * sides stay linear, which is the property that survives 100 TB.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val cells = intervals.select(
      (intervals.columns.map(col) :+
        explode(sequence(
          floor(col(loCol) / cellSize).cast("long"),
          floor(col(hiCol) / cellSize).cast("long"))).as("__cell")): _*)
    val pts = points.withColumn("__cell",
      floor(col(pCol) / cellSize).cast("long"))
    pts.join(cells, "__cell")
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__cell")
  }
}
