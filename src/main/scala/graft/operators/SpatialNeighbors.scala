package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-radius 3-D neighbor join — the spatial primitive behind
  * local-density estimation (Casertano-Hut style) and neighbor-list
  * builds over star positions (reference analogue: the density-center
  * input the reference READS from densCentre.txt is produced by
  * exactly this neighbor search upstream; parser/density_center.py).
  *
  * A naive `dist(l, r) <= R` join plans as a nested loop (O(L*R)
  * compares). Grid equi-ization instead: space is cut into cubic cells
  * of side `radius`; the LEFT (query) side explodes to its own cell
  * plus the 26 adjacent cells — a constant 27x fanout of the side the
  * caller knows is smaller — while the right side maps to exactly ONE
  * cell; the join runs on the integer cell key and an exact Euclidean
  * post-filter removes same-neighborhood near-misses. Exact by
  * construction: |Δx| <= R implies the per-axis cell indices differ by
  * at most 1, so every true neighbor pair shares an exploded cell.
  *
  * At 100 TB both sides hash-shuffle on the 24-byte cell key (or the
  * bounded query side broadcasts); per-cell population is bounded by
  * physical density, so no task sees more than ~27 cells' worth of
  * candidates per query point.
  */
object SpatialNeighbors {

  /** All (left, right) pairs within `radius`, with a `dist` column.
    * Column names must be disjoint across the two inputs (rename on
    * the query side). Pairs are NOT deduplicated or self-filtered —
    * callers exclude identity rows with their own key predicate.
    *
    * `dims = 2` (round 10): when the caller's space is a plane (the z
    * columns are a constant), the dz = ±1 exploded cells can never
    * match the right side's single z cell — they are pure shuffle
    * waste, 3x the exploded rows for zero extra pairs. Passing 2 skips
    * them; the match set is provably identical.
    */
  def withinRadius(
      left: DataFrame, lx: String, ly: String, lz: String,
      right: DataFrame, rx: String, ry: String, rz: String,
      radius: Double, keys: Seq[String] = Nil, dims: Int = 3): DataFrame = {
    require(radius > 0, "radius must be positive")
    require(dims == 2 || dims == 3, "dims must be 2 or 3")
    def cell(c: Column): Column = floor(c / radius).cast("long")
    val zOffsets = if (dims == 3) -1 to 1 else 0 to 0
    val offsets = for {
      dx <- -1 to 1; dy <- -1 to 1; dz <- zOffsets
    } yield struct(lit(dx).as("dx"), lit(dy).as("dy"), lit(dz).as("dz"))
    val l = left
      .withColumn("__o", explode(array(offsets: _*)))
      .withColumn("__cx", cell(col(lx)) + col("__o.dx"))
      .withColumn("__cy", cell(col(ly)) + col("__o.dy"))
      .withColumn("__cz", cell(col(lz)) + col("__o.dz"))
      .drop("__o")
    val r = right
      .withColumn("__cx", cell(col(rx)))
      .withColumn("__cy", cell(col(ry)))
      .withColumn("__cz", cell(col(rz)))
    val d = sqrt(
      (col(rx) - col(lx)) * (col(rx) - col(lx)) +
      (col(ry) - col(ly)) * (col(ry) - col(ly)) +
      (col(rz) - col(lz)) * (col(rz) - col(lz)))
    l.join(r, keys ++ Seq("__cx", "__cy", "__cz"))
      .withColumn("dist", d)
      .filter(col("dist") <= radius)
      .drop("__cx", "__cy", "__cz")
  }

  /** DENSITY CENTER per snapshot — the Casertano-Hut-style
    * density-weighted mean position, with each star's local density
    * estimated as the total neighbor mass within `radius` (the
    * quantity the reference pipeline only READS pre-computed from
    * densCentre.txt; parser/density_center.py). The corpus-x-corpus
    * neighbor pass is the grid equi-join above keyed by the snapshot
    * columns, so each (sim_id, time) group computes independently in
    * one shuffle — the reference's per-snapshot serial loop becomes
    * one plan.
    *
    * Input needs key columns, position columns x/y/z, and a mass
    * column; a star's own mass counts toward its density (self-pair at
    * distance 0), matching the "mass inside the sphere" definition.
    */
  def densityCenter(
      stars: DataFrame, keys: Seq[String],
      x: String, y: String, z: String, mass: String,
      radius: Double): DataFrame = {
    val k = keys.map(col)
    val q = stars.select(
      k ++ Seq(col(x).as("__qx"), col(y).as("__qy"), col(z).as("__qz")): _*)
      .withColumn("__qid", monotonically_increasing_id())
    val pairs = withinRadius(
      q, "__qx", "__qy", "__qz",
      stars.select(k ++ Seq(col(x), col(y), col(z),
        col(mass).as("__m")): _*),
      x, y, z, radius, keys)
    val rho = pairs.groupBy(k :+ col("__qid"): _*)
      .agg(first(col("__qx")).as("__qx"), first(col("__qy")).as("__qy"),
        first(col("__qz")).as("__qz"), sum("__m").as("__rho"))
    rho.groupBy(k: _*)
      .agg(
        (sum(col("__qx") * col("__rho")) / sum("__rho")).as("dc_x"),
        (sum(col("__qy") * col("__rho")) / sum("__rho")).as("dc_y"),
        (sum(col("__qz") * col("__rho")) / sum("__rho")).as("dc_z"),
        count(lit(1)).as("n_stars"))
  }
}
