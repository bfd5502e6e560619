package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics without a per-group total sort.
  *
  * The naive exact quantile — `row_number()` over a per-group window —
  * sorts EVERY row of a group on one task. That is fine when groups are
  * numerous and bounded (per-snapshot stats: thousands of (sim_id,
  * time) groups of ~1e5 rows each), but it is the wrong shape when a
  * group spans the cluster: a global quantile over 100 TB, or a
  * low-cardinality group key, serializes the whole dataset through a
  * handful of tasks (reference's serial pandas quantile loop:
  * src/nbody6/calc/summary.py:20).
  *
  * This operator is the classic two-phase bucket-prune instead:
  *
  *  1. min/max per group (map-side combined, broadcast back);
  *  2. fixed-width bucket histogram per group (map-side combined; the
  *     shuffled state is |groups| x numBuckets rows, independent of
  *     data size), cumulated per group to locate, for each target
  *     rank, its bucket and local offset;
  *  3. one more scan that keeps ONLY rows of located buckets
  *     (~targets/numBuckets of the data) and sorts those few rows
  *     per (group, bucket) — small, fully parallel partitions.
  *
  * Every pass is a narrow scan + partial aggregation; nothing sorts
  * more than ~1/numBuckets of a group. Bucket assignment is weakly
  * monotone in the value (subtract/divide/multiply by positive
  * constants and floor all preserve order, and ties share a bucket),
  * so bucket prefix counts are exact rank prefixes.
  *
  * Results are EXACT and identical to the single-sort formulation —
  * `quantiles` matches DuckDB `quantile_cont` AND Spark's built-in
  * `percentile` bit-for-bit: both engines interpolate with the
  * symmetric weighted form `(hi - pos) * lov + (pos - lo) * hiv`,
  * NOT the algebraically-equal-but-float-different
  * `lov + (hiv - lov) * frac` (the two differ by 1-2 ulps at large
  * magnitudes, enough to flip a repr hash);
  * `weightedCrossing` reproduces the reference's cumulative-mass
  * half-light/half-mass radius (calc/cluster.py:14) with DECIMAL
  * weight sums, so the crossing row is engine- and order-independent.
  */
object DistributedQuantile {

  /** Exact interpolated quantiles (`quantile_cont` semantics) per
    * group. Returns one row per group: groupCols ++ one double column
    * per (name, q) in `qs`. Nulls in `valueCol` are ignored (as in
    * both engines' quantile aggregates).
    */
  def quantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)],
      numBuckets: Int = 256): DataFrame = {
    val g = groupCols.map(col)
    val base = df
      .select(g :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    val bucketed = assignBuckets(base, groupCols, numBuckets)
    val stats = bucketed.groupBy(g :+ col("_b"): _*).agg(count(lit(1)).as("_cnt"))
    quantileCore(bucketed, stats, groupCols, qs)
  }

  /** Full describe() pack — n/mean/std/min/max + exact interpolated
    * quantiles — in the SAME three passes as `quantiles` alone: the
    * moment partials (decimal-exact sums of v and v², per-bucket
    * min/max) ride along in the bucket-histogram aggregation and are
    * re-aggregated from the tiny |groups| x numBuckets table, which is
    * exact because decimal addition is associative and min/max are
    * idempotent. Saves a whole scan over computing moments separately.
    * Matches graft.functions.Exact.{meanExact, stddevExact} + DuckDB
    * quantile_cont bit-for-bit.
    */
  def describe(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)],
      numBuckets: Int = 256,
      scale: Int = 4,
      sqScale: Int = 4): DataFrame = {
    val g = groupCols.map(col)
    val base = df
      .select(g :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    val bucketed = assignBuckets(base, groupCols, numBuckets)
    val dec = graft.functions.Exact.dec(col("_v"), scale)
    val decSq = graft.functions.Exact.dec(col("_v") * col("_v"), sqScale)
    val stats = bucketed.groupBy(g :+ col("_b"): _*)
      .agg(count(lit(1)).as("_cnt"), sum(dec).as("_s1"), sum(decSq).as("_s2"),
        min("_v").as("_bmn"), max("_v").as("_bmx"))
    val nD = sum("_cnt").cast("double")
    val s1 = sum("_s1").cast("double")
    val s2 = sum("_s2").cast("double")
    val moments = stats.groupBy(g: _*)
      .agg(sum("_cnt").as("n"),
        (s1 / sum("_cnt")).as("mean"),
        sqrt((s2 - s1 * s1 / nD) / (nD - lit(1.0d))).as("std"),
        min("_bmn").as("min"), max("_bmx").as("max"))
    moments.join(
      quantileCore(bucketed, stats.select(g ++ Seq(col("_b"), col("_cnt")): _*),
        groupCols, qs),
      groupCols)
  }

  /** `quantiles` plus the exact LONG count and sum of the value, in
    * the SAME passes: the per-bucket long-sum partial rides along in
    * the bucket-histogram aggregation (long addition is associative,
    * so re-aggregating the tiny |groups| x numBuckets table is exact)
    * — one fewer scan than a separate groupBy + join. Returns one row
    * per group: groupCols ++ (n, sumv) ++ one double column per q.
    * The value must be integral (it is cast to long for the sum).
    */
  def quantilesWithSum(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)],
      numBuckets: Int = 256): DataFrame = {
    val g = groupCols.map(col)
    val base = df
      .select(g ++ Seq(col(valueCol).cast("double").as("_v"),
        col(valueCol).cast("long").as("_raw")): _*)
      .filter(col("_v").isNotNull)
    val bucketed = assignBuckets(base, groupCols, numBuckets)
    val stats = bucketed.groupBy(g :+ col("_b"): _*)
      .agg(count(lit(1)).as("_cnt"), sum("_raw").as("_bsum"))
    val totals = stats.groupBy(g: _*)
      .agg(sum("_cnt").as("n"), sum("_bsum").as("sumv"))
    totals.join(
      quantileCore(bucketed.drop("_raw"),
        stats.select(g ++ Seq(col("_b"), col("_cnt")): _*), groupCols, qs),
      groupCols)
  }

  /** DISCRETE quantiles (`quantile_disc` / percentile_disc semantics):
    * the first group element whose cumulative distribution reaches q —
    * rank ceil(q*n) (1-based) — returned EXACTLY, no interpolation, so
    * the result is always a value that occurs in the data (the right
    * semantics for timestamps, ids, and enumerated measures, where an
    * interpolated midpoint is meaningless). Same three bucket-prune
    * passes as [[quantiles]]; only the rank arithmetic differs.
    */
  def quantilesDisc(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Double)],
      numBuckets: Int = 256): DataFrame = {
    val g = groupCols.map(col)
    val base = df
      .select(g :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    val bucketed = assignBuckets(base, groupCols, numBuckets)
    val stats = bucketed.groupBy(g :+ col("_b"): _*).agg(count(lit(1)).as("_cnt"))

    val wB = Window.partitionBy(g: _*).orderBy("_b")
    val cum = stats
      .withColumn("_cum", sum("_cnt").over(wB))
      .withColumn("_before", col("_cum") - col("_cnt"))
    val qarr = array(qs.map { case (n, q) =>
      struct(lit(n).as("qn"), lit(q).as("q")) }: _*)
    val targets = stats.groupBy(g: _*).agg(sum("_cnt").as("_n"))
      .select(g :+ explode(qarr).as("_t") :+ col("_n"): _*)
      .select(g ++ Seq(col("_t.qn").as("_qn"),
        greatest(ceil(col("_t.q") * col("_n")) - 1, lit(0L)).as("_rk")): _*)
    val ranks = targets.select(g :+ col("_rk"): _*).distinct()
    val located = ranks.join(cum, groupCols)
      .filter(col("_rk") >= col("_before") && col("_rk") < col("_cum"))
      .select(g ++ Seq(col("_b"), col("_rk"),
        (col("_rk") - col("_before")).as("_lrk")): _*)
    val needed = located.select(g :+ col("_b"): _*).distinct()
    val wLoc = Window.partitionBy(g :+ col("_b"): _*).orderBy("_v")
    val vals = bucketed
      .join(broadcast(needed), groupCols :+ "_b")
      .withColumn("_lrk", row_number().over(wLoc) - 1)
      .join(broadcast(located), groupCols ++ Seq("_b", "_lrk"))
      .select(g ++ Seq(col("_rk"), col("_v")): _*)
    val joined = targets.join(vals, groupCols :+ "_rk")
    val aggCols = qs.map { case (n, _) =>
      max(when(col("_qn") === n, col("_v"))).as(n) }
    joined.groupBy(g: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Rank targets -> bucket locate -> survivor-only local sort, given
    * the bucketed rows and the per-(group, bucket) counts.
    */
  private def quantileCore(
      bucketed: DataFrame,
      stats: DataFrame,
      groupCols: Seq[String],
      qs: Seq[(String, Double)]): DataFrame = {
    val g = groupCols.map(col)
    val wB = Window.partitionBy(g: _*).orderBy("_b")
    val cum = stats
      .withColumn("_cum", sum("_cnt").over(wB))
      .withColumn("_before", col("_cum") - col("_cnt"))

    // Targets: (group, quantile) -> global lo/hi ranks + interpolation
    // fraction. (n - 1) * q and its floor are the exact arithmetic
    // DuckDB's quantile_cont uses, so the selected ranks agree.
    val qarr = array(qs.map { case (n, q) =>
      struct(lit(n).as("qn"), lit(q).as("q")) }: _*)
    val targets = stats.groupBy(g: _*).agg(sum("_cnt").as("_n"))
      .select(g :+ explode(qarr).as("_t") :+ col("_n"): _*)
      .select(g ++ Seq(col("_t.qn").as("_qn"),
        ((col("_n") - 1) * col("_t.q")).as("_pos")): _*)
      .withColumn("_lo", floor(col("_pos")).cast("long"))
      .withColumn("_hi", ceil(col("_pos")).cast("long"))

    // Locate each needed rank's bucket. Tiny x tiny: equi-join on the
    // group key, range post-filter (no cartesian/BNLJ in the plan).
    val ranks = targets
      .select(g :+ explode(array(col("_lo"), col("_hi"))).as("_rk"): _*)
      .distinct()
    val located = ranks.join(cum, groupCols)
      .filter(col("_rk") >= col("_before") && col("_rk") < col("_cum"))
      .select(g ++ Seq(col("_b"), col("_rk"),
        (col("_rk") - col("_before")).as("_lrk")): _*)

    // Pass 3: survivors of located buckets only; local rank via a
    // per-(group, bucket) window over ~1/numBuckets of the group.
    val needed = located.select(g :+ col("_b"): _*).distinct()
    val wLoc = Window.partitionBy(g :+ col("_b"): _*).orderBy("_v")
    val vals = bucketed
      .join(broadcast(needed), groupCols :+ "_b")
      .withColumn("_lrk", row_number().over(wLoc) - 1)
      .join(broadcast(located), groupCols ++ Seq("_b", "_lrk"))
      .select(g ++ Seq(col("_rk"), col("_v")): _*)

    val lo = vals.withColumnRenamed("_rk", "_lo").withColumnRenamed("_v", "_lov")
    val hi = vals.withColumnRenamed("_rk", "_hi").withColumnRenamed("_v", "_hiv")
    val interp = targets
      .join(lo, groupCols :+ "_lo")
      .join(hi, groupCols :+ "_hi")
      // Symmetric weighted interpolation — the exact float expression
      // BOTH DuckDB quantile_cont and Spark's built-in percentile
      // (PercentileBase.getPercentile) evaluate. The rearranged
      // lo + (hi - lo) * frac differs by 1-2 ulps at ~1e11 magnitudes.
      // Exact-rank hits (lo == hi) return the value itself, as both
      // engines do — the weighted form would give 0 there.
      .withColumn("_qv",
        when(col("_lo") === col("_hi"), col("_lov")).otherwise(
          (col("_hi").cast("double") - col("_pos")) * col("_lov") +
            (col("_pos") - col("_lo").cast("double")) * col("_hiv")))
    val aggCols = qs.map { case (n, _) =>
      max(when(col("_qn") === n, col("_qv"))).as(n) }
    interp.groupBy(g: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** First value (in (valueCol, tieCols...) order) whose running
    * DECIMAL-weighted cumulative sum crosses `num/den` of the group
    * total — e.g. num=1, den=2 is the half-mass radius. Returns one
    * row per group: groupCols :+ `crossing` (double). The weight is
    * aggregated in DECIMAL(18, scale), so prefix sums are exact and
    * the crossing row is identical across engines and partitionings.
    */
  def weightedCrossing(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieCols: Seq[String],
      weight: Column,
      scale: Int = 4,
      num: Int = 1,
      den: Int = 2,
      numBuckets: Int = 256): DataFrame = {
    val g = groupCols.map(col)
    val base = df
      .select(g ++ Seq(col(valueCol).cast("double").as("_v"),
        graft.functions.Exact.dec(weight, scale).as("_w")) ++ tieCols.map(col): _*)
      .filter(col("_v").isNotNull)
    val bucketed = assignBuckets(base, groupCols, numBuckets)

    val stats = bucketed.groupBy(g :+ col("_b"): _*).agg(sum("_w").as("_bw"))
    val wB = Window.partitionBy(g: _*).orderBy("_b")
    val wAll = Window.partitionBy(g: _*)
    val cum = stats
      .withColumn("_cumw", sum("_bw").over(wB))
      .withColumn("_beforew", col("_cumw") - col("_bw"))
      .withColumn("_total", sum("_bw").over(wAll))
    // First bucket whose inclusive cumulative weight reaches the
    // threshold; the crossing row is inside it because the exclusive
    // prefix did not.
    val crossing = cum
      .filter(col("_cumw") * den >= col("_total") * num)
      .groupBy(g: _*).agg(min("_b").as("_cb"))
    val pre = crossing.join(
      cum.select(g ++ Seq(col("_b"), col("_beforew"), col("_total")): _*),
      groupCols).filter(col("_b") === col("_cb"))

    val wFine = Window.partitionBy(g: _*)
      .orderBy(("_v" +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed
      .join(broadcast(pre.select(g ++ Seq(col("_cb"), col("_beforew"), col("_total")): _*)),
        groupCols)
      .filter(col("_b") === col("_cb"))
      .withColumn("_cw", sum("_w").over(wFine) + col("_beforew"))
      .filter(col("_cw") * den >= col("_total") * num)
      .groupBy(g: _*)
      .agg(min("_v").as("crossing"))
  }

  /** Multi-fraction `weightedCrossing` in the SAME number of passes:
    * all fractions share the one bucket-histogram scan, and the fine
    * pass touches only the union of located buckets (at most one per
    * fraction, usually fewer — adjacent fractions often share one).
    * Returns one row per group with a double column per fraction name
    * — e.g. Lagrangian radii r10..r90 (reference: calc/cluster.py:14
    * generalizes its half-mass crossing to any mass fraction).
    */
  def weightedCrossings(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieCols: Seq[String],
      weight: Column,
      fracs: Seq[(String, Int, Int)],
      scale: Int = 4,
      numBuckets: Int = 256): DataFrame = {
    val g = groupCols.map(col)
    val base = df
      .select(g ++ Seq(col(valueCol).cast("double").as("_v"),
        graft.functions.Exact.dec(weight, scale).as("_w")) ++ tieCols.map(col): _*)
      .filter(col("_v").isNotNull)
    val bucketed = assignBuckets(base, groupCols, numBuckets)

    val stats = bucketed.groupBy(g :+ col("_b"): _*).agg(sum("_w").as("_bw"))
    val wB = Window.partitionBy(g: _*).orderBy("_b")
    val wAll = Window.partitionBy(g: _*)
    val cum = stats
      .withColumn("_cumw", sum("_bw").over(wB))
      .withColumn("_beforew", col("_cumw") - col("_bw"))
      .withColumn("_total", sum("_bw").over(wAll))

    // Per fraction: first bucket whose inclusive cumulative weight
    // reaches num/den of the total. |groups| x numBuckets x |fracs|
    // rows — tiny.
    val farr = array(fracs.map { case (n, nu, de) =>
      struct(lit(n).as("fn"), lit(nu).as("nu"), lit(de).as("de")) }: _*)
    val crossing = cum
      .select(g ++ Seq(col("_b"), col("_cumw"), col("_total"),
        explode(farr).as("_f")): _*)
      .filter(col("_cumw") * col("_f.de") >= col("_total") * col("_f.nu"))
      .groupBy(g ++ Seq(col("_f.fn").as("_fn"), col("_f.nu").as("_nu"),
        col("_f.de").as("_de")): _*)
      .agg(min("_b").as("_cb"))

    // Survivors of any located bucket, fine-ranked once per bucket.
    val pre = crossing.join(
      cum.select(g ++ Seq(col("_b"), col("_beforew"), col("_total")): _*),
      groupCols).filter(col("_b") === col("_cb"))
    val needed = pre.select(g :+ col("_cb").as("_b"): _*).distinct()
    val wFine = Window.partitionBy(g :+ col("_b"): _*)
      .orderBy(("_v" +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val fine = bucketed
      .join(broadcast(needed), groupCols :+ "_b")
      .withColumn("_cwb", sum("_w").over(wFine))
    val hits = fine
      .join(broadcast(pre.select(g ++ Seq(col("_cb").as("_b"), col("_fn"),
        col("_nu"), col("_de"), col("_beforew"), col("_total")): _*)),
        groupCols :+ "_b")
      .filter((col("_cwb") + col("_beforew")) * col("_de") >=
        col("_total") * col("_nu"))
      .groupBy(g :+ col("_fn"): _*)
      .agg(min("_v").as("_qv"))
    val aggCols = fracs.map { case (n, _, _) =>
      max(when(col("_fn") === n, col("_qv"))).as(n) }
    hits.groupBy(g: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Broadcast per-group min/max back onto the rows and assign each a
    * fixed-width bucket in [0, numBuckets). Weakly monotone in `_v`.
    */
  private def assignBuckets(
      base: DataFrame, groupCols: Seq[String], numBuckets: Int): DataFrame = {
    val g = groupCols.map(col)
    val mm = base.groupBy(g: _*).agg(min("_v").as("_mn"), max("_v").as("_mx"))
    base.join(broadcast(mm), groupCols)
      .withColumn("_b",
        when(col("_mx") === col("_mn"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_mn")) / (col("_mx") - col("_mn")) * numBuckets),
            lit(numBuckets - 1L))).cast("int"))
      .drop("_mn", "_mx")
  }
}
