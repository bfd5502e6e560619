package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the LATEST right row whose time is
  * at or before the left row's time, per key — the time-series
  * enrichment primitive Spark's join operators don't express directly
  * (a naive formulation becomes a per-key inequality join and degrades
  * to O(L*R) pairs).
  *
  * Implementation is the union + ordered-window forward-fill: tag both
  * sides, sort each key's timeline once, carry the last right payload
  * forward, keep left rows. ONE shuffle on the key, no inequality
  * join, no per-row probe — the same frame the reference's uniform
  * time-grid alignment uses (README:227; SnapshotStats.timeAlign and
  * q22 are instances of this pattern).
  *
  * Ties: a right row AT the left row's exact time matches (<=), which
  * the sort realizes by ordering right (0) before left (1) at equal
  * timestamps. The right side must be unique per (key, time) — callers
  * aggregate first (an as-of match against a duplicated timestamp is
  * undefined in any engine).
  */
object AsOfJoin {

  def latestBefore(
      left: DataFrame, right: DataFrame,
      key: Seq[String], lTime: String, rTime: String,
      rValues: Seq[String]): DataFrame = {
    val rStructType = org.apache.spark.sql.types.StructType(
      right.select(rValues.map(col): _*).schema.fields)
    val leftCols = left.columns.toSeq
    val l = left.select(
      (key.map(col) :+ col(lTime).as("__ts") :+ lit(1).as("__is_left") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(rStructType).as("__r")): _*)
    val r = right.select(
      (key.map(col) :+ col(rTime).as("__ts") :+ lit(0).as("__is_left") :+
        lit(null).cast(l.schema("__l").dataType).as("__l") :+
        struct(rValues.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__ff", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rValues.map(v => col(s"__ff.$v").as(v)): _*)
  }

  /** Nearest as-of: for each left row, the right row with MINIMUM
    * absolute time distance (per key), ties resolved to the earlier
    * (backward) match — the sensor-fusion / "closest snapshot" variant
    * completing [[latestBefore]] (backward) and [[earliestAfter]]
    * (forward). Implemented as the composition of both one-shuffle
    * primitives plus a per-row pick — still no inequality join; the
    * two window passes share the same key exchange.
    *
    * Time columns must be LONG (e.g. epoch micros) so the distance
    * arithmetic is exact. Output adds `__dir` (-1 backward, +1
    * forward, 0 exact tie at distance zero) and `__dist` alongside the
    * picked rValues.
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      key: Seq[String], lTime: String, rTime: String,
      rValues: Seq[String]): DataFrame = {
    val rv = rValues :+ rTime
    val before = latestBefore(left, right, key, lTime, rTime, rv)
    val withB = rv.foldLeft(before)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
    val both = earliestAfter(withB, right, key, lTime, rTime, rv)
    val bothA = rv.foldLeft(both)((df, c) => df.withColumnRenamed(c, s"__a_$c"))
    val bt = col(s"__b_$rTime"); val at = col(s"__a_$rTime")
    val distB = col(lTime) - bt
    val distA = at - col(lTime)
    val useB = at.isNull || (bt.isNotNull && distB <= distA)
    val picked = rValues.map(v =>
      when(useB, col(s"__b_$v")).otherwise(col(s"__a_$v")).as(v))
    bothA.select(
      left.columns.map(col).toSeq ++ picked :+
        when(useB, bt).otherwise(at).as(s"__near_$rTime") :+
        when(useB && distB === 0L, 0)
          .when(useB, -1).otherwise(1).as("__dir") :+
        when(useB, distB).otherwise(distA).as("__dist"): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * rTime >= lTime (per key) — the "next snapshot / next publish"
    * lookup. Same union + single-window shape as `latestBefore`, with
    * the frame reversed (first non-null over the following rows) and
    * rights sorting AFTER lefts at equal timestamps so the match is
    * inclusive. One shuffle on the key, no inequality join.
    */
  def earliestAfter(
      left: DataFrame, right: DataFrame,
      key: Seq[String], lTime: String, rTime: String,
      rValues: Seq[String]): DataFrame = {
    val rStructType = org.apache.spark.sql.types.StructType(
      right.select(rValues.map(col): _*).schema.fields)
    val leftCols = left.columns.toSeq
    val l = left.select(
      (key.map(col) :+ col(lTime).as("__ts") :+ lit(1).as("__is_left") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(rStructType).as("__r")): _*)
    val r = right.select(
      (key.map(col) :+ col(rTime).as("__ts") :+ lit(0).as("__is_left") :+
        lit(null).cast(l.schema("__l").dataType).as("__l") :+
        struct(rValues.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts"), col("__is_left").desc)
      .rowsBetween(0, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("__ff", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rValues.map(v => col(s"__ff.$v").as(v)): _*)
  }
}
