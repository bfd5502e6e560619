package graft

import graft.queries.Pipeline
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("every pipeline query has an oracle and runs non-empty") {
    Pipeline.queries.foreach { case (name, fn) =>
      assert(Pipeline.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q21 masked counts never exceed overall counts") {
    val bad = Pipeline.q21SnapshotStats(spark, sfDir)
      .filter(col("n_tid") > col("n_all") || col("mass_tid") > col("mass_all") + 1e-6)
    assert(bad.count() == 0)
  }

  test("q22 grid is dense: every type has every hour exactly once") {
    val df = Pipeline.q22TimegridAlign(spark, sfDir)
    val perType = df.groupBy("event_type").count().select("count").distinct()
    assert(perType.count() == 1, "uneven grid across types")
    val dups = df.groupBy("event_type", "grid_hour").count().filter(col("count") > 1)
    assert(dups.count() == 0)
  }

  test("q22 forward-fill: value_ff non-null after first event hour") {
    val df = Pipeline.q22TimegridAlign(spark, sfDir)
    // once a non-null appears for a type, all later grid points are non-null
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("grid_hour")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bad = df.withColumn("seen", count("value_ff").over(w))
      .filter(col("seen") > 0 && col("value_ff").isNull)
    assert(bad.count() == 0)
  }

  test("q23 every pair appears as either 2 components or 1 merged object") {
    val counts = Pipeline.q23UnresolvedMerge(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), min("obj_id").as("lo"))
    val bad = counts.filter(
      !((col("n") === 2 && col("lo") === 1) || (col("n") === 1 && col("lo") === 0)))
    assert(bad.count() == 0)
  }

  test("q23 merged luminosity equals component sum") {
    val t = Tables(spark, sfDir).lineitem.filter(col("l_linenumber") <= 2)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("wsum"), count(lit(1)).as("n"))
      .filter(col("n") === 2)
    val merged = Pipeline.q23UnresolvedMerge(spark, sfDir).filter(col("obj_id") === 0)
    val bad = merged.join(t, "l_orderkey")
      .filter(abs(col("lum") - col("wsum")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("q24 lat in [-pi/2, pi/2], dist positive") {
    val bad = Pipeline.q24OffsetFrame(spark, sfDir)
      .filter(col("lat_rad") < -math.Pi / 2 || col("lat_rad") > math.Pi / 2 ||
        col("dist") <= 0.0)
    assert(bad.count() == 0)
  }

  test("q25 split is exhaustive, deterministic, and group-consistent") {
    val df = Pipeline.q25StratifiedSplit(spark, sfDir)
    assert(df.filter(!col("split").isin("train", "val", "test")).count() == 0)
    // deterministic: re-running yields identical assignment
    val again = Pipeline.q25StratifiedSplit(spark, sfDir)
    assert(df.exceptAll(again).count() == 0)
    // rough stratification: every segment has training data
    val segs = df.filter(col("split") === "train")
      .select("c_mktsegment").distinct().count()
    val allSegs = df.select("c_mktsegment").distinct().count()
    assert(segs == allSegs)
  }
}
