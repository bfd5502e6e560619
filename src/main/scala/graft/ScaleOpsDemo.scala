package graft

import graft.operators.{BloomPrune, Bucketing, DistinctSketch, Skew, ZOrderLayout}
import org.apache.spark.sql.functions._

/** Executable example of the scale utilities: bucketed co-located
  * joins (no shuffle), salted joins for skewed keys, bloom-filter
  * join pruning (fact-side scan-stage reduction), z-order layout
  * (2-D file skipping), and mergeable HLL distinct sketches (rollups
  * without base-data rescans).
  *
  * Usage: runMain graft.ScaleOpsDemo [sfDir]
  */
object ScaleOpsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-scale-ops-demo")

    // --- bucketed join: the shuffle disappears from the plan --------
    val li = Tables(spark, sfDir).lineitem
    Bucketing.writeBucketed(
      li.select("l_orderkey", "l_linenumber", "l_quantity"),
      "demo_bucketed_qty", 4, Seq("l_orderkey"))
    Bucketing.writeBucketed(
      li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
      "demo_bucketed_price", 4, Seq("l_orderkey"))
    val joined = Bucketing.bucketedJoin(spark,
      "demo_bucketed_qty", "demo_bucketed_price", Seq("l_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    println(s"[demo] bucketed join rows=${joined.count()} " +
      s"shuffle_exchanges=${"Exchange hashpartitioning".r.findAllIn(plan).length}")

    // --- salted join: equal results, spread hot key -----------------
    val big = spark.range(0, 100000)
      .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("attr"))
    val plain = big.join(small, "k").count()
    val salted = Skew.saltedJoin(big, small, "k", factor = 16).count()
    println(s"[demo] salted join rows=$salted plain=$plain equal=${salted == plain}")

    // --- bloom prune: the selective-dim drop moves into the scan ----
    val t = Tables(spark, sfDir)
    val dim = t.supplier.filter(col("s_suppkey") % 10 === 0)
    val fact = t.lineitem
    val pruned = BloomPrune.prune(fact, col("l_suppkey"), dim, col("s_suppkey"),
      expectedItems = 1000)
    val exact = fact.join(dim.select("s_suppkey"),
      col("l_suppkey") === col("s_suppkey"), "left_semi").count()
    println(s"[demo] bloom prune fact=${fact.count()} pruned=${pruned.count()} " +
      s"exact_semi=$exact (prune is a scan-stage filter, no exchange)")

    // --- z-order layout: per-file 2-D bounding boxes -----------------
    val zdir = java.nio.file.Files.createTempDirectory("demo_z").toString
    val keyed = li.select(col("l_orderkey").cast("long").as("a"),
      col("l_partkey").cast("long").as("b"))
    val bounds = keyed.agg(min("a"), max("a"), min("b"), max("b")).head
    ZOrderLayout.layout(keyed,
        "a", bounds.getLong(0).toDouble, bounds.getLong(1).toDouble,
        "b", bounds.getLong(2).toDouble, bounds.getLong(3).toDouble, 16)
      .write.mode("overwrite").parquet(zdir)
    val nFiles = new java.io.File(zdir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    println(s"[demo] z-order wrote $nFiles files, each a compact (a,b) box " +
      "(footer stats prune filters on either column)")

    // --- HLL sketches: rollup without rescanning the base table ------
    val sketches = DistinctSketch.sketchBy(t.events, "user_id", "event_type")
    val global = DistinctSketch.rollup(sketches)
      .select("n_distinct_est").head.getLong(0)
    val exactD = t.events.select("user_id").distinct().count()
    println(s"[demo] hll rollup est=$global exact=$exactD " +
      s"(merged from ${sketches.count()} per-type sketches, no rescan)")

    spark.sql("DROP TABLE IF EXISTS demo_bucketed_qty")
    spark.sql("DROP TABLE IF EXISTS demo_bucketed_price")
    spark.stop()
  }
}
