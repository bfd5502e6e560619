package graft

import graft.operators.DistinctSketch
import graft.queries.DedupOps
import org.apache.spark.sql.functions._

class DistinctSketchSpec extends SparkSpec {

  test("per-source sketches estimate within HLL error of exact distinct") {
    val ev = Tables(spark, sfDir).events
    val sketches = DistinctSketch.sketchBy(ev, "user_id", "event_type")
    val est = DistinctSketch.rollup(sketches, "event_type")
      .select("event_type", "n_distinct_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, d) =>
      val rel = math.abs(est(k) - d).toDouble / d
      assert(rel < 0.06, s"$k: estimate ${est(k)} vs exact $d (rel $rel)")
    }
  }

  test("rolled-up sketch union equals the directly built global sketch") {
    val ev = Tables(spark, sfDir).events
    val perType = DistinctSketch.sketchBy(ev, "user_id", "event_type")
    val merged = DistinctSketch.rollup(perType)
      .select("n_distinct_est").head.getLong(0)
    val direct = ev.groupBy()
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(DistinctSketch.LG_K))).as("e"))
      .head.getLong(0)
    assert(merged == direct,
      "sketch merge must be lossless vs building one sketch over all rows")
    // and row counts survive the rollup
    val n = DistinctSketch.rollup(perType).select("n_rows").head.getLong(0)
    assert(n == ev.count())
  }

  test("q68 marks exactly the new docs whose bands collide with the corpus") {
    val docs = Tables(spark, sfDir).documents
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val cut = math.floor(maxId * DedupOps.INGEST_FRACTION).toLong
    val got = DedupOps.q68IngestDedup(spark, sfDir).collect()
    got.foreach { r =>
      assert(r.getLong(0) >= cut, "only new-batch docs may appear")
      assert(r.getLong(1) < cut, "dup_of must be a corpus doc")
      assert(r.getLong(2) >= 1L)
    }
    // cross-check against the symmetric pair list restricted to the split
    val pairs = DedupOps.q27MinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.collect {
      case (a, b) if a < cut && b >= cut => (b, a)
      case (a, b) if b < cut && a >= cut => (a, b)
    }.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).min }
    val gotMap = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap == expected)
  }
}
