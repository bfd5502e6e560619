package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-24 specs: DBSCAN, greedy coverage selection, bloom
  * FPR eval (q322–q324) — independent driver-side re-derivations on
  * sf0.001.
  */
class Batch24Spec extends SparkSpec {

  test("q322 equals a driver-side O(n^2) DBSCAN recompute") {
    import graft.queries.EventAnalytics.{DBSCAN_EPS, DBSCAN_MIN_PTS, DBSCAN_SAMPLE}
    val got = graft.queries.EventAnalytics.q322Dbscan(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    val pts = Tables(spark, sfDir).events
      .filter(col("event_id") % DBSCAN_SAMPLE === 0)
      .select(col("event_id"), col("value"),
        expr("CAST((unix_micros(ts) div 3600000000) % 24 AS DOUBLE)"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    def near(a: (Long, Double, Double), b: (Long, Double, Double)) =
      math.sqrt((a._2 - b._2) * (a._2 - b._2) +
        (a._3 - b._3) * (a._3 - b._3)) <= DBSCAN_EPS
    val nbrs = pts.map(p => p._1 -> pts.filter(q => near(p, q)).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(p => nbrs(p).size >= DBSCAN_MIN_PTS).toSet
    // union-find over core-core neighbor edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (c <- core; d <- nbrs(c) if core(d) && d != c) {
      val (rc, rd) = (find(c), find(d))
      if (rc != rd) parent(rc.max(rd)) = rc.min(rd)
    }
    val coreCluster = core.map(c =>
      c -> core.filter(d => find(d) == find(c)).min).toMap
    val want = pts.map { case p @ (id, _, _) =>
      val cl =
        if (core(id)) coreCluster(id)
        else {
          val coreNbrs = (nbrs(id) - id).filter(core)
          if (coreNbrs.nonEmpty) coreNbrs.map(coreCluster).min else -1L
        }
      id -> ((core(id), cl))
    }.toMap
    assert(got === want)
    // the instance must exercise all three point classes
    assert(got.values.exists(_._1) && got.values.exists(v => !v._1 && v._2 >= 0)
      && got.values.exists(_._2 == -1L), "degenerate DBSCAN instance")
  }

  test("q323 equals a driver-side greedy cover recompute") {
    import graft.queries.CorpusOps.COVER_K
    val got = graft.queries.CorpusOps.q323GreedyCover(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), graft.plans.ShingleHashSet(col("text"),
        graft.queries.DedupOps.SHINGLE_N).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    var covered = Set.empty[Long]
    val want = (1 to COVER_K).map { step =>
      val (bd, bg) = docs
        .map { case (id, ws) => (id, (ws diff covered).size.toLong) }
        .filter(_._2 > 0)
        .minBy { case (id, g) => (-g, id) }
      covered = covered ++ docs.find(_._1 == bd).get._2
      (step.toLong, bd, bg, covered.size.toLong)
    }
    assert(got.toSeq === want)
    // greedy must strictly grow coverage and never repeat a doc
    assert(want.map(_._2).distinct.size === COVER_K)
    assert(want.map(_._4).sliding(2).forall { case Seq(a, b) => b > a })
  }

  test("q324 counts equal an exact recompute and both flags hold") {
    val Array(r) = graft.queries.JoinOps.q324BloomFpr(spark, sfDir).collect()
    val t = Tables(spark, sfDir)
    val dimKeys = t.supplier
      .filter(col("s_nationkey") === graft.queries.JoinOps.BLOOM_NATION)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val probe = t.lineitem.select("l_suppkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(r.getLong(0) === probe.size.toLong)
    assert(r.getLong(1) === (probe intersect dimKeys).size.toLong)
    assert(r.getBoolean(2), "bloom filter produced a false negative")
    assert(r.getBoolean(3), "bloom FPR left its 3x-fpp bound")
  }
}
