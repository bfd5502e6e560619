package graft

import graft.queries.{DedupOps, StatsOps, TemporalOps}
import org.apache.spark.sql.functions._

/** Round-5 batch-3 specs: prefix-filter similarity join, chi-square
  * independence, integer EWMA.
  */
class PrefixJoinSpec extends SparkSpec {

  test("q168 equals the brute-force all-pairs Jaccard at tau=1/2") {
    val sets = Tables(spark, sfDir).documents
      .select(col("doc_id"),
        graft.plans.ShingleHashSet(col("text"), DedupOps.SHINGLE_N).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val want = (for {
      (da, sa) <- sets; (db, sb) <- sets if da < db
      inter = (sa & sb).size
      if inter * DedupOps.PFX_TAU_DEN >=
        (sa.size + sb.size - inter) * DedupOps.PFX_TAU_NUM
    } yield (da, db, inter.toLong)).toSet
    val got = DedupOps.q168PrefixJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("q168 prefix candidates prune the all-pairs space") {
    // every doc pair shares some shingle on this corpus, so the naive
    // candidate count is ~C(n,2); the survivors are a tiny fraction —
    // the join must not have materialized an O(n^2) result
    val n = Tables(spark, sfDir).documents.count()
    val pairs = DedupOps.q168PrefixJoin(spark, sfDir).count()
    assert(pairs < n, s"expected << C($n,2) surviving pairs, got $pairs")
  }

  test("q169 chi2 equals a driver-side contingency recompute") {
    val rows = Tables(spark, sfDir).documents
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toDouble
    val rt = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
    val ct = rows.groupBy(_._2).map { case (k, v) => k -> v.length.toDouble }
    val obs = rows.groupBy(identity).map { case (k, v) => k -> v.length.toDouble }
    // keys.toSeq: yielding over two key SETS would collapse equal terms
    val chi2Micro = (for { l <- rt.keys.toSeq; s <- ct.keys.toSeq } yield {
      val e = rt(l) * ct(s) / n
      val o = obs.getOrElse((l, s), 0.0)
      math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
    }).sum
    val got = StatsOps.q169Chi2Independence(spark, sfDir).head
    assert(got.getAs[Long]("chi2_micro") === chi2Micro)
    assert(got.getAs[Long]("dof") ===
      (rt.size - 1).toLong * (ct.size - 1).toLong)
  }

  test("q170 EWMA equals a driver-side sequential fold") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).map { case (u, rs) =>
      val vs = rs.sortBy(r => (r._2, r._3)).map(_._4)
      u -> vs.tail.foldLeft(vs.head)((a, b) => (a + b) >> 1)
    }
    val got = TemporalOps.q170UserEwma(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("ewma_c")).toMap
    assert(got === want)
  }
}
