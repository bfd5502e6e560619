package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-37 spec: multi-window SLO burn-rate alerts (q363),
  * lateral-join surface (q364), bounded-hop harmonic centrality
  * (q365) — driver-side recomputes from first principles.
  */
class Batch37Spec extends SparkSpec {

  test("q363 equals a driver-side burn-rate recompute") {
    import graft.queries.OpsAnalytics.{SLO_BUDGET_MICRO, SLO_BURN_THRESH_MICRO, SLO_LONG_HOURS}
    val evs = Tables(spark, sfDir).events
      .select(unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (r.getLong(0) / 3600000000L, r.getString(1) == "error"))
    val hours = evs.groupBy(_._1).toSeq.sortBy(_._1).map { case (h, xs) =>
      (h, xs.length.toLong, xs.count(_._2).toLong)
    }
    def burn(e: Long, t: Long): Long =
      math.floor(e.toDouble / t.toDouble /
        (SLO_BUDGET_MICRO.toDouble / 1e6) * 1e6 + 0.5).toLong
    val want = hours.indices.map { i =>
      val (h, n, err) = hours(i)
      val lo = math.max(0, i - (SLO_LONG_HOURS - 1))
      val nl = (lo to i).map(hours(_)._2).sum
      val el = (lo to i).map(hours(_)._3).sum
      val bs = burn(err, n); val bl = burn(el, nl)
      (h, n, err, bs, bl,
        bs >= SLO_BURN_THRESH_MICRO && bl >= SLO_BURN_THRESH_MICRO)
    }
    val got = graft.queries.OpsAnalytics.q363SloBurnRate(spark, sfDir)
      .orderBy("hour").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got === want)
    // the trailing window is real: its burn is smoother than hourly
    val spreads = (xs: Seq[Long]) => xs.max - xs.min
    assert(spreads(got.map(_._5)) <= spreads(got.map(_._4)))
  }

  test("q364 equals the window-function formulation of the same top-N") {
    val t = Tables(spark, sfDir)
    val custs = t.customer.select(col("c_nationkey"), col("c_custkey"),
      col("c_acctbal")).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getDouble(2)))
    val nations = t.nation.select(col("n_nationkey"), col("n_name"))
      .collect().map(r => (r.getInt(0).toLong, r.getString(1))).toMap
    val want = custs.groupBy(_._1).toSeq.flatMap { case (nk, xs) =>
      val top = xs.sortBy(c => (-c._3, c._2)).take(2)
      top.map(c => (nations(nk), c._2,
        math.floor(c._3 * 100 + 0.5).toLong, xs.length.toLong))
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.SqlSurface.q364LateralTopn(spark, sfDir)
      .orderBy("nation", "c_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
  }

  test("q365 equals a driver-side multi-source BFS recompute") {
    import graft.queries.GraphOps.{BFS_MAX_HOPS, BFS_SEED_MOD, HARMONIC_W, TRIANGLE_MIN_SUPPORT}
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // support counts ROW pairs, like the self-join the operator runs
    val rowPairs = li.groupBy(_._1).values.toSeq.flatMap { xs =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }
    val edges0 = rowPairs.groupBy(identity).toSeq.collect {
      case (p, occ) if occ.size >= TRIANGLE_MIN_SUPPORT => p
    }
    val adj = (edges0 ++ edges0.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = adj.keySet.filter(_ % BFS_SEED_MOD == 0)
    val want = seeds.toSeq.sorted.map { s =>
      var visited = Set(s)
      var frontier = Set(s)
      var nReach = 0L
      var h = 0L
      (1 to BFS_MAX_HOPS).foreach { d =>
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- visited
        visited ++= next
        frontier = next
        nReach += next.size
        h += next.size * HARMONIC_W(d)
      }
      (s, nReach, h)
    }
    val got = graft.queries.GraphOps.q365HarmonicCentrality(spark, sfDir)
      .orderBy("seed").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(edges0.nonEmpty && seeds.nonEmpty) // fixture sanity
  }
}
