package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-40 spec: Kruskal–Wallis (q372) and Spearman rank
  * correlation (q373) — driver-side midrank recomputes.
  */
class Batch40Spec extends SparkSpec {

  test("q372 equals a driver-side midrank recompute") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val evs = Tables(spark, sfDir).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val grid = evs.groupBy(_._2).toSeq.sortBy(_._1)
    var cum = 0L
    val ranked = grid.map { case (v, xs) =>
      val t = xs.length.toLong
      val mr2 = 2 * cum + t + 1
      cum += t
      (v, xs, t, mr2)
    }
    val nn = evs.length.toLong
    val ties = ranked.map(r => r._3 * r._3 * r._3 - r._3).sum
    val s = types.map { ty =>
      val r2 = ranked.map { case (_, xs, _, mr2) =>
        xs.count(_._1 == ty).toLong * mr2
      }.sum
      val n = evs.count(_._1 == ty).toLong
      math.floor(r2.toDouble * r2.toDouble / (4.0 * n.toDouble) + 0.5)
        .toLong
    }.sum
    val nD = nn.toDouble
    val hRaw = 12.0 / (nD * (nD + 1.0)) * s.toDouble - 3.0 * (nD + 1.0)
    val corr = 1.0 - ties.toDouble / (nD * nD * nD - nD)
    val want = (nn, 5L, ties, math.floor(hRaw * 1e6 + 0.5).toLong,
      math.floor(hRaw / corr * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q372KruskalWallis(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    assert(got === want)
    // null group assignment: H stays near its chi-square df (k-1=4)
    assert(got._5 < 30000000L)
  }

  test("q373 equals a driver-side Spearman recompute; |rho| <= 1") {
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_quantity"), col("l_discount")).collect()
      .map(r => (r.getDouble(0).toLong,
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def mr2(xs: Seq[Long]): Map[Long, Long] = {
      var cum = 0L
      xs.groupBy(identity).toSeq.sortBy(_._1).map { case (v, ys) =>
        val t = ys.length.toLong
        val m = 2 * cum + t + 1
        cum += t
        v -> m
      }.toMap
    }
    val mq = mr2(li.map(_._1).toSeq)
    val mp = mr2(li.map(_._2).toSeq)
    val cells = li.groupBy(identity).toSeq
      .map { case ((q, p), xs) => (xs.length.toLong, mq(q), mp(p)) }
    def s(f: (Long, Long, Long) => Double): Long =
      cells.map { case (c, x, y) =>
        math.floor(f(c, x, y) + 0.5).toLong
      }.sum
    val nn = li.length.toLong
    val sx = s((c, x, _) => c.toDouble * x.toDouble)
    val sy = s((c, _, y) => c.toDouble * y.toDouble)
    val sxx = s((c, x, _) => c.toDouble * x.toDouble * x.toDouble)
    val sxy = s((c, x, y) => c.toDouble * x.toDouble * y.toDouble)
    val syy = s((c, _, y) => c.toDouble * y.toDouble * y.toDouble)
    val rho = (nn.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      math.sqrt((nn.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (nn.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    val want = (nn, math.floor(rho * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q373SpearmanRho(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(got === want)
    assert(math.abs(got._2) <= 1000000L)
  }
}
