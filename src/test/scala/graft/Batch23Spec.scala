package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-23 specs: histogram split finder and WoE/IV feature
  * report (q320–q321) — independent driver-side re-derivations on
  * sf0.001.
  */
class Batch23Spec extends SparkSpec {

  import graft.queries.StatsOps.SPLIT_B

  private def binned(): Map[Long, (Long, Long)] = {
    val rows = Tables(spark, sfDir).events
      .select(floor(col("value") * 100 + lit(0.5)).cast("long"),
        (col("event_type") === "purchase").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = rows.map(_._1).min; val hi = rows.map(_._1).max
    rows.groupBy { case (c, _) => (c - lo) * SPLIT_B / (hi - lo + 1) }
      .view.mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
  }

  test("q320 equals a driver-side split-gain recompute") {
    val got = graft.queries.StatsOps.q320SplitFinder(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    val bins = binned().toSeq.sortBy(_._1)
    val nTot = bins.map(_._2._1).sum
    val posTot = bins.map(_._2._2).sum
    var (nl, pl) = (0L, 0L)
    val scored = bins.flatMap { case (b, (n, pos)) =>
      nl += n; pl += pos
      if (nl >= nTot) None
      else {
        val (nr, pr) = (nTot - nl, posTot - pl)
        val purity =
          ((pl * pl + (nl - pl) * (nl - pl)).toDouble / nl +
            (pr * pr + (nr - pr) * (nr - pr)).toDouble / nr) * 1e6 / nTot
        Some((b, nl, pl, nr, pr, math.floor(purity + 0.5).toLong))
      }
    }
    val bestKey = scored.map(s => s._6 * SPLIT_B + (SPLIT_B - 1 - s._1)).max
    val want = scored.map { case (b, l, p, r, q, m) =>
      b -> ((l, p, r, q, m, m * SPLIT_B + (SPLIT_B - 1 - b) == bestKey))
    }.toMap
    assert(got === want)
    // exactly one best split, and it maximizes purity
    assert(got.values.count(_._6) === 1)
    val bp = got.values.filter(_._6).head._5
    assert(got.values.forall(_._5 <= bp))
  }

  test("q321 equals a driver-side WoE/IV recompute") {
    val got = graft.queries.StatsOps.q321WoeIv(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val bins = binned()
    val pTot = bins.values.map(_._2).sum
    val negTot = bins.values.map(v => v._1 - v._2).sum
    val want = bins.map { case (b, (n, pos)) =>
      val neg = n - pos
      val woe = math.log(((pos + 0.5) / pTot) / ((neg + 0.5) / negTot))
      val iv = (pos.toDouble / pTot - neg.toDouble / negTot) * woe
      b -> ((n, pos, neg, woe, iv))
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (b, (n, pos, neg, woe, iv)) =>
      val (wn, wp, wg, ww, wi) = want(b)
      assert((n, pos, neg) === ((wn, wp, wg)), b)
      assert(math.abs(woe - ww) < 1e-12 && math.abs(iv - wi) < 1e-12, b)
    }
  }
}
