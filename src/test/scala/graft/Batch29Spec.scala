package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-29 specs: Markov perplexity (q340), split-conformal
  * coverage (q341), and leave-one-source-out valuation (q342) — each
  * re-derived imperatively on sf0.001.
  */
class Batch29Spec extends SparkSpec {

  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  private lazy val events = Tables(spark, sfDir).events
    .select("user_id", "ts", "event_id", "event_type").collect()
    .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
      r.getString(3)))

  test("q340 equals a driver-side Laplace log-loss recompute") {
    val got = graft.queries.TemporalOps.q340MarkovPerplexity(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cutoff = java.sql.Timestamp.valueOf(
      graft.queries.TemporalOps.MARKOV_SPLIT).getTime
    val trans = events.groupBy(_._1).values.toSeq.flatMap { xs =>
      xs.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4, b._2 < cutoff)
      }
    }
    val nTrain = trans.filter(_._3).groupBy(t => (t._1, t._2))
      .view.mapValues(_.size.toLong).toMap
    val prevTot = trans.filter(_._3).groupBy(_._1)
      .view.mapValues(_.size.toLong).toMap
    val k = nTrain.keySet.map(_._2).size.toLong
    val want = trans.filterNot(_._3).groupBy(_._1).map { case (p, xs) =>
      val nll = xs.groupBy(_._2).map { case (nx, ys) =>
        val term = micro(math.log(
          (nTrain.getOrElse((p, nx), 0L) + 1.0) /
            (prevTot.getOrElse(p, 0L) + k).toDouble))
        -term * ys.size
      }.sum
      p -> ((xs.size.toLong, nll,
        micro(math.exp(nll.toDouble / 1e6 / xs.size.toDouble))))
    }
    assert(got === want)
  }

  test("q341 equals a driver-side split-conformal recompute") {
    import graft.queries.TemporalOps.{CONF_CAL_END, CONF_FIT_END}
    val got = graft.queries.TemporalOps.q341ConformalCoverage(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val fitEnd = java.sql.Timestamp.valueOf(CONF_FIT_END).getTime
    val calEnd = java.sql.Timestamp.valueOf(CONF_CAL_END).getTime
    val dayMs = 86400000L
    val daily = events.groupBy(e => (e._4, e._2 / dayMs))
      .map { case ((t, d), xs) => (t, d * dayMs, xs.size.toLong) }.toSeq
    val want = daily.groupBy(_._1).flatMap { case (t, xs) =>
      val fitCnts = xs.filter(_._2 < fitEnd).map(_._3).sorted
      if (fitCnts.isEmpty) None else {
        val f = fitCnts(math.ceil(fitCnts.length.toDouble / 2).toInt - 1)
        val rs = xs.filter(x => x._2 >= fitEnd && x._2 < calEnd)
          .map(x => math.abs(x._3 - f)).sorted
        val idx = math.min(
          math.ceil((rs.length + 1).toDouble * 0.8).toInt, rs.length)
        val qhat = rs(idx - 1)
        val test = xs.filter(_._2 >= calEnd)
        val cov = test.count(x => math.abs(x._3 - f) <= qhat).toLong
        Some(t -> ((f, qhat, test.size.toLong, cov,
          math.floor(cov * 1e6 / test.size + 0.5).toLong)))
      }
    }
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q342 equals a driver-side LOO-identity recompute") {
    val got = graft.queries.TrainPrep.q342LooSourceValue(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val docs = Tables(spark, sfDir).documents
      .select("source", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split("\\s+")
          .count(_.nonEmpty).toLong
        (r.getString(0), toks, r.getString(1).length.toLong)
      }
    val n = docs.length.toLong
    val s = docs.map(_._2).sum
    val c = docs.map(_._3).sum
    val want = docs.groupBy(_._1).map { case (src, xs) =>
      val (nd, ts, cs) = (xs.length.toLong, xs.map(_._2).sum,
        xs.map(_._3).sum)
      src -> ((nd,
        micro(ts.toDouble / nd.toDouble),
        micro((s - ts).toDouble / (n - nd).toDouble),
        micro((s - ts).toDouble / (n - nd).toDouble -
          s.toDouble / n.toDouble),
        micro((c - cs).toDouble / (s - ts).toDouble -
          c.toDouble / s.toDouble)))
    }
    assert(got === want)
    assert(got.size > 1, "LOO needs more than one source")
  }
}
