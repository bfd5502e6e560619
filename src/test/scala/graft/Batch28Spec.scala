package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-28 specs: pinball-loss quantile backtest (q336),
  * U-shaped attribution (q337), and the Fellegi-Sunter EM half-step
  * (q338) — each re-derived imperatively on sf0.001.
  */
class Batch28Spec extends SparkSpec {

  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  private lazy val events = Tables(spark, sfDir).events
    .select("user_id", "ts", "event_id", "event_type").collect()
    .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
      r.getString(3)))

  test("q336 equals a driver-side order-stat + pinball recompute") {
    val got = graft.queries.TemporalOps.q336PinballBacktest(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val cutoff = java.sql.Timestamp.valueOf(
      graft.queries.TemporalOps.MARKOV_SPLIT).getTime
    val dayMs = 86400000L
    val daily = events.groupBy(e => (e._4, e._2 / dayMs))
      .map { case ((t, d), xs) => (t, d * dayMs, xs.size.toLong) }.toSeq
    val want = (for {
      (lbl, q) <- graft.queries.TemporalOps.PINBALL_QS
      (t, trainCnts) <- daily.filter(_._2 < cutoff).groupBy(_._1)
    } yield {
      val s = trainCnts.map(_._3).sorted
      val f = s(math.ceil(q * s.length).toInt - 1)
      val ev = daily.filter(d => d._1 == t && d._2 >= cutoff)
      val loss = ev.map { case (_, _, y) =>
        micro(math.max(q * (y - f), (q - 1.0) * (y - f)))
      }.sum
      (t, lbl) -> ((f, ev.size.toLong, loss))
    }).toMap
    assert(got === want)
  }

  test("q337 equals a driver-side journey-credit recompute") {
    val got = graft.queries.OpsAnalytics.q337UShapedAttribution(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val byUser = events.groupBy(_._1)
    val credits = byUser.toSeq.flatMap { case (u, xs) =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      sorted.find(_._4 == "purchase").toSeq.flatMap { fp =>
        val j = sorted.takeWhile(e => (e._2, e._3) != ((fp._2, fp._3)))
        val n = j.length
        j.zipWithIndex.map { case (e, i) =>
          val c =
            if (n == 1) 1000000L
            else if (n == 2) 500000L
            else if (i == 0 || i == n - 1) 400000L
            else math.floor(200000.0 / (n - 2)).toLong
          (u, e._4, c)
        }
      }
    }
    val want = credits.groupBy(_._2).map { case (t, xs) =>
      t -> ((xs.size.toLong, xs.map(_._1).distinct.size.toLong,
        xs.map(_._3).sum))
    }
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q338 equals a driver-side one-iteration EM recompute") {
    import graft.queries.CorpusOps.{FS_FIELDS, FS_LAMBDA}
    import graft.queries.CorpusOps.LINK_BAND
    val got = graft.queries.CorpusOps.q338FsEmStep(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val o = Tables(spark, sfDir).orders
      .select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (r.getString(2), r.getString(4), fmt.format(r.getTimestamp(5)),
          math.floor(r.getDouble(3) / LINK_BAND).toLong)))
    val patterns = o.groupBy(_._1).values.toSeq.flatMap { xs =>
      for {
        a <- xs.toSeq; b <- xs.toSeq if a._2 < b._2
      } yield (a._3._1 == b._3._1, a._3._2 == b._3._2,
        a._3._3 == b._3._3, a._3._4 == b._3._4)
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val rows = patterns.map { case ((g1, g2, g3, g4), n) =>
      val gs = Seq(g1, g2, g3, g4)
      val pm = FS_FIELDS.zip(gs).foldLeft(FS_LAMBDA) {
        case (acc, ((_, m, _), g)) => acc * (if (g) m else 1.0 - m)
      }
      val pu = FS_FIELDS.zip(gs).foldLeft(1.0 - FS_LAMBDA) {
        case (acc, ((_, _, u), g)) => acc * (if (g) u else 1.0 - u)
      }
      val w = pm / (pm + pu)
      (gs, n, micro(w * n), micro((1.0 - w) * n))
    }
    val want = FS_FIELDS.zipWithIndex.map { case ((f, _, _), i) =>
      val wnT = rows.map(_._3).sum
      val unT = rows.map(_._4).sum
      val wnF = rows.filter(_._1(i)).map(_._3).sum
      val unF = rows.filter(_._1(i)).map(_._4).sum
      f -> ((micro(wnF.toDouble / wnT.toDouble),
        micro(unF.toDouble / unT.toDouble)))
    }.toMap + ("lambda" ->
      ((micro(rows.map(_._3).sum.toDouble /
        (rows.map(_._2).sum.toDouble * 1e6)), -1L)))
    assert(got === want)
    got.filterNot(_._1 == "lambda").values.foreach { case (m, u) =>
      assert(m >= 0 && m <= 1000000 && u >= 0 && u <= 1000000)
    }
  }
}
