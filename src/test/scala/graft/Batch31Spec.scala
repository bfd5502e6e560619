package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-31 specs: lead-lag cross-correlation (q344) and the
  * per-dimension embedding whitening report (q345) — re-derived
  * imperatively on sf0.001.
  */
class Batch31Spec extends SparkSpec {

  test("q344 equals a driver-side lagged-Pearson recompute") {
    import graft.queries.TemporalOps.{XCORR_LAGS, XCORR_X, XCORR_Y}
    val got = graft.queries.TemporalOps.q344CrossCorr(spark, sfDir)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val dayMs = 86400000L
    val daily = Tables(spark, sfDir).events
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / dayMs))
      .filter(e => e._1 == XCORR_X || e._1 == XCORR_Y)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val xs = daily.collect { case ((XCORR_X, d), c) => d -> c }.toMap
    val ys = daily.collect { case ((XCORR_Y, d), c) => d -> c }.toMap
    val want = XCORR_LAGS.flatMap { k =>
      val pairs = xs.toSeq.flatMap { case (d, x) =>
        ys.get(d + k).map(y => (x, y))
      }
      if (pairs.isEmpty) None else {
        val n = pairs.length.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val corr = (n * sxy - sx * sy).toDouble /
          math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy))
        Some(k -> ((n, math.floor(corr * 1e6 + 0.5).toLong)))
      }
    }.toMap
    assert(got === want)
    assert(got.size == XCORR_LAGS.size)
  }

  test("q345 equals a driver-side moments recompute") {
    val got = graft.queries.VectorOps.q345WhiteningReport(spark, sfDir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val cells = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").collect()
      .flatMap { r =>
        r.getAs[scala.collection.Seq[Float]](1).zipWithIndex.map {
          case (x, d) =>
            (d, math.floor(x.toDouble * 1e6 + 0.5).toLong)
        }
      }
    val want = cells.groupBy(_._1).map { case (d, xs) =>
      val n = xs.length.toLong
      val s1 = xs.map(_._2).sum
      val s2 = xs.map(x => x._2 * x._2).sum
      val mean = s1.toDouble / n.toDouble
      val sd = math.sqrt(s2.toDouble / n.toDouble -
        (s1.toDouble / n.toDouble) * (s1.toDouble / n.toDouble))
      val out = xs.count(x => math.abs(x._2.toDouble - mean) > 3.0 * sd)
      d -> ((n, math.floor(mean + 0.5).toLong,
        math.floor(sd + 0.5).toLong, out.toLong))
    }
    assert(got === want)
    assert(got.size == 64)
  }
}
