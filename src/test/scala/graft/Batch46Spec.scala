package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-46 spec: quantile treatment effects (q393) and
  * covariate-shift importance weights + ESS (q394) — driver-side
  * recomputes via literal sorted order statistics / histogram folds.
  */
class Batch46Spec extends SparkSpec {

  test("q393 equals sorted order statistics per arm") {
    val rows = Tables(spark, sfDir).events
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0) % 2,
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    def q(arm: Long, nu: Long, de: Long): Long = {
      val xs = rows.filter(_._1 == arm).map(_._2).sorted
      val k = ((xs.length * nu + de - 1) / de).toInt // ceil(p*n)
      xs(k - 1)
    }
    val want = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L))
      .map { case (l, nu, de) =>
        val a = q(0, nu, de); val b = q(1, nu, de)
        (l, a, b, a - b)
      }.toSet
    val got = graft.queries.StatsOps.q393Qte(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
  }

  test("q394 equals a driver-side histogram fold; ESS <= n and the " +
    "weighted target share reproduces the target") {
    import graft.queries.TrainPrep.{IW_BIN_CAP, IW_BIN_WIDTH, IW_MAX_PPM}
    val rows = Tables(spark, sfDir).documents
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (math.min(r.getLong(0) / IW_BIN_WIDTH, IW_BIN_CAP),
        r.getString(1) == "en"))
    val hist = rows.toSeq.groupBy(_._1).toSeq.map { case (b, xs) =>
      (b, xs.length.toLong, xs.count(_._2).toLong)
    }
    val nS = hist.map(_._2).sum; val nT = hist.map(_._3).sum
    val w = hist.map { case (b, s, t) =>
      val raw = t * nS * 1000000L / (s * nT)
      (b, s, t, math.min(raw, IW_MAX_PPM),
        if (raw > IW_MAX_PPM) 1L else 0L)
    }
    val sw = w.map(x => x._2 * x._4).sum
    val sww = w.map(x => x._2 * x._4 * x._4).sum
    val ess = sw.toDouble * sw / sww
    val wantBins = w.map { case (b, s, t, wp, c) =>
      (b, s, t, wp, c, 0L, 0L)
    }.toSet
    val wantAll = (-1L, nS, nT, 0L, w.map(x => x._5 * x._2).sum,
      math.floor(ess * 1e6 + 0.5).toLong,
      math.floor(ess / nS * 1e6 + 0.5).toLong)
    val got = graft.queries.TrainPrep
      .q394ImportanceWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === (wantBins + wantAll))
    // ESS can never exceed n (Cauchy-Schwarz)
    assert(wantAll._6 <= nS * 1000000L)
    // reweighting sanity: weights integrate to ~1 over the source
    // (Σ s_b·w_b ≈ n_s in ppm, off only by per-bin floor rounding)
    assert(math.abs(sw - nS * 1000000L) <= 1000000L * hist.size)
  }
}
