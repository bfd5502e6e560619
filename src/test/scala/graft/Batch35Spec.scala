package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-35 spec: Good–Turing spectrum (q356), truncation-loss
  * curve (q357), Poisson overdispersion (q358) — driver-side
  * recomputes from first principles.
  */
class Batch35Spec extends SparkSpec {

  test("q356 equals a driver-side count-of-counts recompute") {
    import graft.queries.LlmText.GT_MAX_R
    val tris = Tables(spark, sfDir).documents
      .select(col("text")).collect()
      .flatMap { r =>
        val t = r.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (t.length < 3) Seq.empty[String]
        else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
      }
    val freq = tris.groupBy(identity).map(_._2.length.toLong)
    val spec = freq.filter(_ <= GT_MAX_R + 1)
      .groupBy(identity).map { case (r, xs) => r -> xs.size.toLong }
    val want = spec.filter(_._1 <= GT_MAX_R).toSeq.sortBy(_._1)
      .map { case (r, nr) =>
        val gt = spec.get(r + 1).map(n1 =>
          math.floor((r + 1).toDouble * n1.toDouble / nr.toDouble * 1e6 +
            0.5).toLong).getOrElse(0L)
        (r, nr, gt)
      }
    val got = graft.queries.LlmText.q356GoodTuring(spark, sfDir)
      .orderBy("r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    // a natural corpus has singletons, and N_r decays overall
    assert(want.head._1 === 1L && want.head._2 > 0L)
  }

  test("q357 equals a driver-side truncation recompute; share is monotone in cap") {
    import graft.queries.TrainPrep.TRUNC_GRID
    val lens = Tables(spark, sfDir).documents
      .select(col("n_chars")).collect().map(_.getLong(0))
    val total = lens.sum
    val want = TRUNC_GRID.map { cap =>
      val kept = lens.map(l => math.min(l, cap)).sum
      (cap, lens.length.toLong, lens.count(_ > cap).toLong, kept,
        math.floor(kept.toDouble / total.toDouble * 1e6 + 0.5).toLong)
    }
    val got = graft.queries.TrainPrep.q357TruncationCurve(spark, sfDir)
      .orderBy("cap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === want)
    assert(got.map(_._5) === got.map(_._5).sorted,
      "kept share must be monotone in the cap")
  }

  test("q358 equals a driver-side dispersion recompute") {
    import graft.queries.StatsOps.OVERDISP_MICRO
    val days = Tables(spark, sfDir).events
      .select(col("event_type"), unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000L))
    val want = days.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (ty, xs) =>
        val counts = xs.groupBy(_._2).map(_._2.length.toLong).toSeq
        val n = counts.size.toLong
        val sx = counts.sum
        val sxx = counts.map(c => c * c).sum
        if (n < 2 || sx == 0) None
        else {
          val num = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
          val chi2 = math.floor(num / sx.toDouble * 1e6 + 0.5).toLong
          val disp = math.floor(num / ((n - 1).toDouble * sx.toDouble) *
            1e6 + 0.5).toLong
          Some((ty, n, sx, chi2, n - 1, disp, disp > OVERDISP_MICRO))
        }
    }
    val got = graft.queries.StatsOps.q358Overdispersion(spark, sfDir)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got === want)
  }
}
