package graft

import graft.queries.StatsOps
import org.apache.spark.sql.functions._

class StatsOpsSpec extends SparkSpec {

  test("q121 one-pass correlation matrix matches a driver-side recompute") {
    val cols = StatsOps.CORR_COLS
    val rows = Tables(spark, sfDir).lineitem
      .select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(r.getDouble))
    val n = rows.length.toLong
    // mirror the split-accumulator moments: per-row integer units,
    // hi/lo long sums, double reconstruction in the same op order
    def s(i: Int) = {
      val u = rows.map(r => math.floor(r(i) * 1e2 + 0.5).toLong).sum
      u.toDouble / 1e2
    }
    def s2(i: Int, j: Int) = {
      val vs = rows.map(r => math.floor(r(i) * r(j) * 1e4 + 0.5).toLong)
      val hi = vs.map(_ >>> 20).sum
      val lo = vs.map(_ & 1048575L).sum
      (hi.toDouble * 1048576.0 + lo.toDouble) / 1e4
    }
    val expected = (for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield {
      val c = (n * s2(i, j) - s(i) * s(j)) /
        (math.sqrt(n * s2(i, i) - s(i) * s(i)) * math.sqrt(n * s2(j, j) - s(j) * s(j)))
      ((cols(i), cols(j)), (n, math.floor(c * 1e6 + 0.5).toLong))
    }).toMap
    val got = StatsOps.q121CorrMatrix(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected && got.size == 6)
    // correlations are genuine: all within [-1, 1] micro-bounds
    got.values.foreach { case (_, c) => assert(c >= -1000000L && c <= 1000000L) }
  }

  test("q121 plan: a single scan with one partial aggregate, no join") {
    val df = StatsOps.q121CorrMatrix(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "correlation matrix must not join")
    assert(p.contains("partial_"), "expected map-side partial aggregation")
  }

  test("q123 Zipf fit matches a driver-side regression over the ranked vocab") {
    val toks = Tables(spark, sfDir).documents
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty))
    val ranked = toks.groupBy(identity).map { case (t, v) => (t, v.length.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((_, c), idx) => (idx + 1L, c) }
    val xy = ranked.map { case (r, c) =>
      (math.floor(math.log(r.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong)
    }
    val m = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum; val sxy = xy.map(p => p._1 * p._2).sum
    val slope = (m * sxy - sx * sy).toDouble / (m * sxx - sx * sx)
    val expSlope = math.floor(slope * 1e6 + 0.5).toLong
    val expInter = math.floor((sy - slope * sx) / m + 0.5).toLong
    val r = StatsOps.q123ZipfSlope(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == m)
    assert(r(0).getLong(1) == expSlope, s"slope ${r(0).getLong(1)} vs $expSlope")
    assert(r(0).getLong(2) == expInter, s"intercept ${r(0).getLong(2)} vs $expInter")
    // a frequency-ranked corpus always fits with negative slope
    assert(expSlope < 0)
  }

  test("q128 gradient step matches a driver-side recompute") {
    val rows = Tables(spark, sfDir).lineitem
      .select("l_quantity", "l_discount", "l_returnflag").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
    val w = StatsOps.LOGREG_W
    var g = Array(0L, 0L, 0L); var loss = 0L
    rows.foreach { case (q, d, rf) =>
      val xs = Seq(1.0, q, d)
      val z = w(0) * xs(0) + w(1) * xs(1) + w(2) * xs(2)
      val p = 1.0 / (1.0 + math.exp(-z))
      val y = if (rf == "R") 1.0 else 0.0
      xs.zipWithIndex.foreach { case (x, j) =>
        g(j) += math.floor((p - y) * x * 1e6 + 0.5).toLong
      }
      loss += math.floor(-(y * math.log(p) + (1.0 - y) * math.log(1.0 - p)) * 1e6 + 0.5).toLong
    }
    val got = StatsOps.q128LogregStep(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(0, 1, 2))
    (0 to 2).foreach { j =>
      assert(got(j) == ((g(j), rows.length.toLong, loss)), s"dim $j")
    }
    // log-loss of a non-degenerate model is strictly positive
    assert(loss > 0)
  }

  test("q134 PSI drift matches a driver-side recompute, total row folds the bins") {
    val cutUs = java.sql.Timestamp
      .valueOf(graft.queries.SessionOps.DIFF_CUTOFF).toInstant.getEpochSecond * 1000000L
    val ev = Tables(spark, sfDir).events
      .select(col("value"), unix_micros(col("ts")).as("tus")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val k = StatsOps.PSI_EDGES.length + 1
    def binOf(v: Double): Int = {
      val i = StatsOps.PSI_EDGES.indexWhere(v < _)
      if (i < 0) StatsOps.PSI_EDGES.length else i
    }
    val ref = ev.filter(_._2 < cutUs).groupBy(e => binOf(e._1)).map { case (b, v) => b -> v.length.toLong }
    val live = ev.filter(_._2 >= cutUs).groupBy(e => binOf(e._1)).map { case (b, v) => b -> v.length.toLong }
    val tRef = ref.values.sum; val tLive = live.values.sum
    val bins = (ref.keySet ++ live.keySet)
    val expected = bins.map { b =>
      val nr = ref.getOrElse(b, 0L); val nl = live.getOrElse(b, 0L)
      val pr = (nr + 1.0) / (tRef + k.toDouble)
      val pl = (nl + 1.0) / (tLive + k.toDouble)
      b -> (nr, nl, math.floor((pl - pr) * math.log(pl / pr) * 1e6 + 0.5).toLong)
    }.toMap
    val got = StatsOps.q134PsiDrift(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    expected.foreach { case (b, e) => assert(got(b) == e, s"bin $b") }
    val tot = got(-1)
    assert(tot._1 == tRef && tot._2 == tLive)
    assert(tot._3 == expected.values.map(_._3).sum, "headline PSI must fold the bins")
    // PSI terms are non-negative by construction
    expected.values.foreach { case (_, _, t) => assert(t >= 0) }
  }

  test("q135 calibration bins fold to the corpus totals and probabilities stay in range") {
    val rows = StatsOps.q135CalibrationBins(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val n = Tables(spark, sfDir).lineitem.count()
    assert(rows.map(_._2).sum == n, "bins must partition the table")
    rows.foreach { case (bin, nb, pos, meanP, rate) =>
      assert(bin >= 0 && bin < StatsOps.CALIB_BINS)
      assert(pos >= 0 && pos <= nb)
      assert(meanP >= 0 && meanP <= 1000000L)
      assert(rate == math.floor(pos * 1e6 / nb + 0.5).toLong)
      // the bin's mean prediction sits inside the bin's bounds
      assert(meanP >= bin * 1000000L / StatsOps.CALIB_BINS - 1 &&
        meanP <= (bin + 1) * 1000000L / StatsOps.CALIB_BINS + 1)
    }
  }

  test("q125 suppresses small cells and adds the deterministic seeded noise") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cells = Tables(spark, sfDir).events
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    assert(cells.values.exists(_ < StatsOps.K_ANON),
      "fixture must exercise suppression")
    assert(cells.values.exists(_ >= StatsOps.K_ANON),
      "fixture must exercise release")
    val expected = cells.filter(_._2 >= StatsOps.K_ANON).map { case ((t, d), n) =>
      val u = (java.lang.Long.parseLong(md5hex(s"dp:$t:$d").take(6), 16) + 0.5) /
        16777216.0
      val lap = if (u < 0.5) StatsOps.DP_B * math.log(2.0 * u)
        else -StatsOps.DP_B * math.log(2.0 * (1.0 - u))
      ((t, d), n + math.floor(lap + 0.5).toLong)
    }
    val got = StatsOps.q125PrivateRelease(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == expected)
    // the noise is bounded enough that released counts stay plausible
    got.foreach { case (k, noisy) =>
      assert(math.abs(noisy - cells(k)) <= 200, s"$k noise unreasonable")
    }
  }
}
