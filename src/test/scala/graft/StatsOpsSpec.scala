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

  test("q136 rank-sum AUC matches a driver-side midrank computation") {
    val w = StatsOps.LOGREG_W
    val scored = Tables(spark, sfDir).lineitem
      .select("l_quantity", "l_discount", "l_returnflag").collect()
      .map { r =>
        val z = w(0) + w(1) * r.getDouble(0) + w(2) * r.getDouble(1)
        val p = 1.0 / (1.0 + math.exp(-z))
        (math.floor(p * 1e6 + 0.5).toLong,
          if (r.getString(2) == "R") 1L else 0L)
      }
    // textbook midrank U-statistic, computed the naive way
    val byScore = scored.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0L; var rankSum2 = 0L
    byScore.foreach { case (_, rows) =>
      val c = rows.length.toLong; val pos = rows.map(_._2).sum
      rankSum2 += pos * (2 * cum + c + 1)
      cum += c
    }
    val np = scored.map(_._2).sum
    val nn = scored.length - np
    val auc = (rankSum2.toDouble - np.toDouble * (np + 1).toDouble) /
      (2.0 * np.toDouble * nn.toDouble)
    val r = StatsOps.q136RocAuc(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == scored.length.toLong)
    assert(r(0).getLong(1) == np && r(0).getLong(2) == nn)
    assert(r(0).getLong(3) == math.floor(auc * 1e6 + 0.5).toLong)
    // AUC is a probability
    assert(r(0).getLong(3) >= 0L && r(0).getLong(3) <= 1000000L)
  }

  test("q136 plan: no one-task global window (only __pid-partitioned windows)") {
    val df = StatsOps.q136RocAuc(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // every Window in the plan must be partitioned (GlobalRank's __pid)
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      "unpartitioned window found")
  }

  test("q137 threshold sweep is consistent and recall is antitone in the threshold") {
    val rows = StatsOps.q137PrThresholds(spark, sfDir)
      .orderBy("threshold_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == StatsOps.PR_THRESHOLDS.length)
    val np = rows.head._2 + rows.head._4 // tp + fn is threshold-free
    rows.foreach { case (_, tp, fp, fn, prec, rec, f1) =>
      assert(tp + fn == np, "tp + fn must equal the positive count")
      assert(rec == math.floor(tp * 1e6 / np + 0.5).toLong)
      if (tp + fp > 0)
        assert(prec == math.floor(tp * 1e6 / (tp + fp) + 0.5).toLong)
      else assert(prec == -1L)
      assert(f1 == math.floor(2.0 * tp * 1e6 / (tp + fp + np) + 0.5).toLong)
    }
    // raising the threshold can only shrink the predicted-positive set
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, "tp/fp must be antitone")
    }
    // the sweep actually spans the score range (not all-zero, not all-n)
    assert(rows.head._2 > rows.last._2, "sweep must discriminate")
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

  test("q141 mutual information matches a driver-side contingency computation") {
    val ev = Tables(spark, sfDir).events
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), (r.getLong(1) / 86400000000L) % 7))
    val n = ev.length.toLong
    val cells = ev.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rx = ev.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cy = ev.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val expected = cells.map { case ((t, w), c) =>
      val term = (c.toDouble / n.toDouble) *
        math.log((c.toDouble * n.toDouble) / (rx(t).toDouble * cy(w).toDouble))
      ((t, w), (c, math.floor(term * 1e9 + 0.5).toLong))
    }
    val got = StatsOps.q141MutualInfo(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    expected.foreach { case (k, e) => assert(got(k) == e, s"cell $k") }
    val tot = got(("__all", -1L))
    assert(tot._1 == n)
    assert(tot._2 == expected.values.map(_._2).sum, "headline MI folds the cells")
    // MI of a genuine joint distribution is non-negative (up to quantization)
    assert(tot._2 >= -cells.size)
  }

  test("q142 Gini matches a driver-side rank-weighted computation and is in [0,1]") {
    val spend = Tables(spark, sfDir).orders
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }.toSeq
    val ranked = spend.sortBy { case (k, c) => (c, k) }.zipWithIndex
      .map { case ((_, c), i) => (i + 1L, c) }
    val n = ranked.length.toLong
    val s = ranked.map(_._2).sum
    val t = ranked.map { case (i, c) => i * c }.sum
    val gini = 2.0 * t.toDouble / (n.toDouble * s.toDouble) -
      (n + 1).toDouble / n.toDouble
    val r = StatsOps.q142GiniSpend(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == n && r(0).getLong(1) == s)
    assert(r(0).getLong(2) == math.floor(gini * 1e6 + 0.5).toLong)
    assert(r(0).getLong(2) >= 0L && r(0).getLong(2) <= 1000000L)
  }

  test("q143 CUSUM matches a driver-side recompute and flags the earliest argmax day") {
    val days = Tables(spark, sfDir).events
      .select(unix_micros(col("ts")).as("us")).collect()
      .map(_.getLong(0) / 86400000000L)
    val rollup = days.groupBy(identity).map { case (d, v) => (d, v.length.toLong) }
      .toSeq.sortBy(_._1)
    val total = rollup.map(_._2).sum
    val meanMicro = math.floor(total.toDouble * 1e6 / rollup.length.toDouble + 0.5).toLong
    var cum = 0L
    val expected = rollup.map { case (d, n) =>
      cum += n * 1000000L - meanMicro
      (d, n, cum)
    }
    val cpDay = expected.filter(e => math.abs(e._3) ==
      expected.map(x => math.abs(x._3)).max).map(_._1).min
    val got = StatsOps.q143CusumChangepoint(spark, sfDir)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == expected)
    assert(got.count(_._4 == 1L) == 1, "exactly one changepoint")
    assert(got.find(_._4 == 1L).get._1 == cpDay)
  }

  test("q157 skew probe reconciles with a driver-side key histogram") {
    val keys = Tables(spark, sfDir).lineitem
      .select("l_orderkey").collect().map(_.getLong(0))
    val hist = keys.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val nKeys = hist.size.toLong; val nRows = keys.length.toLong
    val maxC = hist.values.max
    val got = StatsOps.q157SkewProbe(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("n_keys") == nKeys && got("n_rows") == nRows)
    assert(got("max_key_rows") == maxC)
    assert(got("mean_key_rows_micro") ==
      math.floor(nRows.toDouble * 1e6 / nKeys.toDouble + 0.5).toLong)
    assert(got("skew_max_over_mean_micro") ==
      math.floor(maxC.toDouble * nKeys.toDouble * 1e6 / nRows.toDouble + 0.5).toLong)
    // top keys: heaviest first, lower-key ties
    val top = hist.toSeq.sortBy { case (k, c) => (-c, k) }.take(3)
    (1 to 3).zip(top).foreach { case (i, (k, c)) =>
      assert(got(s"top${i}_key") == k, s"top$i key")
      assert(got(s"top${i}_rows") == c, s"top$i rows")
    }
    // exact interpolated median of per-key counts
    val sorted = hist.values.toSeq.sorted.map(_.toDouble)
    val idx = 0.5 * (sorted.length - 1)
    val p50 = sorted(idx.toInt) +
      (sorted(math.ceil(idx).toInt) - sorted(idx.toInt)) * (idx - idx.toInt)
    assert(got("p50_key_rows_micro") == math.floor(p50 * 1e6 + 0.5).toLong)
  }

  test("q226 slopes equal the closed-form OLS on collected points") {
    val pts = Tables(spark, sfDir).events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("x"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = StatsOps.q226GroupTrend(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("slope_micro_c_per_day"), r.getAs[Long]("intercept_c")))
      .toMap
    pts.groupBy(_._1).foreach { case (et, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum; val sy = xs.map(_._3).sum
      val sxy = xs.map(t => t._2 * t._3).sum
      val sxx = xs.map(t => t._2 * t._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
      val wantSlope = math.floor(slope * 1e6 + 0.5).toLong
      val wantIcpt = math.floor((sy.toDouble - slope * sx) / n + 0.5).toLong
      assert(got(et) === ((wantSlope, wantIcpt)), s"group $et")
    }
  }

  test("q210 KS drift matches a driver-side CDF race") {
    val rows = Tables(spark, sfDir).lineitem
      .select(
        expr(s"cast(floor(l_extendedprice * 100 + 0.5) as bigint) div ${StatsOps.KS_BUCKET_CENTS}")
          .as("bucket"),
        (col("l_shipdate") < lit(StatsOps.KS_SPLIT_DATE).cast("timestamp"))
          .as("is_ref"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val buckets = rows.groupBy(_._1).map { case (b, xs) =>
      (b, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    val nRef = buckets.map(_._2).sum; val nCur = buckets.map(_._3).sum
    var ca = 0L; var cb = 0L
    val gaps = buckets.map { case (b, a, c) =>
      ca += a; cb += c; (b, math.abs(ca * nCur - cb * nRef))
    }
    val maxGap = gaps.map(_._2).max
    val r = StatsOps.q210KsDrift(spark, sfDir).head
    assert(r.getAs[Long]("n_ref") === nRef)
    assert(r.getAs[Long]("n_cur") === nCur)
    assert(r.getAs[Long]("d_bucket") === gaps.filter(_._2 == maxGap).map(_._1).min)
    assert(r.getAs[Long]("d_micro") ===
      math.floor(maxGap * 1e6 / (nRef.toDouble * nCur) + 0.5).toLong)
  }

  test("q211 U statistic equals the brute-force pairwise count") {
    val vals = Tables(spark, sfDir).events
      .filter(col("event_type").isin(StatsOps.MW_GROUP_A, StatsOps.MW_GROUP_B))
      .select(floor(col("value") * 100 + lit(0.5)).cast("long").as("v"),
        (col("event_type") === StatsOps.MW_GROUP_A).as("isA"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val as = vals.filter(_._2).map(_._1); val bs = vals.filter(!_._2).map(_._1)
    // 2U = #(a>b)*2 + #(a==b) over all cross pairs — count via sorted bs
    val sortedB = bs.sorted
    def lowerBound(x: Long): Int = {
      var lo = 0; var hi = sortedB.length
      while (lo < hi) { val m = (lo + hi) / 2
        if (sortedB(m) < x) lo = m + 1 else hi = m }
      lo
    }
    def upperBound(x: Long): Int = {
      var lo = 0; var hi = sortedB.length
      while (lo < hi) { val m = (lo + hi) / 2
        if (sortedB(m) <= x) lo = m + 1 else hi = m }
      lo
    }
    val u2 = as.map(a => 2L * lowerBound(a) + (upperBound(a) - lowerBound(a))).sum
    val r = StatsOps.q211MannWhitney(spark, sfDir).head
    assert(r.getAs[Long]("n_a") === as.length.toLong)
    assert(r.getAs[Long]("n_b") === bs.length.toLong)
    assert(r.getAs[Long]("u2") === u2)
    val auc = r.getAs[Long]("auc_micro")
    assert(auc >= 0L && auc <= 1000000L)
  }
}
