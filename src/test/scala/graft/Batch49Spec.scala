package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-49 spec: winsorized Welch (q401), MASE forecast eval
  * (q402), James–Stein shrinkage (q403) — driver recomputes, plus a
  * CONSTRUCTED corpus that drives q403's λ>0 path (the fixture's iid
  * values make τ²=0 the correct reading, which would leave partial
  * shrinkage untested).
  */
class Batch49Spec extends SparkSpec {

  test("q401 equals a driver-side clip-then-Welch recompute") {
    val rows = Tables(spark, sfDir).events
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0) % 2,
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val sorted = rows.map(_._2).sorted
    val n = sorted.length.toLong
    def cut(num: Long, den: Long): Long = {
      // smallest v with cum*den >= n*num over the value grid ==
      // the ceil(n*num/den)-th order statistic
      val k = ((n * num + den - 1) / den).toInt
      sorted(k - 1)
    }
    val lo = cut(1, 20); val hi = cut(19, 20)
    val clipped = rows.map { case (a, v) =>
      (a, math.min(math.max(v, lo), hi))
    }
    def mom(arm: Long) = {
      val xs = clipped.filter(_._1 == arm).map(_._2)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (n0, s0, ss0) = mom(0); val (n1, s1, ss1) = mom(1)
    def va(ss: Long, s: Long, nn: Long) =
      (ss.toDouble - s.toDouble * s / nn) / (nn - 1.0)
    val v0 = va(ss0, s0, n0); val v1 = va(ss1, s1, n1)
    val se2 = v0 / n0 + v1 / n1
    val diff = s0.toDouble / n0 - s1.toDouble / n1
    val df = se2 * se2 / (v0 * v0 / (n0.toDouble * n0 * (n0 - 1.0)) +
      v1 * v1 / (n1.toDouble * n1 * (n1 - 1.0)))
    val want = (n0, n1, lo, hi,
      math.floor(diff * 1e6 + 0.5).toLong,
      math.floor(diff / math.sqrt(se2) * 1e6 + 0.5).toLong,
      math.floor(df * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q401WinsorWelch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).head
    assert(got === want)
    // the winsorized Welch df must not exceed n-2
    assert(got._7 <= (n - 2) * 1000000L)
  }

  test("q402 equals a driver-side lag fold; eval window excludes the " +
    "first week") {
    val daily = Tables(spark, sfDir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("d").agg(sum("c").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val ys = daily.map(_._2)
    val idx = 7 until ys.length
    val sae7 = idx.map(i => math.abs(ys(i) - ys(i - 7)).toLong).sum
    val sae1 = idx.map(i => math.abs(ys(i) - ys(i - 1)).toLong).sum
    val want = (idx.length.toLong, sae7, sae1,
      math.floor(sae7.toDouble / sae1 * 1e6 + 0.5).toLong)
    val got = graft.queries.TemporalOps.q402MaseEval(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).head
    assert(got === want)
  }

  test("q403: fixture reads tau2 = 0 (iid values — full shrinkage is " +
    "the correct EB answer) and the driver recompute agrees") {
    val rows = Tables(spark, sfDir).events
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5)
        .toLong))
    val g = rows.toSeq.groupBy(_._1).toSeq.map { case (u, xs) =>
      val n = xs.length.toLong
      val s = xs.map(_._2).sum
      val ss = xs.map(x => x._2 * x._2).sum
      (u, n, s, ss,
        math.floor(s.toDouble * s / n + 0.5).toLong,
        math.floor(s.toDouble / n + 0.5).toLong,
        math.floor(1e12 / n + 0.5).toLong)
    }
    val m = g.length.toLong
    val nn = g.map(_._2).sum
    val sstot = g.map(_._4).sum
    val aUnit = g.map(_._5).sum
    val sxb = g.map(_._6).sum
    val sxb2 = g.map(x => x._6 * x._6).sum
    val hp12 = g.map(_._7).sum
    val sig2 = (sstot.toDouble - aUnit) / (nn.toDouble - m)
    val sB = (sxb2.toDouble - sxb.toDouble * sxb / m) / (m - 1.0)
    val tau2 = math.max(0.0, sB - sig2 * (hp12.toDouble / 1e12) / m)
    val gmean = sxb.toDouble / m
    val got = graft.queries.StatsOps.q403JamesStein(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val hyper = got.find(_._1 == -1L).get
    assert(hyper._2 === m)
    assert(hyper._3 === math.floor(gmean * 1e6 + 0.5).toLong)
    assert(hyper._4 === math.floor(sig2 + 0.5).toLong)
    assert(hyper._5 === math.floor(tau2 + 0.5).toLong)
    // iid fixture: between-user variance is pure sampling noise, the
    // clamp correctly lands at zero and every user shrinks fully
    assert(hyper._5 === 0L)
    got.filter(_._1 >= 0).foreach { r =>
      assert(r._4 === 0L, "lambda must be 0 under tau2 = 0")
      assert(r._5 === hyper._3, "full shrinkage lands on the grand mean")
    }
    assert(got.count(_._1 >= 0) ===
      math.min(graft.queries.StatsOps.JS_TOP_K.toLong, m))
  }

  test("q403 lambda>0 path: a constructed corpus with a REAL user " +
    "effect shrinks partially, between raw mean and grand mean") {
    val dir = java.nio.file.Files.createTempDirectory("js_fx").toString
    import spark.implicits._
    // 3 user levels 50 cents apart with wide within-user noise, sized
    // so lambda is STRICTLY partial (~0.96): tau2 ~ 2400 cents^2 vs
    // sig2/n ~ 100 — far-apart levels would round lambda to exactly 1
    val rows = (0 until 300).map { i =>
      val u = i % 3
      val base = 1.0 + u * 0.5
      val noise = (i % 7) * 0.5
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        u.toLong, "click", base + noise, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.queries.StatsOps.q403JamesStein(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val hyper = got.find(_._1 == -1L).get
    assert(hyper._5 > 0L, "constructed user effect must yield tau2 > 0")
    got.filter(_._1 >= 0).foreach { r =>
      assert(r._4 > 0L && r._4 < 1000000L,
        s"lambda must be strictly partial, got ${r._4}")
      val lo = math.min(r._3, hyper._3); val hi = math.max(r._3, hyper._3)
      assert(r._5 >= lo && r._5 <= hi,
        "shrunk estimate must sit between raw and grand mean")
    }
  }
}
