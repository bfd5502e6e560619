package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-48 spec: capture–recapture (q398), delta-method
  * ratio CI (q399), randomization test (q400) — driver-side
  * recomputes (set algebra / residual identity re-proof / literal
  * hash re-assignments).
  */
class Batch48Spec extends SparkSpec {

  test("q398 equals driver-side set algebra; Chapman >= union") {
    val evs = Tables(spark, sfDir).events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val d0 = evs.map(_._2).min
    val u1 = evs.filter(_._2 == d0).map(_._1).toSet
    val u2 = evs.filter(_._2 == d0 + 1).map(_._1).toSet
    val n1 = u1.size.toLong; val n2 = u2.size.toLong
    val m = (u1 & u2).size.toLong
    val nTrue = (u1 | u2).size.toLong
    val nHat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    val want = (n1, n2, m, nTrue,
      math.floor(nHat * 1e6 + 0.5).toLong,
      math.floor((nHat / nTrue - 1.0) * 1e6 + 0.5).toLong)
    val got = graft.queries.EventAnalytics
      .q398CaptureRecapture(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).head
    assert(got === want)
    // Chapman can never fall below the observed union
    assert(got._5 >= (got._1 + got._2 - got._3 - 1) * 1000000L)
    // the day windows must NOT be saturated (m < n1 — the reason the
    // week windows were rejected before landing)
    assert(got._3 < got._1, "capture windows saturated")
  }

  test("q399 equals a residual-identity recompute on raw rows") {
    val pu = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
      .groupBy(_._1).toSeq.map { case (_, xs) =>
        (xs.count(_._2 == "click").toLong,
          xs.filter(_._2 == "purchase").map(_._3).sum)
      }
    val n = pu.length.toLong
    val sx = pu.map(_._1).sum; val sy = pu.map(_._2).sum
    val r = sy.toDouble / sx
    // independent recompute: literal per-user residuals, NOT the
    // moment identity the engine uses
    val rss = pu.map { case (x, y) =>
      val e = y - r * x; e * e
    }.sum
    val se = math.sqrt(n.toDouble / (n - 1.0) * rss) / sx
    val got = graft.queries.StatsOps.q399DeltaRatio(spark, sfDir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).head
    assert(got._1 === n && got._2 === sx && got._3 === sy)
    assert(got._4 === math.floor(r * 1e6 + 0.5).toLong)
    // the engine's moment identity and the literal residual sum are
    // the same real number up to IEEE rounding: compare at 1e-9 rel
    assert(math.abs(got._5 - math.floor(se * 1e6 + 0.5).toLong) <= 1L)
    assert(got._6 < got._4 && got._4 < got._7, "CI must bracket r")
  }

  test("q400 equals literal hash re-assignments; p-value counts match") {
    import graft.queries.StatsOps.PERM_P
    val pu = Tables(spark, sfDir).events
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5)
        .toLong))
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).sum) }.toSeq
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def diffM(arm: Long => Long): Long = {
      val a = pu.filter(p => arm(p._1) == 0L).map(_._2)
      val b = pu.filter(p => arm(p._1) == 1L).map(_._2)
      math.floor((a.sum.toDouble / a.size - b.sum.toDouble / b.size) *
        1e6 + 0.5).toLong
    }
    val obs = diffM(_ % 2)
    val perms = (1 to PERM_P).map { p =>
      p.toLong -> diffM(u => md5hex(s"perm$p:$u").head.toInt % 2)
    }
    val nExtreme = perms.count(x => math.abs(x._2) >= math.abs(obs))
    val want = perms.map { case (p, dm) =>
      (p, dm, if (math.abs(dm) >= math.abs(obs)) 1L else 0L, 0L)
    }.toSet + ((-1L, obs, 0L,
      (1L + nExtreme) * 1000000L / (PERM_P + 1)))
    val got = graft.queries.StatsOps.q400PermutationTest(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    // under the null (parity arms carry no effect), the permutation
    // p-value must be non-degenerate: not every permutation extreme,
    // not none
    assert(nExtreme > 0 && nExtreme < PERM_P)
  }
}
