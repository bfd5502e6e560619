package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-45 spec: Wald SPRT (q389), Jonckheere–Terpstra
  * (q390), funnel cohort significance (q391) — driver-side recomputes
  * (sequential walk / brute-force pair counting / literal cohort
  * fold).
  */
class Batch45Spec extends SparkSpec {

  test("q389 equals a driver-side sequential walk; decision latches") {
    import graft.queries.StatsOps.{SPRT_A_MICRO, SPRT_B_MICRO,
      SPRT_LOWER_MICRO, SPRT_UPPER_MICRO}
    val daily = Tables(spark, sfDir).events
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        (col("event_type") === "purchase").as("p"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, xs) =>
        (d, xs.count(_._2).toLong, xs.length.toLong)
      }
    var llr = 0L
    var fcd = -1L
    var dec = 0L
    val want = daily.map { case (d, k, n) =>
      llr += SPRT_A_MICRO * k + SPRT_B_MICRO * (n - k)
      if (fcd < 0) {
        if (llr >= SPRT_UPPER_MICRO) { fcd = d; dec = 1L }
        else if (llr <= SPRT_LOWER_MICRO) { fcd = d; dec = -1L }
      }
      (d, k, n, llr, fcd, dec)
    }
    val got = graft.queries.StatsOps.q389Sprt(spark, sfDir)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
    // the fixture must actually decide (p≈0.2 sits inside (p0, p1)
    // but the +0.002/event drift crosses the upper bound in days)
    assert(got.last._6 === 1L, "fixture must accept H1")
    // and the latch holds after the crossing
    val afterCross = got.dropWhile(_._5 < 0)
    assert(afterCross.forall(r => r._5 === afterCross.head._5))
  }

  test("q390 equals brute-force ordered pair counting; ties halved") {
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_quantity")).collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong))
    val prio = Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1).substring(0, 1).toLong))
      .toMap
    val rows = li.map { case (ok, v) => (prio(ok), v) }
    // brute force JT2 = sum over group pairs a<b of 2*#{x<y} + #{x=y}
    val byG = rows.toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var jt2 = BigInt(0)
    for (a <- 1 to 5; b <- (a + 1) to 5) {
      val xs = byG.getOrElse(a.toLong, Nil)
      val ysSorted = byG.getOrElse(b.toLong, Nil).sorted
      xs.foreach { x =>
        // counts via binary search on the sorted b-side
        val lt = ysSorted.count(_ > x) // y > x  <=> x < y
        val eq = ysSorted.count(_ == x)
        jt2 += 2L * lt + eq
      }
    }
    val ns = (1 to 5).map(i => byG.getOrElse(i.toLong, Nil).length.toLong)
    val n = ns.sum
    val e2 = (n * n - ns.map(x => x * x).sum) / 2
    val varJt = (n.toDouble * n * (2.0 * n + 3) -
      ns.map(x => x.toDouble * x * (2.0 * x + 3)).sum) / 72.0
    val z = (jt2.toDouble - e2.toDouble) / (2.0 * math.sqrt(varJt))
    val want = (n, jt2.toLong, e2,
      math.floor(z * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q390Jonckheere(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).head
    assert(got === want)
  }

  test("q391 equals a driver-side cohort fold; margins reconcile") {
    import graft.queries.EventAnalytics.FUNNEL_HOURS
    val evs = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val win = FUNNEL_HOURS * 3600L * 1000000L
    // .toSeq BEFORE flatMap: flatMapping a Map with a (cohort, conv)
    // result type would dedupe by cohort key (the q316 trap)
    val perUser = evs.toSeq.groupBy(_._1).toSeq.flatMap { case (uid, xsU) =>
      val xs = xsU.sortBy(e => (e._3, e._4))
      var lastClick = Option.empty[Long]
      var nClicks = 0L
      var conv = false
      xs.foreach { e =>
        if (e._2 == "click") { lastClick = Some(e._3); nClicks += 1 }
        if (e._2 == "purchase" &&
          lastClick.exists(lc => e._3 - lc <= win)) conv = true
      }
      if (nClicks > 0) {
        val cohort = if (uid % 2 == 0) "arm_a" else "arm_b"
        Some((cohort, if (conv) 1L else 0L))
      } else None
    }.toSeq
    val g = perUser.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    def wilson(n: Long, k: Long): (Long, Long) = {
      val nD = n.toDouble; val kD = k.toDouble
      val p = kD / nD; val z = 1.96; val z2 = z * z
      val den = 1.0 + z2 / nD
      val c = p + z2 / (2.0 * nD)
      val s = z * math.sqrt(p * (1.0 - p) / nD + z2 / (4.0 * nD * nD))
      (math.floor((c - s) / den * 1e6 + 0.5).toLong,
        math.floor((c + s) / den * 1e6 + 0.5).toLong)
    }
    val wantRows = g.map { case (co, (n, k)) =>
      val (lo, hi) = wilson(n, k)
      (co, n, k, k * 1000000L / n, lo, hi, 0L)
    }.toSet
    val (n1, k1) = g("arm_a"); val (n2, k2) = g("arm_b")
    val p1 = k1.toDouble / n1; val p2 = k2.toDouble / n2
    val pp = (k1 + k2).toDouble / (n1 + n2)
    val z = (p1 - p2) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    val wantZ = ("_z", n1 + n2, k1 + k2,
      (k1 + k2) * 1000000L / (n1 + n2), 0L, 0L,
      math.floor(z * 1e6 + 0.5).toLong)
    val got = graft.queries.EventAnalytics
      .q391FunnelCohortZ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === (wantRows + wantZ))
    // margins: the _z row's totals equal the cohort rows' sums
    val zr = got.find(_._1 == "_z").get
    assert(zr._2 === n1 + n2 && zr._3 === k1 + k2)
  }
}
