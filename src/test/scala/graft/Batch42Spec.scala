package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-42 spec: Cramér's V + Theil's U (q377), Cohen's
  * kappa (q378), Durbin–Watson (q379), Wald–Wolfowitz runs test
  * (q380) — each re-derived driver-side from raw rows with
  * independent arithmetic (no shared grid/identity with the engine).
  */
class Batch42Spec extends SparkSpec {

  test("q377 equals a driver-side contingency recompute; 0<=V,U<=1") {
    val rows = Tables(spark, sfDir).events
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("wd"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toLong
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong)
    val rx = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cy = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    var chiNano = 0L; var miNano = 0L
    cells.foreach { case ((ty, wd), c) =>
      val e = (c.toDouble * n - rx(ty).toDouble * cy(wd)) *
        (c.toDouble * n - rx(ty).toDouble * cy(wd)) /
        (n.toDouble * rx(ty).toDouble * cy(wd).toDouble)
      chiNano += math.floor(e * 1e9 + 0.5).toLong
      miNano += math.floor(c.toDouble / n *
        math.log(c.toDouble * n / (rx(ty).toDouble * cy(wd))) * 1e9 +
        0.5).toLong
    }
    val hxNano = rx.values.map(v =>
      math.floor(v.toDouble / n * math.log(n.toDouble / v) * 1e9 + 0.5)
        .toLong).sum
    val rl = rx.size.toLong
    val want = (n, rl, 7L,
      math.floor(chiNano.toDouble / 1e3 + 0.5).toLong,
      math.floor(math.sqrt(chiNano.toDouble / 1e9 /
        (n.toDouble * (math.min(rl, 7L) - 1.0))) * 1e6 + 0.5).toLong,
      math.floor(miNano.toDouble / hxNano.toDouble * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q377CramerTheil(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got === want)
    assert(got._5 >= 0L && got._5 <= 1000000L)
    assert(got._6 >= 0L && got._6 <= 1000000L)
  }

  test("q378 equals a driver-side kappa recompute; raters disagree " +
    "somewhere but kappa is far above chance") {
    import graft.queries.StatsOps.{KAPPA_LEN_CUT, KAPPA_TOK_CUT}
    val rows = Tables(spark, sfDir).documents
      .select(col("n_chars"), col("text")).collect()
      .map { r =>
        val a = r.getLong(0) >= KAPPA_LEN_CUT
        val toks = r.getString(1).toLowerCase.split("\\s+")
          .count(_.nonEmpty)
        (a, toks >= KAPPA_TOK_CUT)
      }
    val n = rows.length.toLong
    val n11 = rows.count(t => t._1 && t._2).toLong
    val n10 = rows.count(t => t._1 && !t._2).toLong
    val n01 = rows.count(t => !t._1 && t._2).toLong
    val n00 = rows.count(t => !t._1 && !t._2).toLong
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
      (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    val want = (n, n11, n10, n01, n00,
      math.floor(po * 1e6 + 0.5).toLong,
      math.floor(pe * 1e6 + 0.5).toLong,
      math.floor((po - pe) / (1.0 - pe) * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q378CohenKappa(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).head
    assert(got === want)
    // a degenerate fixture (all-agree or rater-constant) would make
    // kappa meaningless — require both raters to be non-constant
    assert(n11 + n10 > 0L && n01 + n00 > 0L, "rater A is constant")
    assert(n11 + n01 > 0L && n10 + n00 > 0L, "rater B is constant")
  }

  test("q379 equals a driver-side exact-integer residual recompute") {
    val daily = Tables(spark, sfDir).events
      .select(expr("unix_micros(ts) div 86400000000").as("x"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("x").agg(sum("c").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val sx = daily.map(_._1).sum
    val sy = daily.map(_._2).sum
    val sxy = daily.map(d => d._1 * d._2).sum
    val sxx = daily.map(d => d._1 * d._1).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val rs = daily.map { case (x, y) =>
      n * den * y - n * num * x - (sy * den - num * sx)
    }
    val e2 = rs.map(r =>
      math.floor(r.toDouble * r.toDouble / 1e12 + 0.5).toLong).sum
    val d2 = rs.sliding(2).map { w =>
      math.floor((w(1).toDouble - w(0).toDouble) *
        (w(1).toDouble - w(0).toDouble) / 1e12 + 0.5).toLong
    }.sum
    val want = (n,
      math.floor(num.toDouble / den.toDouble * 1e6 + 0.5).toLong,
      math.floor(d2.toDouble / e2.toDouble * 1e6 + 0.5).toLong)
    val got = graft.queries.TemporalOps.q379DurbinWatson(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .head
    assert(got === want)
    // DW lives in [0, 4]
    assert(got._3 >= 0L && got._3 <= 4000000L)
  }

  test("q380 equals a driver-side runs recompute; margins add up") {
    val daily = Tables(spark, sfDir).events
      .select(expr("unix_micros(ts) div 86400000000").as("x"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("x").agg(sum("c").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val med = daily.map(_._2).sorted.apply(((n - 1) / 2).toInt)
    val signs = daily.map(d => if (d._2 > med) 1L else 0L)
    val n1 = signs.sum
    val runs = 1L + signs.sliding(2).count(w => w(0) != w(1))
    val n1d = n1.toDouble; val n2d = (n - n1).toDouble; val nd = n.toDouble
    val mu = 2.0 * n1d * n2d / nd + 1.0
    val sig2 = 2.0 * n1d * n2d * (2.0 * n1d * n2d - nd) /
      (nd * nd * (nd - 1.0))
    val want = (n, n1, n - n1, runs,
      math.floor((runs.toDouble - mu) / math.sqrt(sig2) * 1e6 + 0.5)
        .toLong)
    val got = graft.queries.TemporalOps.q380RunsTest(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    assert(got === want)
    assert(got._2 + got._3 === got._1)
  }
}
