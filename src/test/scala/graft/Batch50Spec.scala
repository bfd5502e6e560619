package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-50 spec: McNemar (q404), log-odds keyness (q405),
  * DAU/WAU stickiness (q406) — driver recomputes with literal set
  * algebra / per-cell formula replays.
  */
class Batch50Spec extends SparkSpec {

  test("q404 equals a driver-side discordant-cell recompute") {
    import graft.queries.StatsOps.{KAPPA_LEN_CUT, KAPPA_TOK_CUT}
    val rows = Tables(spark, sfDir).documents
      .select(col("n_chars"), col("text")).collect()
      .map { r =>
        (r.getLong(0) >= KAPPA_LEN_CUT,
          r.getString(1).toLowerCase.split("\\s+")
            .count(_.nonEmpty) >= KAPPA_TOK_CUT)
      }
    val n = rows.length.toLong
    val b = rows.count(t => t._1 && !t._2).toLong
    val c = rows.count(t => !t._1 && t._2).toLong
    val chi = (b - c).toDouble * (b - c) / (b + c)
    val chiCc = (math.abs(b - c) - 1.0) * (math.abs(b - c) - 1.0) /
      (b + c)
    val want = (n, b, c, math.floor(chi * 1e6 + 0.5).toLong,
      math.floor(chiCc * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q404McNemar(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    assert(got === want)
    // discordance must exist (else the test is vacuous) and the
    // continuity-corrected statistic is never larger
    assert(got._2 + got._3 > 0L)
    assert(got._5 <= got._4)
  }

  test("q405 equals a per-cell formula replay; keyness separates " +
    "sources") {
    import graft.queries.LlmText.{KEY_ALPHA0, KEY_TOP}
    val toks = Tables(spark, sfDir).documents
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val sw = toks.toSeq.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val w = toks.toSeq.groupBy(_._2).view.mapValues(_.length.toLong)
      .toMap
    val s = toks.toSeq.groupBy(_._1).view.mapValues(_.length.toLong)
      .toMap
    val n = toks.length.toLong
    val scored = sw.toSeq.map { case ((src, tok), ysw) =>
      val aw = KEY_ALPHA0 * w(tok) / n
      val dlt = math.log((ysw + aw) / (s(src) + KEY_ALPHA0 - ysw - aw)) -
        math.log((w(tok) - ysw + aw) /
          (n - s(src) + KEY_ALPHA0 - (w(tok) - ysw) - aw))
      val sig2 = 1.0 / (ysw + aw) + 1.0 / (w(tok) - ysw + aw)
      (src, tok, ysw,
        math.floor(dlt / math.sqrt(sig2) * 1e6 + 0.5).toLong)
    }
    val want = scored.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(x => (-x._4, x._2)).take(KEY_TOP).zipWithIndex
        .map { case ((src, tok, ysw, z), i) =>
          (src, tok, ysw, z, (i + 1).toLong)
        }
    }.toSet
    val got = graft.queries.LlmText.q405LogOddsKeyness(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
    // a top-1 keyword must actually be POSITIVELY distinctive
    assert(got.filter(_._5 == 1L).forall(_._4 > 0L))
  }

  test("q406 equals a driver-side union walk; DAU <= WAU always") {
    val ud = Tables(spark, sfDir).events
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val d0 = ud.map(_._2).min; val d1 = ud.map(_._2).max
    val byDay = ud.toSeq.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    val want = (d0 + 6 to d1).map { d =>
      val dau = byDay.getOrElse(d, Set.empty).size.toLong
      val wau = (d - 6 to d).flatMap(x =>
        byDay.getOrElse(x, Set.empty)).toSet.size.toLong
      (d, dau, wau, dau * 1000000L / wau)
    }.filter(_._2 > 0).toSet
    val got = graft.queries.EventAnalytics.q406Stickiness(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    got.foreach(r => assert(r._2 <= r._3, "DAU cannot exceed WAU"))
  }
}
