package graft

import graft.queries.EventAnalytics
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  test("q110 versions tile each user's timeline with one open row") {
    val rows = EventAnalytics.q110Scd2History(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("valid_from_us"))
      // exactly one current row per user, and it is the LAST version
      assert(vs.count(_.getAs[Boolean]("is_current")) == 1, s"user $u")
      assert(sorted.last.getAs[Boolean]("is_current"), s"user $u")
      // [from, to) intervals tile without gap or overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"),
            s"user $u: versions must close exactly at the next open")
          assert(a.getAs[Long]("attr") != b.getAs[Long]("attr"),
            s"user $u: consecutive versions must differ (no-op not collapsed)")
        case _ =>
      }
      assert(sorted.last.getAs[Long]("valid_to_us") ==
        EventAnalytics.SCD2_OPEN_US, s"user $u: open row sentinel")
    }
  }

  test("q107 parses every well-formed payload and counts malformed as null") {
    val rows = EventAnalytics.q107JsonExtract(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // synthetic props are always {"k": N}: full coverage, k in [0, 99]
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables(spark, sfDir).events.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_with_k") == r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("min_k") >= 0L && r.getAs[Long]("max_k") <= 99L)
    }
    // malformed payloads must yield null k, not a job failure
    import spark.implicits._
    val bad = Seq("""{"k": 7}""", "not json", """{"other": 1}""").toDF("props")
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(bad.toSeq == Seq(Some(7), None, None))
  }

  test("q73 conversions are bounded by purchases and require a prior click") {
    val rows = EventAnalytics.q73Funnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (clicks, purchases, converted) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(converted <= purchases)
      if (clicks == 0) assert(converted == 0)
    }
    assert(rows.exists(_.getLong(3) > 0), "expected some conversions in the log")
  }

  test("q73 matches a per-user sequential replay") {
    val ev = Tables(spark, sfDir).events
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000L, r.getLong(3)))
    val bound = EventAnalytics.FUNNEL_HOURS * 3600L * 1000000L
    val expected = ev.groupBy(_._1).map { case (u, es) =>
      var lastClick = Long.MinValue
      var converted = 0L
      es.sortBy(e => (e._3, e._4)).foreach { e =>
        if (e._2 == "click") lastClick = e._3
        else if (e._2 == "purchase" && lastClick != Long.MinValue &&
          e._3 - lastClick <= bound) converted += 1
      }
      u -> converted
    }
    val got = EventAnalytics.q73Funnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    expected.filter { case (_, c) => c > 0 }
      .foreach { case (u, c) => assert(got(u) == c, s"user $u") }
  }

  test("q74 cohort matrix: offset-0 row covers the whole cohort") {
    val rows = EventAnalytics.q74RetentionCohorts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val day0 = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    // every user is active on their cohort day by definition, so the
    // offset-0 count per cohort equals the cohort's size, and no other
    // offset can exceed it
    rows.foreach { case (c, off, n) =>
      assert(n <= day0(c), s"cohort $c offset $off exceeds cohort size")
    }
    assert(day0.values.sum ==
      Tables(spark, sfDir).events.select("user_id").distinct().count())
  }

  test("q77 pivot columns sum back to the event totals") {
    val rows = EventAnalytics.q77PivotTypes(spark, sfDir)
    val ev = Tables(spark, sfDir).events
    assert(rows.count() == ev.select("user_id").distinct().count())
    val colSums = EventAnalytics.PIVOT_TYPES.map(t =>
      rows.agg(sum(s"n_$t")).head.getLong(0))
    val typeCounts = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    EventAnalytics.PIVOT_TYPES.zip(colSums).foreach { case (t, s) =>
      assert(s == typeCounts.getOrElse(t, 0L), s"pivot column $t")
    }
  }

  test("q78 cube lattice: totals agree at every grouping level") {
    val ev = Tables(spark, sfDir).events
    val rows = EventAnalytics.q78CubeStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = ev.count()
    assert(rows.find(r => r._1 == "ALL" && r._2 == "ALL").get._3 == total)
    val typeTotals = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    assert(typeTotals.map(_._3).sum == total)
    val dayTotals = rows.filter(r => r._1 == "ALL" && r._2 != "ALL")
    assert(dayTotals.map(_._3).sum == total)
    val cells = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    assert(cells.map(_._3).sum == total)
  }

  test("q75 rolling features: frame counts bounded, first event has no gap") {
    val rows = EventAnalytics.q75RollingFeatures(spark, sfDir)
    assert(rows.filter(col("prev_n") > EventAnalytics.ROLL_N).count() == 0)
    val firsts = rows.filter(col("gap_us") === -1L).count()
    assert(firsts ==
      Tables(spark, sfDir).events.select("user_id").distinct().count(),
      "exactly one frameless first event per user")
    assert(rows.filter(col("prev_n") === 0 && col("prev_sum") =!= 0.0).count() == 0)
  }

  test("q84 transition totals equal events minus session starts") {
    // every event except the first of each session is the TARGET of
    // exactly one intra-session transition
    val sessions = graft.queries.SessionOps.q37EventsSessionize(spark, sfDir)
    val nSessions = sessions.count()
    val nEvents = Tables(spark, sfDir).events.count()
    val paths = EventAnalytics.q84SessionPaths(spark, sfDir)
    val nTransitions = paths.agg(sum("n_transitions")).head.getLong(0)
    assert(nTransitions == nEvents - nSessions,
      s"$nTransitions transitions != $nEvents events - $nSessions sessions")
    assert(paths.filter(col("n_sessions") > col("n_transitions")).count() == 0)
  }

  test("q88 peak concurrency is consistent with a driver-side sweep") {
    // rebuild sessions from the raw log (microsecond-exact, unlike
    // q37's second-formatted output strings)
    val gapUs = graft.queries.SessionOps.GAP_MINUTES * 60L * 1000000L
    val sess = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values.flatMap { evs =>
        val sorted = evs.sortBy(e => (e._2, e._3)).map(_._2)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = sorted.head; var last = sorted.head
        sorted.tail.foreach { us =>
          if (us - last > gapUs) { out += ((start, last)); start = us }
          last = us
        }
        out += ((start, last))
        out
      }.toArray
    val deltas = (sess.map(s => (s._1, 1L)) ++ sess.map(s => (s._2 + 1L, -1L)))
      .sortBy(d => (d._1, d._2))
    var conc = 0L
    val peakByDay = scala.collection.mutable.Map.empty[String, Long]
    deltas.foreach { case (us, d) =>
      conc += d
      val day = java.time.Instant.ofEpochMilli(us / 1000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      peakByDay(day) = math.max(peakByDay.getOrElse(day, Long.MinValue), conc)
    }
    val got = EventAnalytics.q88PeakConcurrency(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == peakByDay.toMap,
      s"sweep mismatch: ${(got.toSet diff peakByDay.toSet) ++ (peakByDay.toSet diff got.toSet)}")
  }

  test("q87 ship-priority rows are revenue-ranked and within the cut") {
    val rows = graft.queries.Relational.q87ShipPriority(spark, sfDir).collect()
    assert(rows.length <= graft.queries.Relational.Q87_TOP && rows.nonEmpty)
    val revs = rows.map(_.getDouble(3))
    assert(revs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "rows must be ordered by revenue desc")
  }

  test("q89 rolling distinct equals a driver-side window recount") {
    val ud = Tables(spark, sfDir).events
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val maxDay = ud.map(_._2).max
    val want = ud.flatMap { case (u, d) =>
      (0 until EventAnalytics.ROLL_DAYS).map(i => (u, d.plusDays(i.toLong)))
    }.filter(!_._2.isAfter(maxDay))
      .groupBy(_._2).view.mapValues(_.map(_._1).distinct.length.toLong).toMap
      .map { case (d, n) => d.toString -> n }
    val got = EventAnalytics.q89RollingDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q90 latency profile covers every lineitem and orders percentiles") {
    val rows = EventAnalytics.q90ShipLatency(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == Tables(spark, sfDir).lineitem.count())
    rows.foreach { r =>
      val (lo, p50, p90, p99, hi) =
        (r.getLong(3).toDouble, r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getLong(7).toDouble)
      assert(lo <= p50 && p50 <= p90 && p90 <= p99 && p99 <= hi,
        s"percentiles out of order for ${r.getString(0)}")
    }
  }

  test("q85 deciles follow the SQL-standard ntile distribution") {
    val rows = EventAnalytics.q85FeatureBinning(spark, sfDir).collect()
    val n = rows.length
    val k = EventAnalytics.N_BINS
    val sizes = rows.groupBy(_.getLong(3)).view.mapValues(_.length).toMap
    assert(sizes.keySet == (1L to k).toSet, s"expected $k deciles, got ${sizes.keySet}")
    val (base, rem) = (n / k, n % k)
    (1 to k).foreach { b =>
      val want = if (b <= rem) base + 1 else base
      assert(sizes(b.toLong) == want, s"decile $b size ${sizes(b.toLong)} != $want")
    }
    // percent rank spans [0, 1] and orders with total_value
    val byPct = rows.sortBy(_.getDouble(4))
    assert(byPct.head.getDouble(4) == 0.0 && byPct.last.getDouble(4) == 1.0)
    assert(byPct.map(_.getDouble(2)).sliding(2).forall(p => p(0) <= p(1)),
      "pct_rank order must agree with total_value order")
  }

  test("q98 Welch t matches a driver-side recompute per event type") {
    val ev = Tables(spark, sfDir).events
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val (a, b) = rows.partition(_._2 % 2 == 0)
      def stats(xs: Array[(String, Long, Double)]) = {
        val n = xs.length.toDouble
        val m = xs.map(_._3).sum / n
        val v = xs.map(x => (x._3 - m) * (x._3 - m)).sum / (n - 1)
        (n, m, v)
      }
      val (na, ma, va) = stats(a); val (nb, mb, vb) = stats(b)
      t -> ((ma - mb) / math.sqrt(va / na + vb / nb))
    }
    val got = EventAnalytics.q98AbWelch(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(got.nonEmpty && got.keySet == expected.keySet)
    expected.foreach { case (t, w) =>
      assert(math.abs(got(t) - w) < 1e-6 * math.max(1.0, math.abs(w)),
        s"type $t t_welch")
    }
  }

  test("q99 z-scores have zero mean per type and flags agree with |z|") {
    val rows = EventAnalytics.q99AnomalyZscore(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, z, flag) =>
      assert(flag == (math.abs(z) > 2.0))
    }
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val meanZ = rs.map(_._4).sum / rs.length
      assert(math.abs(meanZ) < 1e-9, s"type $t mean z should be ~0")
    }
  }

  test("q104 active time equals a per-user sequential interval union") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val win = EventAnalytics.ACTIVE_WINDOW_US
    val expected = ev.groupBy(_._1).map { case (u, es) =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      // union of same-length intervals = pairwise min(gap, win) + win
      val covered = ts.sliding(2).collect {
        case Array(a, b) => math.min(b - a, win)
      }.sum + win
      u -> (es.length.toLong, covered)
    }
    val got = EventAnalytics.q104ActiveTime(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
    // sanity: union never exceeds n * window, never less than one window
    got.values.foreach { case (n, active) =>
      assert(active <= n * win && active >= win)
    }
  }

  test("q105 entropy: zero for single-type users, ln(k) bound, recount parity") {
    val ev = Tables(spark, sfDir).events
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).map { case (u, es) =>
      val counts = es.groupBy(_._2).values.map(_.size.toLong)
      val n = counts.sum
      val s = counts.map(c =>
        math.floor(c * math.log(n.toDouble / c) / n * 1e6 + 0.5).toLong).sum
      u -> (n, counts.size.toLong, s.toDouble / 1e6)
    }
    val got = EventAnalytics.q105UserEntropy(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, (n, k, h)) =>
      assert(got(u)._1 == n && got(u)._2 == k, s"user $u counts")
      assert(got(u)._3 == h, s"user $u entropy")
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-6, s"user $u bounds")
      if (k == 1) assert(h == 0.0)
    }
  }

  test("q131 merged spans cover every event, never overlap, and are maximal") {
    val halfH = EventAnalytics.MERGE_INTERVAL_MIN * 60L * 1000000L
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val spans = EventAnalytics.q131IntervalMerge(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.nonEmpty)
    // per-user: spans sorted by span_id are disjoint with gaps > 0, and
    // event counts sum to the user's events
    spans.groupBy(_._1).foreach { case (u, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 > a._4, s"user $u spans ${a._2},${b._2} overlap or touch")
        case _ =>
      }
      val evs = ev.filter(_._1 == u).map(_._2)
      assert(sorted.map(_._5).sum == evs.length, s"user $u event count")
      // every event sits inside exactly one span
      evs.foreach { t =>
        val hits = sorted.count(s => t >= s._3 && t + halfH <= s._4)
        assert(hits == 1, s"user $u event $t in $hits spans")
      }
    }
  }

  test("q132 labels are leak-free and features match the pre-cutoff log") {
    val cutoff = java.sql.Timestamp.valueOf(graft.queries.SessionOps.DIFF_CUTOFF)
    val cutUs = cutoff.toInstant.getEpochSecond * 1000000L
    val horizon = EventAnalytics.CHURN_HORIZON_DAYS * 86400L * 1000000L
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val got = EventAnalytics.q132ChurnLabels(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getBoolean(5))).toMap
    val byUser = ev.groupBy(_._1)
    val expectedKeys = byUser.filter(_._2.exists(_._2 < cutUs)).keySet
    assert(got.keySet == expectedKeys && got.nonEmpty)
    got.foreach { case (u, (nb, tb, rec, churned)) =>
      val before = byUser(u).filter(_._2 < cutUs)
      assert(nb == before.length)
      assert(tb == before.map(_._3).distinct.length)
      assert(rec == cutUs - before.map(_._2).max)
      val inWindow = byUser(u).exists(e => e._2 >= cutUs && e._2 < cutUs + horizon)
      assert(churned == !inWindow, s"user $u label")
    }
  }

  test("q118 bot scores match a driver-side per-user recompute") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2)).toSeq
      val gaps = sorted.sliding(2).collect {
        case Seq(a, b) => (b._4 - a._4).toDouble
      }.toSeq.sorted
      val med =
        if (gaps.isEmpty) -1.0
        else if (gaps.length % 2 == 1) gaps(gaps.length / 2)
        else (gaps(gaps.length / 2 - 1) + gaps(gaps.length / 2)) / 2.0
      val t0 = sorted.head._4; val t1 = sorted.last._4
      val n = rows.length.toLong
      val rate =
        if (t1 > t0) math.floor(n * 6e7 / (t1 - t0) * 1e3 + 0.5).toLong else 0L
      val isBot = n >= graft.queries.EventAnalytics.BOT_MIN_EVENTS &&
        gaps.nonEmpty &&
        med <= graft.queries.EventAnalytics.BOT_MAX_MED_GAP_US.toDouble
      u -> (n, rows.map(_._3).distinct.length.toLong,
        (t1 - t0) / 1000000L, med, rate, isBot)
    }
    val got = EventAnalytics.q118BotScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    expected.foreach { case (u, e) => assert(got(u) == e, s"user $u: ${got(u)} vs $e") }
  }

  test("q139 Kaplan-Meier matches a driver-side product-limit estimate") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val durs = ev.groupBy(r => (r._1, r._3 / 86400000000L)).toSeq
      .map { case (_, rows) =>
        val f = rows.map(_._3).min
        val l = rows.map(_._3).max
        rows.filter(_._2 == "purchase").map(_._3).sorted.headOption match {
          case Some(p) => ((p - f) / 60000000L, 1L)
          case None => ((l - f) / 60000000L, 0L)
        }
      }
    val rollup = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, v) =>
      (d, v.count(_._2 == 1L).toLong, v.count(_._2 == 0L).toLong)
    }
    var atRisk = durs.length.toLong
    var cum = 0L
    val expected = rollup.map { case (d, ch, cn) =>
      val term =
        if (ch == 0L) 0L
        else if (ch == atRisk) -1000000000000L
        else math.floor(math.log((atRisk - ch).toDouble / atRisk.toDouble) * 1e6 + 0.5).toLong
      cum += term
      val surv = math.floor(math.exp(cum.toDouble / 1e6) * 1e6 + 0.5).toLong
      val row = (d, atRisk, ch, cn, surv)
      atRisk -= ch + cn
      row
    }
    val got = EventAnalytics.q139SurvivalKm(spark, sfDir)
      .orderBy("dur_min").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // survival is a monotone non-increasing probability starting at/below 1
    assert(got.forall(r => r._5 >= 0L && r._5 <= 1000000L))
    got.sliding(2).foreach { case Array(a, b) => assert(b._5 <= a._5); case _ => }
    // the fixture must exercise BOTH censoring and churn
    assert(got.map(_._3).sum > 0 && got.map(_._4).sum > 0)
  }

  test("q140 strict-order funnel anchors each step within the window") {
    val W = EventAnalytics.FUNNEL_STEP_US
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (u, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None else {
        val t1 = views.min
        val t2 = rows.filter(r => r._2 == "click" && r._3 > t1 && r._3 <= t1 + W)
          .map(_._3).sorted.headOption
        val t3 = t2.flatMap(t => rows
          .filter(r => r._2 == "purchase" && r._3 > t && r._3 <= t + W)
          .map(_._3).sorted.headOption)
        Some(u -> ((t1, t2.getOrElse(-1L), t3.getOrElse(-1L),
          1L + t2.size + t3.size)))
      }
    }
    val got = EventAnalytics.q140WindowFunnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
    // the fixture exercises all three depths
    assert(Set(1L, 2L, 3L).subsetOf(got.values.map(_._4).toSet))
  }

  test("q146 native session_window equals a driver-side gap sessionization") {
    val gapUs = graft.queries.SessionOps.GAP_MINUTES * 60L * 1000000L
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(Long, Double)]]
      sorted.foreach { case (_, us, v) =>
        if (sessions.nonEmpty && us - sessions.last.last._1 <= gapUs)
          sessions.last += ((us, v))
        else sessions += scala.collection.mutable.ArrayBuffer((us, v))
      }
      sessions.map { sess =>
        val sum = sess.map(e => BigDecimal(e._2).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (u, sess.head._1, sess.last._1 + gapUs, sess.length.toLong,
          sum.toDouble)
      }
    }.toSet
    val got = graft.queries.SessionOps.q146SessionWindow(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(got == expected)
    // the engine's session end is last event + gap by definition
    assert(got.forall { case (_, s, e, _, _) => e - s >= gapUs })
  }

  test("q152 overlap matrix matches driver-side audience sets") {
    val ev = Tables(spark, sfDir).events
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val audiences = EventAnalytics.PIVOT_TYPES.map(t =>
      t -> ev.filter(_._2 == t).map(_._1).toSet).toMap
    val got = EventAnalytics.q152AudienceOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val types = EventAnalytics.PIVOT_TYPES
    val pairs = for {
      i <- types.indices; j <- types.indices if i < j
    } yield (types(i), types(j))
    assert(got.keySet == pairs.toSet)
    pairs.foreach { case (a, b) =>
      val (sa, sb) = (audiences(a), audiences(b))
      val both = (sa & sb).size.toLong
      val jac = math.floor(both * 1e6 / (sa | sb).size + 0.5).toLong
      assert(got((a, b)) == ((sa.size.toLong, sb.size.toLong, both, jac)),
        s"pair ($a, $b)")
    }
    // jaccard is a valid micro-probability and consistent with counts
    got.values.foreach { case (na, nb, both, jac) =>
      assert(both <= math.min(na, nb))
      assert(jac >= 0L && jac <= 1000000L)
    }
  }

  test("q155 time-weighted average matches a driver-side step-function integral") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 1e4 + 0.5).toLong))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val durs = sorted.sliding(2).collect {
        case Array(a, b) => (a._4, b._3 - a._3)
      }.toSeq
      val span = durs.map(_._2).sum
      val twa =
        if (span == 0L) sorted.last._4 * 100L
        else math.floor(durs.map(d => d._1 * d._2).sum.toDouble * 1e2 /
          span.toDouble + 0.5).toLong
      u -> ((sorted.length.toLong, sorted.head._3, sorted.last._3, twa))
    }
    val got = EventAnalytics.q155TimeWeightedAvg(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected.toMap)
    // a TWA sits inside the value range
    got.values.foreach { case (_, _, _, twa) => assert(twa >= 0L) }
  }
}
