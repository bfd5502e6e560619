package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._

/** Round-7 batch-33 spec: survival inference pair (q347 log-rank,
  * q348 Nelson–Aalen), privacy t-closeness (q349), BH FDR (q350),
  * CUPED (q351), margin mining (q352) — each re-derived independently
  * on the driver from first principles (sequential folds over
  * collected rows, no shared Spark plan fragments).
  */
class Batch33Spec extends SparkSpec {

  /** (dur_min, grp, ev) subjects exactly as q139/q347/q348 define
    * them: per (user, day), censor at last activity, event at first
    * purchase.
    */
  private def subjects(): Seq[(Long, Long, Long)] = {
    val evs = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    evs.groupBy(t => (t._1, t._2 / 86400000000L)).map { case ((u, _), xs) =>
      val f = xs.map(_._2).min
      val l = xs.map(_._2).max
      val p = xs.filter(_._3 == "purchase").map(_._2).sorted.headOption
      val dur = p.map(pp => (pp - f) / 60000000L).getOrElse((l - f) / 60000000L)
      (dur, u % 2, if (p.isDefined) 1L else 0L)
    }.toSeq
  }

  test("q347 equals a sequential log-rank recompute") {
    val subs = subjects()
    val durs = subs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(x => x._2 == 1 && x._3 == 1).toLong,
        xs.count(_._3 == 1).toLong,
        xs.count(_._2 == 1).toLong, xs.size.toLong)
    }
    var n = subs.size.toLong
    var n1 = subs.count(_._2 == 1).toLong
    var o1 = 0L; var e1u = 0L; var vu = 0L
    durs.foreach { case (_, d1, d, m1, m) =>
      if (d > 0) {
        o1 += d1
        e1u += math.floor((d * n1).toDouble / n.toDouble * 1e6 + 0.5).toLong
        if (n > 1)
          vu += math.floor((d * n1).toDouble / n.toDouble *
            ((n - n1).toDouble / n.toDouble) *
            ((n - d).toDouble / (n - 1).toDouble) * 1e6 + 0.5).toLong
      }
      n -= m; n1 -= m1
    }
    val z = math.floor((o1.toDouble - e1u.toDouble / 1e6) /
      math.sqrt(vu.toDouble / 1e6) * 1e6 + 0.5).toLong
    val got = graft.queries.EventAnalytics.q347LogRank(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got === ((o1, e1u, vu, z)))
    // the parity split is a null effect by construction: |z| < 4
    assert(math.abs(z) < 4000000L)
  }

  test("q348 equals a sequential Nelson-Aalen recompute") {
    val subs = subjects()
    val durs = subs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._3 == 1).toLong, xs.size.toLong)
    }
    var n = subs.size.toLong
    var ch = 0L; var vv = 0L
    val want = durs.map { case (t, d, m) =>
      if (d > 0) {
        ch += math.floor(d.toDouble / n.toDouble * 1e6 + 0.5).toLong
        vv += math.floor(d.toDouble / n.toDouble *
          ((n - d).toDouble / n.toDouble) / n.toDouble * 1e12 + 0.5).toLong
      }
      val row = (t, n, d, ch, vv)
      n -= m
      row
    }
    val got = graft.queries.EventAnalytics.q348NelsonAalen(spark, sfDir)
      .orderBy("dur_min").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === want)
    // cumulative hazard majorizes -ln(KM survival) step for step
    assert(got.last._4 >= got.head._4)
  }

  test("q349 equals a driver-side total-variation recompute") {
    import graft.queries.StatsOps.{ANON_BAND, T_CLOSE_MICRO}
    val rows = Tables(spark, sfDir).customer
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) / ANON_BAND).toLong))
    val nn = rows.length.toLong
    val glob = rows.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    val want = rows.groupBy(t => (t._1, t._2)).toSeq
      .sortBy(t => (t._1._1, t._1._2)).map { case ((nat, seg), xs) =>
        val ng = xs.length.toLong
        val mine = xs.groupBy(_._3).map { case (b, ys) =>
          b -> ys.length.toLong
        }
        val num = glob.map { case (b, gb) =>
          math.abs(mine.getOrElse(b, 0L) * nn - gb * ng)
        }.sum
        val tvd = math.floor(num.toDouble / (2.0 * ng * nn) * 1e6 + 0.5)
          .toLong
        (nat, seg, ng, tvd, tvd > T_CLOSE_MICRO)
      }
    val got = graft.queries.StatsOps.q349TCloseness(spark, sfDir)
      .orderBy("nation", "segment").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got === want)
  }

  test("q350 equals a driver-side BH step-up recompute") {
    import graft.queries.StatsOps.FDR_ALPHA_MICRO
    val evs = Tables(spark, sfDir).events
      .select(col("event_type"), unix_micros(col("ts")), col("user_id"),
        col("value")).collect()
      .map(r => ((r.getString(0), r.getLong(1) / 86400000000L),
        r.getLong(2) % 2, r.getDouble(3)))
    def dec4(v: Double): JBigDecimal =
      JBigDecimal.valueOf(v).setScale(4, RoundingMode.HALF_UP)
    val segs = evs.groupBy(_._1).toSeq.flatMap { case ((ty, day), xs) =>
      val a = xs.filter(_._2 == 0).map(_._3)
      val b = xs.filter(_._2 == 1).map(_._3)
      if (a.length < 2 || b.length < 2) None
      else {
        val (na, nb) = (a.length.toDouble, b.length.toDouble)
        def s1(v: Seq[Double]) =
          v.map(dec4).reduce(_.add(_)).doubleValue
        def s2(v: Seq[Double]) =
          v.map(x => dec4(x * x)).reduce(_.add(_)).doubleValue
        val se2 = (s2(a) - s1(a) * s1(a) / na) / (na - 1) / na +
          (s2(b) - s1(b) * s1(b) / nb) / (nb - 1) / nb
        if (se2 <= 0) None
        else {
          val z = (s1(a) / na - s1(b) / nb) / math.sqrt(se2)
          val az = math.abs(z)
          val t = 1.0 / (1.0 + 0.2316419 * az)
          val poly = t * (0.319381530 + t * (-0.356563782 +
            t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
          val p = 2.0 * math.exp(-0.5 * az * az) * 0.3989422804014327 * poly
          Some((ty, day, a.length.toLong, b.length.toLong,
            math.floor(p * 1e6 + 0.5).toLong))
        }
      }
    }
    val m = segs.size.toLong
    val byP = segs.sortBy(s => (s._5, s._1, s._2)).zipWithIndex
      .map { case (s, i) => (s, i + 1L) }
    val kmax = byP.filter { case (s, k) => s._5 * m <= k * FDR_ALPHA_MICRO }
      .map(_._2).maxOption.getOrElse(0L)
    val want = byP.map { case ((ty, day, na, nb, p), k) =>
      (ty, day, na, nb, p, k, k <= kmax)
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.StatsOps.q350BhFdr(spark, sfDir)
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5).toLong, r.getBoolean(6))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._7)) ===
      want.map(t => (t._1, t._2, t._3, t._4, t._5, t._7)))
    // ranks are a permutation 1..m
    assert(got.map(_._6).sorted === (1L to m).toSeq)
  }

  test("q351 equals a driver-side CUPED recompute") {
    import graft.queries.EventAnalytics.CUPED_CUT_US
    val evs = Tables(spark, sfDir).events
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val want = evs.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (ty, xs) =>
      val perUser = xs.groupBy(_._2).values.map { ys =>
        (ys.filter(_._3 < CUPED_CUT_US).map(_._4).sum,
          ys.filter(_._3 >= CUPED_CUT_US).map(_._4).sum)
      }.toSeq
      val n = perUser.size.toDouble
      val sx = perUser.map(_._1).sum.toDouble
      val sy = perUser.map(_._2).sum.toDouble
      val sxx = perUser.map(t => t._1 * t._1).sum.toDouble
      val sxy = perUser.map(t => t._1 * t._2).sum.toDouble
      val syy = perUser.map(t => t._2 * t._2).sum.toDouble
      val covN = n * sxy - sx * sy
      val varxN = n * sxx - sx * sx
      val varyN = n * syy - sy * sy
      if (perUser.size < 2 || varxN <= 0) None
      else Some((ty, perUser.size.toLong, covN / varxN,
        varyN / (n * (n - 1.0)),
        (varyN - covN * covN / varxN) / (n * (n - 1.0)),
        math.floor(covN * covN / varxN / varyN * 1e6 + 0.5).toLong))
    }
    val got = graft.queries.EventAnalytics.q351Cuped(spark, sfDir)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got === want)
    // variance reduction is nonnegative by construction
    got.foreach(t => assert(t._4 >= t._5 && t._6 >= 0L))
  }

  test("q352 equals a brute-force margin recompute") {
    import graft.queries.EmbeddingOps._
    val embs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def simNano(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e9 + 0.5).toLong
    }
    val src = embs.filter(_._3 <= 4)
    val tgt = embs.filter(_._3 >= 5)
    val anchors = src.filter(_._1 < MARGIN_ANCHOR_MAX)
    val want = anchors.sortBy(_._1).map { case (aId, aEmb, _) =>
      val ranked = tgt.map(t => (t._1, simNano(aEmb, t._2)))
        .sortBy(t => (-t._2, t._1)).take(MARGIN_CAND_K)
      val sumA = ranked.take(MARGIN_TOP_K).map(_._2).sum
      val best = ranked.map { case (tId, s) =>
        val tEmb = tgt.find(_._1 == tId).get._2
        val sumB = src.map(sv => (sv._1, simNano(tEmb, sv._2)))
          .sortBy(t => (-t._2, t._1)).take(MARGIN_TOP_K).map(_._2).sum
        (tId, math.floor(2.0 * MARGIN_TOP_K * s.toDouble /
          (sumA + sumB).toDouble * 1e6 + 0.5).toLong)
      }.sortBy(t => (-t._2, t._1)).head
      (aId, best._1, best._2, best._2 >= MARGIN_THRESH_MICRO)
    }.toSeq
    val got = graft.queries.EmbeddingOps.q352MarginMining(spark, sfDir)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got === want)
  }
}
