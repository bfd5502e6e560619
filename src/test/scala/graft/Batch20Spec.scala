package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-20 specs: debounce, conjunctive/phrase search, MMR
  * rerank (q306–q308) — independent driver-side re-derivations on
  * sf0.001 (q309's replay spec lives in StreamRetentionSpec).
  */
class Batch20Spec extends SparkSpec {

  test("q306 equals a sequential last-kept throttle per key") {
    import graft.queries.TemporalOps.DEBOUNCE_US
    val got = graft.queries.TemporalOps.q306Debounce(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val evs = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((u, ty), es) =>
      var last = Long.MinValue / 2
      es.sortBy(e => (e._3, e._4)).flatMap { e =>
        if (e._3 >= last + DEBOUNCE_US) { last = e._3; Some((u, ty, e._4)) }
        else None
      }
    }.toSet
    assert(got === want)
    // the throttle semantics differ from a lag filter exactly when a
    // chain of sub-threshold gaps crosses the threshold cumulatively —
    // kept set must never contain two same-key events closer than the
    // refractory period
    val byKey = got.toSeq.groupBy(k => (k._1, k._2))
    val ts = evs.map(e => e._4 -> e._3).toMap
    byKey.values.foreach { ks =>
      val kept = ks.map(k => ts(k._3)).sorted
      kept.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= DEBOUNCE_US)
        case _ =>
      }
    }
  }

  test("q307 equals a driver-side postings recount") {
    import graft.queries.Retrieval.{CONJ_T1, CONJ_T2, CONJ_TOP}
    val got = graft.queries.Retrieval.q307ConjunctiveSearch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val p1 = ws.zipWithIndex.collect { case (w, i) if w == CONJ_T1 => i + 1 }
      val p2 = ws.zipWithIndex.collect { case (w, i) if w == CONJ_T2 => i + 1 }
      if (p1.isEmpty || p2.isEmpty) None
      else {
        val np = p1.count(p => p2.contains(p + 1)).toLong
        Some((id, p1.length.toLong, p2.length.toLong,
          (p1.length + p2.length).toLong, np, np > 0))
      }
    }.sortBy(t => (-t._4, t._1)).take(CONJ_TOP)
    assert(got.toSeq === want.toSeq)
  }

  test("q312 equals a java.time recompute (independent calendar impl)") {
    import java.time.LocalDate
    import java.time.temporal.{IsoFields, WeekFields}
    val got = graft.queries.SqlSurface.q312CalendarArith(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getString(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val want = Tables(spark, sfDir).orders
      .filter(col("o_orderkey") % 41 === 0)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .collect().map { r =>
        val d = LocalDate.parse(r.getString(1))
        r.getLong(0) -> ((
          d.plusMonths(1).toString, d.plusMonths(13).toString,
          d.`with`(java.time.DayOfWeek.MONDAY).toString,
          d.withDayOfMonth(1).withMonth((d.getMonthValue - 1) / 3 * 3 + 1)
            .toString,
          d.get(WeekFields.ISO.weekOfWeekBasedYear).toLong,
          d.lengthOfMonth.toLong,
          java.time.temporal.ChronoUnit.DAYS.between(
            d, LocalDate.of(2000, 1, 1))))
      }.toMap
    assert(got === want)
  }

  test("q311 equals a driver-side water-filling recompute") {
    import graft.queries.TrainPrep.WF_ROUNDS
    val got = graft.queries.TrainPrep.q311MixtureWaterfill(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getLong(6)))).toMap
    val avail = Tables(spark, sfDir).documents
      .select(col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val w = avail.map { case (s, a) =>
      s -> math.floor(math.sqrt(a.toDouble) * 1e6 + 0.5).toLong }
    val cap = avail.map { case (s, a) => s -> a * 3 / 2 }
    val budget = avail.values.sum * 3 / 2
    var alloc = Map.empty[String, Long]
    for (_ <- 1 to WF_ROUNDS) {
      val wRem = w.collect { case (s, v) if !alloc.contains(s) => v }.sum
      val rRem = budget - alloc.values.sum
      val newly = avail.keys.filterNot(alloc.contains)
        .filter(s => rRem * w(s) / wRem >= cap(s))
      alloc = alloc ++ newly.map(s => s -> cap(s))
    }
    val wRem = w.collect { case (s, v) if !alloc.contains(s) => v }.sum
    val rRem = budget - alloc.values.sum
    val want = avail.map { case (s, a) =>
      val al = alloc.getOrElse(s, math.min(cap(s), rRem * w(s) / wRem))
      s -> ((a, w(s), cap(s), al, al == cap(s), al * 1000000L / a))
    }
    assert(got === want)
    // the allocation must respect the budget and every cap
    assert(want.values.map(_._4).sum <= budget)
    assert(want.forall { case (s, v) => v._4 <= cap(s) })
  }

  test("q310 exact side equals q89 and every sketch lands in-bound") {
    val got = graft.queries.EventAnalytics.q310SlidingHll(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    val exact = graft.queries.EventAnalytics.q89RollingDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap === exact)
    // lgK=12 (~1.6% SE) on daily-scale sets: every estimate must sit
    // inside the 3-SE bound the gate reports
    assert(got.values.forall(_._2), "an HLL estimate left its 3-SE bound")
  }

  test("q308 equals a driver-side greedy MMR recompute") {
    import graft.queries.EmbeddingOps.{MMR_CAND, MMR_K, MMR_LAMBDA, MMR_DIVW, NUM_QUERIES}
    val lam = MMR_LAMBDA.toDouble
    val divw = MMR_DIVW.toDouble
    val got = graft.queries.EmbeddingOps.q308MmrRerank(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val embs = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val byId = embs.toMap
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = embs.filter(_._1 < NUM_QUERIES).flatMap { case (q, qe) =>
      val cand = embs.filter(_._1 != q)
        .map { case (v, e) => (v, sim(qe, e)) }
        .sortBy { case (v, s) => (-s, v) }.take(MMR_CAND)
      var selected = List(cand.head)
      var selScores = List((cand.head._1, cand.head._2, 0.0))
      var remaining = cand.tail.toList
      for (step <- 2 to MMR_K) {
        val scored = remaining.map { case (v, rel) =>
          val ms = selected.map(s => sim(byId(v), byId(s._1))).max
          (v, rel, ms, lam * rel - divw * ms)
        }
        val best = scored.minBy { case (v, _, _, sc) => (-sc, v) }
        selected = selected :+ ((best._1, best._2))
        selScores = selScores :+ ((best._1, best._2, best._3))
        remaining = remaining.filterNot(_._1 == best._1)
      }
      selScores.zipWithIndex.map { case ((v, rel, ms), i) =>
        (q, (i + 1).toLong) -> ((v,
          math.floor(rel * 1e6 + 0.5).toLong,
          math.floor((lam * rel - divw * ms) * 1e6 + 0.5).toLong))
      }
    }.toMap
    assert(got === want)
    // diversification must never pick a duplicate neighbor per query
    val perQ = got.keys.groupBy(_._1)
    perQ.foreach { case (q, ks) =>
      val ids = ks.map(k => got(k)._1).toSeq
      assert(ids.distinct.size === ids.size, s"query $q")
    }
  }
}
