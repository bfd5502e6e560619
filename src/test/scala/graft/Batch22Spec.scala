package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-22 specs: approx-percentile sketch eval, bottom-k
  * hash sampling, RANGE-frame windows (q317–q319) — independent
  * driver-side re-derivations on sf0.001.
  */
class Batch22Spec extends SparkSpec {

  test("q317 exact side equals a driver-side percentile and bounds hold") {
    val got = graft.queries.ProfileOps.q317ApproxPercentileEval(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4), r.getBoolean(5)))).toMap
    val vals = Tables(spark, sfDir).events
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def pct(xs: Seq[Double], p: Double): Double = {
      // Spark's exact percentile: linear interpolation at rank
      // p*(n-1) (0-based), the same contract as DuckDB quantile_cont
      val pos = p * (xs.length - 1)
      val lo = pos.toInt
      val hi = math.min(lo + 1, xs.length - 1)
      xs(lo) + (pos - lo) * (xs(hi) - xs(lo))
    }
    val want = vals.map { case (t, xs) =>
      t -> ((xs.length.toLong, pct(xs, 0.5), pct(xs, 0.95)))
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (t, (n, p50, p95, b50, b95)) =>
      val (wn, w50, w95) = want(t)
      assert(n === wn)
      assert(math.abs(p50 - w50) < 1e-9 && math.abs(p95 - w95) < 1e-9, t)
      // the GK sketch must honor its published rank guarantee
      assert(b50 && b95, s"approx_percentile left its rank bound for $t")
    }
  }

  test("q318 equals a driver-side bottom-k hash recompute") {
    import graft.queries.TrainPrep.BOTTOMK_K
    val got = graft.queries.TrainPrep.q318BottomkSample(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sfDir).documents
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = docs.groupBy(_._1).toSeq.flatMap { case (s, ds) =>
      ds.map { case (_, id) => (id, h(s"$s:$id")) }
        .sortBy { case (id, hh) => (hh, id) }
        .take(BOTTOMK_K).zipWithIndex
        .map { case ((id, hh), i) => (s, (i + 1).toLong, id, hh) }
    }.toSet
    assert(got.toSet === want)
    // mergeability: bottom-k of the union == bottom-k of two halves'
    // bottom-ks (the shard-rollup property the doc comment claims)
    docs.groupBy(_._1).foreach { case (s, ds) =>
      val keyed = ds.map { case (_, id) => (id, h(s"$s:$id")) }
      val (h1, h2) = keyed.partition(_._1 % 2 == 0)
      def bk(xs: Seq[(Long, String)]) =
        xs.sortBy { case (id, hh) => (hh, id) }.take(BOTTOMK_K)
      assert(bk(bk(h1.toSeq) ++ bk(h2.toSeq)) === bk(keyed.toSeq), s)
    }
  }

  test("q319 equals a driver-side range-frame recompute") {
    val got = graft.queries.SqlSurface.q319RangeFrame(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val rows = Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, os) =>
      os.map { case (k, c, d, cents) =>
        val trail = os.filter(o => o._3 >= d - 6 && o._3 <= d)
        val lead = os.filter(o => o._3 >= d && o._3 <= d + 13)
        k -> ((c, d, cents, trail.map(_._4).sum,
          lead.map(_._4).sum, trail.length.toLong))
      }
    }.toMap
    assert(got === want)
  }
}
