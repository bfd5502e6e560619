package graft

import graft.queries.{LayoutOps, SqlSurface}
import org.apache.spark.sql.functions._

class SqlSurfaceSpec extends SparkSpec {

  test("every SQL-surface query has an oracle and runs non-empty") {
    SqlSurface.queries.foreach { case (name, fn) =>
      assert(SqlSurface.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q171 grains reconcile: per-grain totals all equal the table total") {
    val df = SqlSurface.q171GroupingSets(spark, sfDir)
    val totals = df.groupBy("gid").agg(sum("n").as("t"), count(lit(1)).as("rows"))
      .collect().map(r => r.getAs[Long]("gid") -> (r.getAs[Long]("t"),
        r.getAs[Long]("rows"))).toMap
    val n = Tables(spark, sfDir).lineitem.count()
    assert(totals(0L)._1 === n) // (flag, status)
    assert(totals(1L)._1 === n) // (flag)
    assert(totals(3L)._1 === n && totals(3L)._2 === 1L) // grand total
  }

  test("q172 multiset counts reconcile with per-key min/diff") {
    val t = Tables(spark, sfDir)
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hv = t.orders.filter(col("o_totalprice") > 200000.0)
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val res = SqlSurface.q172SetOps(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    urgent.keys.foreach { k =>
      val i = math.min(urgent(k), hv.getOrElse(k, 0L))
      val x = urgent(k) - i
      assert(res.getOrElse(("intersect_all", k), 0L) === i, s"intersect $k")
      assert(res.getOrElse(("except_all", k), 0L) === x, s"except $k")
    }
  }

  test("q173 spine is dense: every (type, day) cell present exactly once") {
    val df = SqlSurface.q173GapFill(spark, sfDir)
    val types = Tables(spark, sfDir).events
      .select("event_type").distinct().count()
    val days = df.select("day").distinct().count()
    assert(df.count() === types * days)
    assert(df.groupBy("event_type", "day").count()
      .filter(col("count") > 1).count() === 0)
    // zero-filled cells exist (the reason the spine exists at all)
    val totalFromFill = df.agg(sum("n")).head.getLong(0)
    assert(totalFromFill === Tables(spark, sfDir).events.count())
  }

  test("q174 weighted median equals a driver-side cumulative-weight scan") {
    val rows = Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"),
        floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("wc"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (f, rs) =>
      val sorted = rs.sortBy(_._2)
      val tot = sorted.map(_._3).sum
      var cum = 0L
      f -> sorted.find { r => cum += r._3; cum * 2 >= tot }.get._2
    }
    val got = LayoutOps.q174WeightedMedian(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === want)
  }

  test("q234 ordered aggregation strings follow the exact rank order") {
    val orders = Tables(spark, sfDir).orders
      .select(col("o_orderpriority"), col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = orders.groupBy(_._1).view.mapValues { xs =>
      val top = xs.sortBy(t => (-t._3, t._2)).take(5)
      (top.length.toLong, top.map(_._3).sum, top.map(_._2).mkString(","))
    }.toMap
    val got = graft.queries.SqlSurface.q234OrderedAgg(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_top"), r.getAs[Long]("top_rev_c"),
          r.getAs[String]("top_keys"))).toMap
    assert(got === want)
  }

  test("q233 RANGE frame is the calendar week, not the last 7 rows") {
    val daily = Tables(spark, sfDir).orders
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")).as("r"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    val got = graft.queries.SqlSurface.q233TrailingWindow(spark, sfDir)
      .collect()
      .map(x => x.getLong(0) -> ((x.getAs[Long]("n_7d"), x.getAs[Long]("rev_7d_c"))))
      .toMap
    daily.foreach { case (d, _, _) =>
      val in = daily.filter(t => t._1 >= d - 6 && t._1 <= d)
      assert(got(d) === ((in.map(_._2).sum, in.map(_._3).sum)), s"day $d")
    }
  }

  test("q245 atlas rows reconcile with direct per-table key counts") {
    val rows = graft.queries.PlannerOps.q245SkewAtlas(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
          r.getAs[Long]("hot_rows"))).toMap
    assert(rows.keySet === Set("lineitem", "orders", "events",
      "documents", "embeddings"))
    val t = Tables(spark, sfDir)
    def direct(df: org.apache.spark.sql.DataFrame, key: String) = {
      val h = df.groupBy(key).count().collect().map(_.getLong(1))
      (h.sum, h.length.toLong, h.max)
    }
    assert(rows("lineitem") === direct(t.lineitem, "l_orderkey"))
    assert(rows("events") === direct(t.events, "user_id"))
    assert(rows("documents") === direct(t.documents, "source"))
  }

  test("q242 advisor arithmetic reconciles with the key histogram") {
    val hist = Tables(spark, sfDir).events
      .groupBy("user_id").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val r = graft.queries.PlannerOps.q242ShuffleAdvisor(spark, sfDir).head
    val n = hist.map(_._2).sum
    assert(r.getAs[Long]("n_rows") === n)
    assert(r.getAs[Long]("n_keys") === hist.length.toLong)
    val hotRows = hist.map(_._2).max
    assert(r.getAs[Long]("hot_rows") === hotRows)
    assert(r.getAs[Long]("hot_key") ===
      hist.filter(_._2 == hotRows).map(_._1).min)
    def ceilDiv(a: Long, b: Long) = (a + b - 1) / b
    val parts = ceilDiv(n * graft.queries.PlannerOps.ADV_ROW_BYTES,
      graft.queries.PlannerOps.ADV_TARGET_BYTES)
    assert(r.getAs[Long]("suggested_partitions") === parts)
    val rpp = ceilDiv(n, parts)
    assert(r.getAs[Long]("rows_per_partition") === rpp)
    assert(r.getAs[Long]("salt_factor") === ceilDiv(hotRows, rpp))
  }

  test("q232 invalidation plan reconciles against the change definition") {
    val orders = Tables(spark, sfDir).orders
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        (conv(substring(md5(col("o_orderkey").cast("string")), 1, 6), 16, 10)
          .cast("long") % 100 <
          graft.queries.PlannerOps.INVALIDATE_PCT).as("chg"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val liByOrder = Tables(spark, sfDir).lineitem
      .groupBy("l_orderkey").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val affected = orders.filter(_._3).groupBy(_._2)
    val got = graft.queries.PlannerOps.q232InvalidationPlan(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_changed_orders"), r.getAs[Long]("n_month_orders"),
          r.getAs[Long]("recompute_rows"))).toMap
    assert(got.keySet === affected.keySet)
    affected.foreach { case (m, chg) =>
      val monthOrders = orders.filter(_._2 == m)
      val (nc, nm, rr) = got(m)
      assert(nc === chg.length.toLong)
      assert(nm === monthOrders.length.toLong)
      assert(rr === monthOrders.map(o => liByOrder.getOrElse(o._1, 0L)).sum)
    }
  }
}
