package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-26 specs: the three TPC-H shapes that completed the
  * 22-query sweep (q328 Q6, q329 Q12, q330 Q20) — each re-derived
  * driver-side from collected base rows on sf0.001, sharing no Spark
  * plan with the engine under test.
  */
class Batch26Spec extends SparkSpec {

  private def centi(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  private lazy val lines = Tables(spark, sfDir).lineitem
    .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_quantity", "l_discount", "l_extendedprice", "l_shipdate")
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6),
      r.getTimestamp(7).getTime))

  private def inYear1997(epochMs: Long): Boolean = {
    val d = java.time.Instant.ofEpochMilli(epochMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    d.getYear == 1997
  }

  test("q328 equals a driver-side filtered fold (TPC-H Q6 shape)") {
    val got = graft.queries.TpchShapes.q328ForecastRevenue(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val kept = lines.filter { case (_, _, _, _, qty, disc, _, ship) =>
      inYear1997(ship) &&
        centi(disc) >= 5 && centi(disc) <= 7 && centi(qty) < 2400
    }
    val want = (kept.length.toLong,
      kept.map { case (_, _, _, _, _, disc, price, _) =>
        math.floor(price * disc * 1e4 + 0.5).toLong
      }.sum)
    assert(got === want)
  }

  test("q329 equals a driver-side mode/priority recount (Q12 shape)") {
    val got = graft.queries.TpchShapes.q329ShipmodePriority(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val orders = Tables(spark, sfDir).orders
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(1).getTime, r.getString(2))))
      .toMap
    val lateMs = graft.queries.TpchShapes.LATE_DAYS * 86400000L
    val want = lines.flatMap { case (ok, ln, _, _, _, _, _, ship) =>
      val mode = (ok * 7 + ln) % 4
      val (odate, prio) = orders(ok)
      if (inYear1997(ship) && (mode == 1 || mode == 2) &&
          ship > odate + lateMs)
        Some((s"MODE_$mode",
          if (prio == "1-URGENT" || prio == "2-HIGH") 1L else 0L))
      else None
    }.groupBy(_._1).map { case (m, xs) =>
      m -> ((xs.map(_._2).sum, xs.length - xs.map(_._2).sum))
    }
    assert(got === want)
  }

  test("q330 equals a driver-side avail/demand recompute (Q20 shape)") {
    import graft.queries.TpchShapes.EXCESS_PREFIX
    val got = graft.queries.TpchShapes.q330ExcessSuppliers(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)) ->
        r.getLong(3))
      .toMap
    val promoted = Tables(spark, sfDir).part
      .filter(col("p_name").startsWith(EXCESS_PREFIX))
      .collect().map(_.getLong(0)).toSet
    val nations = Tables(spark, sfDir).nation
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val suppliers = Tables(spark, sfDir).supplier
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    val promo = lines.filter(l => promoted(l._3))
    val avail = promo.groupBy(l => (l._4, l._3))
      .map { case (k, xs) => k -> xs.map(x => centi(x._5)).sum }
    val demand = promo.filter(l => inYear1997(l._8))
      .groupBy(_._3).map { case (p, xs) => p -> xs.map(x => centi(x._5)).sum }
    val want = avail.toSeq
      .filter { case ((_, p), a) => demand.get(p).exists(d => a * 2 > d) }
      .groupBy { case ((s, _), _) => s }
      .map { case (s, xs) =>
        (nations(suppliers(s)._2), s, suppliers(s)._1) -> xs.size.toLong
      }
    assert(got === want)
    assert(got.nonEmpty)
  }
}
