package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-25 specs: ALS user-factor half-step (q326) and
  * sliced ROC AUC (q327) — independent driver-side recomputes on
  * sf0.001.
  */
class Batch25Spec extends SparkSpec {

  test("q327 equals a driver-side per-slice pair-counting AUC") {
    val got = graft.queries.StatsOps.q327SlicedAuc(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val w = graft.queries.StatsOps.LOGREG_W
    val rows = Tables(spark, sfDir).lineitem
      .join(Tables(spark, sfDir).orders
        .select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_orderpriority", "l_quantity", "l_discount", "l_returnflag")
      .collect().map { r =>
        val z = w(0) + w(1) * r.getDouble(1) + w(2) * r.getDouble(2)
        val p = math.floor(1.0 / (1.0 + math.exp(-z)) * 1e6 + 0.5).toLong
        (r.getString(0), p, if (r.getString(3) == "R") 1L else 0L)
      }
    // AUC by literal pair counting: P(score_pos > score_neg) + half
    // ties — the definition, no rank algebra shared with the engine
    val want = rows.groupBy(_._1).map { case (s, xs) =>
      val pos = xs.filter(_._3 == 1L).map(_._2)
      val neg = xs.filter(_._3 == 0L).map(_._2)
      val wins = (for (a <- pos; b <- neg)
        yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
      s -> ((xs.length.toLong, pos.length.toLong, neg.length.toLong,
        math.floor(wins / (pos.length.toDouble * neg.length) * 1e6 + 0.5)
          .toLong))
    }
    assert(got === want)
  }

  test("q326 equals a driver-side 2x2 least-squares recompute") {
    import graft.queries.VectorOps.ALS_LAMBDA_C
    val got = graft.queries.VectorOps.q326AlsStep(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8))))
      .toMap
    val rows = Tables(spark, sfDir).lineitem
      .join(Tables(spark, sfDir).orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey", "l_partkey").agg(count(lit(1)).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (u, is) =>
      val fs = is.map { case (_, i, r) =>
        (r, i * 31 % 7 - 3, i * 17 % 5 - 2)
      }
      val a = fs.map(f => f._2 * f._2).sum
      val b = fs.map(f => f._2 * f._3).sum
      val d = fs.map(f => f._3 * f._3).sum
      val p = fs.map(f => f._1 * f._2).sum
      val q = fs.map(f => f._1 * f._3).sum
      val (m11, m12, m22) = ((a + ALS_LAMBDA_C) / 100.0, b / 100.0,
        (d + ALS_LAMBDA_C) / 100.0)
      val (v1, v2) = (p / 10.0, q / 10.0)
      val det = m11 * m22 - m12 * m12
      u -> ((fs.length.toLong, a, b, d, p, q,
        (m22 * v1 - m12 * v2) / det, (m11 * v2 - m12 * v1) / det))
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (u, g) =>
      val w = want(u)
      assert((g._1, g._2, g._3, g._4, g._5, g._6) ===
        ((w._1, w._2, w._3, w._4, w._5, w._6)), u)
      assert(math.abs(g._7 - w._7) < 1e-12 && math.abs(g._8 - w._8) < 1e-12, u)
    }
    // the update must actually solve the normal equations:
    // (F'F/100 + lambda I) x = F'r/10 within float tolerance
    want.foreach { case (_, (_, a, b, d, p, q, x1, x2)) =>
      val r1 = ((a + ALS_LAMBDA_C) / 100.0) * x1 + (b / 100.0) * x2 - p / 10.0
      val r2 = (b / 100.0) * x1 + ((d + ALS_LAMBDA_C) / 100.0) * x2 - q / 10.0
      assert(math.abs(r1) < 1e-9 && math.abs(r2) < 1e-9)
    }
  }
}
