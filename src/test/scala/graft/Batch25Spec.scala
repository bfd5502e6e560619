package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-25 spec: ALS user-factor half-step (q326) —
  * independent driver-side normal-equations recompute on sf0.001.
  */
class Batch25Spec extends SparkSpec {

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
