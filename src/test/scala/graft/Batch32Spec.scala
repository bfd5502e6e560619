package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-32 spec: delete-a-group jackknife SE of a ratio
  * metric (q346) — driver-side recompute plus a plausibility check
  * that the jackknife SE is within an order of magnitude of the
  * naive-iid SE (the ratio denominator makes them differ, but not
  * wildly on near-uniform buckets).
  */
class Batch32Spec extends SparkSpec {

  test("q346 equals a driver-side delete-a-group recompute") {
    import graft.queries.StatsOps.JK_BUCKETS
    val got = graft.queries.StatsOps.q346JackknifeRatio(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(k: Long): Long = {
      val hex = md.digest(s"jk:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % JK_BUCKETS
    }
    val orders = Tables(spark, sfDir).orders
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (bucket(r.getLong(0)),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val g = orders.groupBy(_._1).map { case (b, xs) =>
      (b, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq
    val nn = g.map(_._2).sum; val ss = g.map(_._3).sum
    val bb = g.size.toLong
    val riq = g.map { case (_, n, s) =>
      math.floor((ss - s).toDouble / (nn - n).toDouble + 0.5).toLong
    }
    val rsum = riq.sum
    val ssd = riq.map { r =>
      val d = r.toDouble - rsum.toDouble / bb.toDouble
      math.floor(d * d + 0.5).toLong
    }.sum
    val want = (nn,
      math.floor(ss.toDouble / nn.toDouble + 0.5).toLong,
      math.floor(rsum.toDouble / bb.toDouble + 0.5).toLong,
      math.floor(math.sqrt((bb - 1).toDouble / bb.toDouble * ssd.toDouble)
        + 0.5).toLong)
    assert(got === want)
    // plausibility: SE > 0 and well below the point estimate
    assert(got._4 > 0 && got._4 < got._2 / 10)
  }
}
