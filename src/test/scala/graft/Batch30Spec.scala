package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-30 spec: Brier-score Murphy decomposition (q343) —
  * exact driver-side recompute plus an independent check of the
  * Murphy identity Brier(bin-mean forecasts) = REL − RES + UNC.
  */
class Batch30Spec extends SparkSpec {

  test("q343 equals a recompute and satisfies the Murphy identity") {
    import graft.queries.StatsOps.{ISO_BINS, LOGREG_W}
    val got = graft.queries.StatsOps.q343BrierDecomposition(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Tables(spark, sfDir).lineitem
      .select("l_quantity", "l_discount", "l_returnflag").collect()
      .map { r =>
        val z = LOGREG_W(0) + LOGREG_W(1) * r.getDouble(0) +
          LOGREG_W(2) * r.getDouble(1)
        val pm = math.floor(1.0 / (1.0 + math.exp(-z)) * 1e6 + 0.5).toLong
        val bin = math.min(math.floor(pm * ISO_BINS / 1000000.0).toLong,
          (ISO_BINS - 1).toLong)
        (bin, pm, if (r.getString(2) == "R") 1L else 0L)
      }
    val bins = rows.groupBy(_._1).map { case (b, xs) =>
      (b, xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).sum)
    }.toSeq
    val nn = bins.map(_._2).sum
    val pp = bins.map(_._3).sum
    val obarAll = pp.toDouble / nn.toDouble
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val (relS, resS, eceS) = bins.foldLeft((0L, 0L, 0L)) {
      case ((a, b, c), (_, n, pos, pmSum)) =>
        val fbar = pmSum.toDouble / n.toDouble / 1e6
        val obar = pos.toDouble / n.toDouble
        (a + micro(n.toDouble * (fbar - obar) * (fbar - obar)),
          b + micro(n.toDouble * (obar - obarAll) * (obar - obarAll)),
          c + micro(n.toDouble * math.abs(fbar - obar)))
    }
    val want = Map(
      "reliability" -> math.floor(relS.toDouble / nn.toDouble + 0.5).toLong,
      "resolution" -> math.floor(resS.toDouble / nn.toDouble + 0.5).toLong,
      "ece" -> math.floor(eceS.toDouble / nn.toDouble + 0.5).toLong,
      "uncertainty" -> micro(obarAll * (1.0 - obarAll)),
      "n" -> nn)
    assert(got === want)
    // Murphy identity: the Brier score of the BIN-MEAN forecasts
    // equals REL − RES + UNC (up to the documented per-bin
    // micro-quantization, ≤ ~1 micro after the /N)
    val fbarOf = bins.map(t => t._1 -> t._4.toDouble / t._2.toDouble / 1e6)
      .toMap
    val brierBinned = rows.map { case (b, _, y) =>
      val d = fbarOf(b) - y
      d * d
    }.sum / nn.toDouble
    val identity = (got("reliability") - got("resolution") +
      got("uncertainty")).toDouble
    assert(math.abs(identity - brierBinned * 1e6) <= 3.0,
      s"Murphy identity violated: $identity vs ${brierBinned * 1e6}")
  }
}
