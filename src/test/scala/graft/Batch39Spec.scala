package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._

/** Round-7 batch-39 spec: one-way ANOVA F (q369), robust means
  * (q370), bigram conditional entropy (q371).
  */
class Batch39Spec extends SparkSpec {

  test("q369 equals a driver-side ANOVA recompute") {
    val evs = Tables(spark, sfDir).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5)
        .toLong))
    val g = evs.groupBy(_._1).values.toSeq.map { xs =>
      (xs.length.toLong, xs.map(_._2).sum, xs.map(t => t._2 * t._2).sum)
    }
    val nn = g.map(_._1).sum
    val stot = g.map(_._2).sum
    val sstot = g.map(_._3).sum
    val k = g.size.toLong
    // UNIT (cents²) grid — the q372 rule; a micro grid overflows
    // BIGINT at sf1 (caught by the round-7 scale run)
    val aUnit = g.map { case (n, s, _) =>
      math.floor(s.toDouble * s.toDouble / n.toDouble + 0.5).toLong
    }.sum
    val bUnit = math.floor(stot.toDouble * stot.toDouble / nn.toDouble +
      0.5).toLong
    val f = ((aUnit.toDouble - bUnit.toDouble) / (k - 1.0)) /
      ((sstot.toDouble - aUnit.toDouble) / (nn.toDouble - k))
    val want = (nn, k, aUnit - bUnit,
      math.floor(f * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q369AnovaF(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).head
    assert(got === want)
    // the parity-free group split carries no injected effect: F is small
    assert(got._4 < 10000000L)
  }

  test("q370 equals a driver-side trimmed/winsorized recompute") {
    val evs = Tables(spark, sfDir).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def dec4(v: Double): JBigDecimal =
      JBigDecimal.valueOf(v).setScale(4, RoundingMode.HALF_UP)
    val want = evs.groupBy(_._1).toSeq.sortBy(_._1).map { case (ty, xs) =>
      val sorted = xs.map(_._2).sorted
      def qd(q: Double) = // rank ceil(q*n), 1-based (quantile_disc)
        sorted(math.max(math.ceil(q * sorted.length).toLong - 1, 0L).toInt)
      val (p05, p95) = (qd(0.05), qd(0.95))
      val kept = xs.map(_._2).filter(v => v >= p05 && v <= p95)
      val winsed = xs.map(_._2).map(v =>
        if (v < p05) p05 else if (v > p95) p95 else v)
      def meanOf(v: Seq[Double], n: Long) =
        v.map(dec4).reduce(_.add(_)).doubleValue / n
      (ty, xs.length.toLong, kept.length.toLong,
        meanOf(xs.map(_._2), xs.length.toLong),
        meanOf(kept, kept.length.toLong),
        meanOf(winsed, winsed.length.toLong))
    }
    val got = graft.queries.LayoutOps.q370RobustMeans(spark, sfDir)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === want)
    // winsorizing moves the mean toward the band, never outside it
    got.foreach(t => assert(t._5 >= 0 && t._6 >= 0))
  }

  test("q371 equals a driver-side conditional-entropy recompute") {
    val docs = Tables(spark, sfDir).documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val bgs = ds.flatMap(d => d._2.sliding(2).filter(_.length == 2))
      val n12 = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n1 = n12.groupBy(_._1.charAt(0)).view
        .mapValues(_.values.sum).toMap
      val tsum = n12.map { case (bg, c12) =>
        math.floor(c12.toDouble *
          math.log(n1(bg.charAt(0)).toDouble / c12.toDouble) * 1e6 + 0.5)
          .toLong
      }.sum
      val n = n12.values.sum
      (src, n, math.floor(tsum.toDouble / n.toDouble + 0.5).toLong)
    }
    val got = graft.queries.LlmText.q371BigramCondEntropy(spark, sfDir)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    // natural text: strictly positive conditional entropy
    got.foreach(t => assert(t._3 > 0L))
  }
}
