package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-41 spec: Kendall τ-b (q374), MAP@k retrieval eval
  * (q375), Brown–Forsythe robust variance test (q376) — each
  * re-derived driver-side by brute force (literal pair enumeration /
  * per-query AP fold / per-group median walk), no algebra shared with
  * the engine implementations.
  */
class Batch41Spec extends SparkSpec {

  test("q374 equals brute-force pair counting over rows; |tau| <= 1") {
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_quantity"), col("l_discount")).collect()
      .map(r => (r.getDouble(0).toLong,
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    // brute force over all unordered row pairs on the (tiny) spec SF
    var conc = 0L; var disc = 0L; var tieQ = 0L; var tieP = 0L
    for (i <- li.indices; j <- (i + 1) until li.length) {
      val (qa, pa) = li(i); val (qb, pb) = li(j)
      if (qa == qb && pa == pb) { tieQ += 1; tieP += 1 }
      else if (qa == qb) tieQ += 1
      else if (pa == pb) tieP += 1
      else if ((qa < qb) == (pa < pb)) conc += 1
      else disc += 1
    }
    val nn = li.length.toLong
    val n0 = nn * (nn - 1) / 2
    val tau = (conc.toDouble - disc.toDouble) /
      math.sqrt((n0 - tieQ).toDouble * (n0 - tieP).toDouble)
    val want = (nn, conc, disc, tieQ, tieP,
      math.floor(tau * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q374KendallTau(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got === want)
    assert(math.abs(got._6) <= 1000000L)
  }

  test("q375 equals a per-query AP fold over the gated rankings") {
    val exact = graft.queries.EmbeddingOps.q30EmbeddingTopk(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.queries.EmbeddingOps.q31LshAnn(spark, sfDir)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = approx.groupBy(_._1).map { case (qid, rows) =>
      var h = 0L; var num = 0L
      rows.sortBy(_._2).foreach { case (_, rank, nid) =>
        if (exact((qid, nid))) { h += 1; num += h * (60L / rank) }
      }
      qid -> ((h, num * 1000000L / 300L))
    }
    val got = graft.queries.VectorOps.q375MapEval(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === want)
    // AP is a mean of precisions: bounded by ppm scale
    got.values.foreach { case (_, ap) =>
      assert(ap >= 0L && ap <= 1000000L)
    }
  }

  test("q376 equals a per-group median + ANOVA-on-|dev| recompute") {
    val evs = Tables(spark, sfDir).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val groups = evs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val g = groups.toSeq.sortBy(_._1).map { case (ty, xs) =>
      val med = xs((xs.length - 1) / 2) // ceil(n/2)-th order stat
      val z = xs.map(x => math.abs(x - med))
      (ty, xs.length.toLong, med, z.map(BigInt(_)).sum,
        z.map(x => BigInt(x) * BigInt(x)).sum)
    }
    val nn = g.map(_._2).sum
    val k = g.length.toLong
    val aUnit = g.map { case (_, n, _, s, _) =>
      math.floor(s.toDouble * s.toDouble / n.toDouble + 0.5).toLong
    }.sum
    val stot = g.map(_._4).sum.toLong
    val sstot = g.map(_._5).sum.toLong
    val bUnit =
      math.floor(stot.toDouble * stot.toDouble / nn.toDouble + 0.5)
        .toLong
    val f = ((aUnit.toDouble - bUnit.toDouble) / (k - 1.0)) /
      ((sstot.toDouble - aUnit.toDouble) / (nn.toDouble - k))
    val wantAll = ("_all", nn, 0L,
      math.floor(stot.toDouble / nn.toDouble * 1e6 + 0.5).toLong,
      math.floor(f * 1e6 + 0.5).toLong)
    val wantGroups = g.map { case (ty, n, med, s, _) =>
      (ty, n, med,
        math.floor(s.toDouble / n.toDouble * 1e6 + 0.5).toLong, 0L)
    }
    val got = graft.queries.StatsOps.q376BrownForsythe(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got === ((wantAll +: wantGroups).sortBy(_._1)))
  }
}
