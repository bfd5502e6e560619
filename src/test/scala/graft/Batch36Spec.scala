package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-36 spec: ORC roundtrip (q359), Cochran–Armitage
  * trend (q360), post-stratification ATE (q361), cross-source
  * quantile normalization (q362) — driver-side recomputes.
  */
class Batch36Spec extends SparkSpec {

  test("q359 ORC roundtrip preserves the corpus exactly") {
    val want = Tables(spark, sfDir).documents
      .filter(col("source") =!= "src0")
      .collect().groupBy(_.getString(3)).toSeq.sortBy(_._1)
      .map { case (src, rs) =>
        (src, rs.length.toLong,
          rs.map(_.getString(1).length.toLong).sum,
          rs.map(_.getLong(4)).sum)
      }
    val got = graft.queries.CorpusOps.q359OrcRoundtrip(spark, sfDir)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
  }

  test("q360 equals a driver-side Cochran-Armitage recompute") {
    import graft.queries.StatsOps.CA_PRICE_CUT
    val os = Tables(spark, sfDir).orders
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0).substring(0, 1).toLong,
        if (r.getDouble(1) > CA_PRICE_CUT) 1L else 0L))
    val g = os.groupBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq
    val nn = g.map(_._2).sum; val rr = g.map(_._3).sum
    val sn = g.map(t => t._1 * t._2).sum
    val sr = g.map(t => t._1 * t._3).sum
    val ssn = g.map(t => t._1 * t._1 * t._2).sum
    val t0 = sr.toDouble - sn.toDouble * rr.toDouble / nn.toDouble
    val p = rr.toDouble / nn.toDouble
    val v = p * (1.0 - p) *
      (ssn.toDouble - sn.toDouble * sn.toDouble / nn.toDouble)
    val want = (nn, rr, math.floor(t0 * 1e6 + 0.5).toLong,
      math.floor(v * 1e6 + 0.5).toLong,
      math.floor(t0 / math.sqrt(v) * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q360CochranArmitage(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    assert(got === want)
  }

  test("q361 equals a driver-side post-stratification recompute") {
    val evs = Tables(spark, sfDir).events
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1) % 2,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val strata = evs.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (ty, xs) =>
        val t1 = xs.filter(_._2 == 1).map(_._3)
        val t0 = xs.filter(_._2 == 0).map(_._3)
        if (t1.length < 2 || t0.length < 2) None
        else {
          def svar(v: Seq[Long]) = {
            val n = v.length.toDouble
            val s1 = v.sum.toDouble
            val s2 = v.map(x => x * x).sum.toDouble
            (s2 - s1 * s1 / n) / (n - 1.0) / n
          }
          val diff = t1.sum.toDouble / t1.length -
            t0.sum.toDouble / t0.length
          Some((ty, (t1.length + t0.length).toLong, t1.length.toLong,
            t0.length.toLong,
            math.floor(diff * 1e6 + 0.5).toLong,
            math.floor((svar(t1) + svar(t0)) * 1e6 + 0.5).toLong))
        }
    }
    val nn = strata.map(_._2).sum
    val pooled = ("_all", nn, -1L, -1L,
      strata.map(s => math.floor(s._2.toDouble * s._5.toDouble /
        nn.toDouble + 0.5).toLong).sum,
      strata.map(s => math.floor(s._2.toDouble * s._2.toDouble /
        (nn.toDouble * nn.toDouble) * s._6.toDouble + 0.5).toLong).sum)
    val want = (strata :+ pooled).sortBy(_._1)
    val got = graft.queries.EventAnalytics.q361PostStratAte(spark, sfDir)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
  }

  test("q362 equals a driver-side quantile-normalization recompute") {
    import graft.queries.MaintOps.QN_BINS
    val docs = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def bins(xs: Seq[(Long, Long)], n: Long): Seq[(Long, Long, Long)] = {
      // xs = (value, cnt) sorted by value -> (value, cnt, bin)
      var cb = 0L
      xs.map { case (v, c) =>
        val b = math.min(QN_BINS - 1, (QN_BINS * (2 * cb + c)) / (2 * n))
        cb += c
        (v, c, b)
      }
    }
    val pooledRoll = docs.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (v, xs) => (v, xs.length.toLong) }
    val pooledBins = bins(pooledRoll, docs.length.toLong)
    val targets = pooledBins.groupBy(_._3).map { case (b, xs) =>
      b -> math.floor(xs.map(t => t._1 * t._2).sum.toDouble /
        xs.map(_._2).sum.toDouble * 1e6 + 0.5).toLong
    }
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      val roll = xs.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (v, ys) => (v, ys.length.toLong) }
      bins(roll, xs.length.toLong).groupBy(_._3).toSeq
        .map { case (b, ys) =>
          (src, b, ys.map(_._2).sum, targets(b))
        }
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.MaintOps.q362QuantileNormalize(spark, sfDir)
      .orderBy("source", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === want)
    // each source's docs are fully covered by its bins
    val bySrc = got.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val sizes = docs.groupBy(_._1).view.mapValues(_.length.toLong)
    bySrc.foreach { case (s, n) => assert(n === sizes(s)) }
  }
}
