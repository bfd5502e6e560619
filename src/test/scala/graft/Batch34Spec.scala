package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-34 spec: Neyman allocation (q354) and the
  * nearest-centroid classifier eval (q355), each re-derived on the
  * driver from first principles.
  */
class Batch34Spec extends SparkSpec {

  test("q354 equals a driver-side Neyman recompute; Neyman beats proportional on paper") {
    import graft.queries.TrainPrep.NEYMAN_TOTAL
    val docs = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = docs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, xs) =>
        val n = xs.length.toLong
        val sx = xs.map(_._2).sum
        val sxx = xs.map(t => t._2 * t._2).sum
        (src, n, sx, sxx)
      }.filter(_._2 > 1)
    val w = strata.map { case (src, n, sx, sxx) =>
      val nd = n.toDouble
      val sigma = math.sqrt((nd * sxx.toDouble - sx.toDouble * sx.toDouble) /
        (nd * (nd - 1.0)))
      (src, n, math.floor(nd * sigma * 1e6 + 0.5).toLong)
    }
    val ww = w.map(_._3).sum
    val nn = w.map(_._2).sum
    val want = w.map { case (src, n, wm) =>
      (src, n, wm,
        math.floor(NEYMAN_TOTAL.toDouble * wm.toDouble / ww.toDouble + 0.5)
          .toLong,
        math.floor(NEYMAN_TOTAL.toDouble * n.toDouble / nn.toDouble + 0.5)
          .toLong)
    }
    val got = graft.queries.TrainPrep.q354NeymanAllocation(spark, sfDir)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === want)
    // the allocations are budgets: each within rounding of the total
    assert(math.abs(got.map(_._4).sum - NEYMAN_TOTAL) <= got.size / 2)
    assert(math.abs(got.map(_._5).sum - NEYMAN_TOTAL) <= got.size / 2)
  }

  test("q355 equals a driver-side nearest-centroid recompute") {
    val embs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(f =>
          math.floor(f.toDouble * 1e6 + 0.5).toLong),
        r.getInt(2)))
    val dims = embs.head._2.length
    val centroids = embs.groupBy(_._3).map { case (lab, xs) =>
      lab -> Array.tabulate(dims) { d =>
        val s = xs.map(_._2(d)).sum
        s.toDouble / xs.length.toDouble
      }
    }
    val labels = centroids.keys.toSeq.sorted
    val assigned = embs.map { case (_, v, lab) =>
      val best = labels.map { cl =>
        val c = centroids(cl)
        val d2 = (0 until dims).map { d =>
          val dev = v(d).toDouble - c(d)
          math.floor(dev * dev + 0.5).toLong
        }.sum
        (d2, cl)
      }.min
      (lab, best._2)
    }
    val want = assigned.groupBy(identity).toSeq
      .map { case ((lab, cl), xs) => (lab, cl, xs.length.toLong) }
      .sortBy(t => (t._1, t._2))
    val got = graft.queries.VectorOps.q355CentroidEval(spark, sfDir)
      .orderBy("label", "assigned").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === want)
    // sanity: the matrix covers every vector exactly once
    assert(got.map(_._3).sum === embs.length.toLong)
  }
}
