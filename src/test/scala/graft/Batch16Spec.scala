package graft

import org.apache.spark.sql.functions._

/** Round-6 batch-16 specs: k-anonymity audit, power-iteration step,
  * label-propagation communities, robust feature scaling (q279-q282),
  * each against an independent driver-side re-derivation on sf0.001.
  */
class Batch16Spec extends SparkSpec {

  /** Co-purchase adjacency rebuilt independently of GraphOps (same
    * pair-instance support semantics as the q117 self-join).
    */
  private def adjacency(): Map[Long, Set[Long]] = {
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairSup = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    li.groupBy(_._1).values.foreach { rows =>
      val cnt = rows.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
      val keys = cnt.keys.toArray.sorted
      for (i <- keys.indices; j <- i + 1 until keys.length)
        pairSup((keys(i), keys(j))) += cnt(keys(i)) * cnt(keys(j))
    }
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    pairSup.foreach { case ((u, v), sup) =>
      if (sup >= graft.queries.GraphOps.TRIANGLE_MIN_SUPPORT) {
        adj(u) += v; adj(v) += u
      }
    }
    adj.toMap.withDefaultValue(Set.empty)
  }

  test("q279 equals a driver-side QI-cell audit") {
    import graft.queries.StatsOps
    val got = graft.queries.StatsOps.q279KAnonymity(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val cust = Tables(spark, sfDir).customer
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1),
        math.floor(r.getDouble(2) / StatsOps.ANON_BAND).toLong))
    val cells = cust.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val want = cells.groupBy(_._1._1).map { case (nation, cs) =>
      val sizes = cs.values.toSeq
      val small = sizes.filter(_ < StatsOps.K_ANON)
      nation -> ((sizes.sum, sizes.size.toLong, sizes.min,
        small.sum, small.size.toLong))
    }
    assert(got === want)
    // the band width must actually produce at-risk cells to audit
    assert(got.values.map(_._4).sum > 0)
  }

  test("q280 equals a driver-side integer-quantized A^T(A*1) step") {
    import graft.queries.VectorOps
    val got = VectorOps.q280PowerIteration(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val embs = Tables(spark, sfDir).embeddings
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    def q(x: Float): Long =
      math.floor(x.toDouble * VectorOps.POWER_SCALE).toLong
    val dim = embs.head.length
    val want = (0 until dim).map { j =>
      val v1 = embs.map(e => e.map(q).sum * q(e(j))).sum
      j.toLong -> ((v1, embs.length.toLong))
    }.toMap
    assert(got === want)
    assert(got.values.exists(_._1 != 0L))
  }

  test("q281 equals a driver-side synchronous min-tie-break LPA") {
    import graft.queries.GraphOps
    val got = GraphOps.q281LabelProp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = adjacency()
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to GraphOps.LPA_ROUNDS).foreach { _ =>
      labels = adj.map { case (n, nbrs) =>
        val freq = nbrs.toSeq.map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        // most frequent neighbor label, smallest label on ties
        n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got === labels)
    // LPA must have actually merged nodes into shared communities
    assert(got.values.toSet.size < got.size)
  }

  test("q282 equals a driver-side sorted-array robust scaler") {
    import graft.queries.TrainPrep
    val got = TrainPrep.q282RobustScale(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val ev = Tables(spark, sfDir).events
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def quantile(sorted: Array[Double], q: Double): Double = {
      val pos = (sorted.length - 1) * q
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo)
      else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
    }
    val byType = ev.groupBy(_._2).map { case (t, xs) =>
      val sorted = xs.map(_._3).sorted
      t -> ((quantile(sorted, 0.25), quantile(sorted, 0.5),
        quantile(sorted, 0.75)))
    }
    val want = ev.map { case (id, t, v) =>
      val (p25, p50, p75) = byType(t)
      id -> (if (p75 == p25) None else Some((v - p50) / (p75 - p25)))
    }.toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}
