package graft

import org.apache.spark.sql.functions._

/** Round-6 batch-15 specs: TPC-H Q4 priority checking, common-neighbor
  * link prediction, trailing-window exact median (q274-q276), each
  * against an independent driver-side re-derivation on sf0.001.
  */
class Batch15Spec extends SparkSpec {

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

  test("q274 equals a driver-side EXISTS(late line) count per priority") {
    val got = graft.queries.TpchShapes.q274PriorityChecking(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val lateDays = graft.queries.TpchShapes.LATE_DAYS
    val orders = Tables(spark, sfDir).orders
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-04-01"))
      .select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val ship = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
    val dayMs = 86400000L
    val want = orders
      .filter { case (k, _, od) =>
        ship.get(k).exists(_ > od + lateDays * dayMs) }
      .groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    assert(got === want)
    assert(got.values.sum > 0)
  }

  test("q275 equals driver-side common-neighbor Jaccard on non-edges") {
    import graft.queries.GraphOps
    val got = GraphOps.q275LinkPredict(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val adj = adjacency()
    val nodes = adj.keys.toArray.sorted
    val want = (for {
      i <- nodes.indices.iterator
      j <- (i + 1 until nodes.length).iterator
      x = nodes(i); y = nodes(j)
      if !adj(x).contains(y)
      common = (adj(x) & adj(y)).size.toLong
      if common >= GraphOps.LINK_MIN_COMMON
    } yield (x, y) -> ((common,
      adj(x).size.toLong + adj(y).size.toLong - common))).toMap
    assert(got === want)
  }

  test("q276 trailing median equals a scala sliding-window median") {
    val got = graft.queries.TemporalOps.q276TrailingMedian(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
    val daily = Tables(spark, sfDir).orders
      .select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getTimestamp(0).getTime / 86400000L,
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      .toArray.sortBy(_._1)
    assert(got.length === daily.length)
    got.zipWithIndex.foreach { case ((day, (rev, med, n)), i) =>
      assert(day === daily(i)._1)
      assert(rev === daily(i)._2)
      val window = daily.slice(math.max(0, i - 6), i + 1).map(_._2)
      assert(n === window.length.toLong)
      val sorted = window.sorted
      assert(med === sorted((window.length + 1) / 2 - 1), s"day $day")
    }
  }
}
