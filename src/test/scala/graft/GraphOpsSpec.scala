package graft

import graft.queries.GraphOps
import org.apache.spark.sql.functions._

/** q117 degree-oriented triangle counting vs a driver-side brute-force
  * recount over the same (support-thinned) edge set.
  */
class GraphOpsSpec extends SparkSpec {

  private def edgeSet(): Set[(Long, Long)] = {
    val li = Tables(spark, sfDir).lineitem.select("l_orderkey", "l_partkey")
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= GraphOps.TRIANGLE_MIN_SUPPORT)
      .select("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("q117 per-node triangle counts match a brute-force recount") {
    val edges = edgeSet()
    val adj: Map[Long, Set[Long]] = (edges.toSeq.flatMap { case (u, v) =>
      Seq((u, v), (v, u))
    }).groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (u, v) <- edges
      w <- adj(u).intersect(adj(v)) if u < w && v < w
    } {
      counts(u) += 1; counts(v) += 1; counts(w) += 1
    }
    val expected = counts.toMap.filter(_._2 > 0)
    val got = GraphOps.q117TriangleCount(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("q117 counts every triangle exactly once (corner sum divisible by 3)") {
    val total = GraphOps.q117TriangleCount(spark, sfDir)
      .agg(sum("n_triangles")).collect()(0).getLong(0)
    assert(total % 3 == 0, s"corner sum $total not divisible by 3")
  }

  test("q117 plan has no cartesian product") {
    val p = GraphOps.q117TriangleCount(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("q223 equals the driver-side peel fixpoint and satisfies min-degree") {
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length; if ps(i) < ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= GraphOps.TRIANGLE_MIN_SUPPORT)
      .keys.toSet
    var done = false
    while (!done) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= GraphOps.KCORE_K).keySet
      val pruned = edges.filter(e => keep(e._1) && keep(e._2))
      done = pruned == edges
      edges = pruned
    }
    val want = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = GraphOps.q223KCore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    got.values.foreach(d => assert(d >= GraphOps.KCORE_K.toLong))
  }

  test("q206 degree profile matches a driver-side graph fold") {
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length; if ps(i) < ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= GraphOps.TRIANGLE_MIN_SUPPORT)
      .keys.toSeq
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def bucket(d: Long): Long = math.floor(math.log(d.toDouble) / math.log(2.0)).toLong
    val wantNodes = deg.values.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val endpoints = edges.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val wantAvg = endpoints.groupBy(t => bucket(t._1)).map { case (b, xs) =>
      b -> (xs.size.toLong,
        math.floor(xs.map(_._2).sum * 1e6 / xs.size + 0.5).toLong)
    }
    val got = GraphOps.q206DegreeProfile(spark, sfDir).collect()
      .map(r => r.getAs[Long]("deg_bucket") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_endpoints"),
          r.getAs[Long]("avg_nbr_deg_micro"))).toMap
    assert(got.keySet === wantNodes.keySet)
    got.foreach { case (b, (nn, ne, avg)) =>
      assert(nn === wantNodes(b), s"bucket $b n_nodes")
      assert((ne, avg) === wantAvg(b), s"bucket $b endpoint stats")
    }
  }
}
