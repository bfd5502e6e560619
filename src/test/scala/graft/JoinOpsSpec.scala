package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {

  test("as-of join picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq(("u1", 5L, "a"), ("u1", 10L, "b"), ("u1", 2L, "c"),
      ("u2", 7L, "d")).toDF("k", "t", "tag")
    val right = Seq(("u1", 3L, 30.0), ("u1", 10L, 100.0), ("u2", 9L, 90.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.latestBefore(left, right,
      key = Seq("k"), lTime = "t", rTime = "t", rValues = Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("v")))).toMap
    assert(out("a") == Some(30.0))    // 3 <= 5
    assert(out("b") == Some(100.0))   // right AT the left time matches (<=)
    assert(out("c") == None)          // nothing at or before 2
    assert(out("d") == None)          // u2's only row is after 7
  }

  test("range join equals the brute-force inequality join") {
    import spark.implicits._
    val points = (1 to 200).map(i => (i.toLong, i * 7.3)).toDF("pid", "p")
    val intervals = (1 to 30).map(i => (i.toLong, i * 40.0, i * 40.0 + 95.0))
      .toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 50.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == brute && brute.nonEmpty)
  }

  test("q44/q45 plans: no inequality nested loop, single-shuffle as-of") {
    val p44 = graft.queries.JoinOps.q44AsofEnrich(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p44.contains("CartesianProduct") && !p44.contains("BroadcastNestedLoopJoin"),
      "as-of join must not plan an inequality join")
    val p45 = graft.queries.JoinOps.q45RangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p45.contains("CartesianProduct") && !p45.contains("BroadcastNestedLoopJoin"),
      "range join must be grid-cell equi-ized, not a nested loop")
  }

  test("q100 radius neighbors equals the brute-force distance join") {
    import graft.queries.JoinOps
    val got = JoinOps.q100RadiusNeighbors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val pts = Tables(spark, sfDir).lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") / 1000.0).as("x"),
      (col("l_discount") * 100.0).as("y"),
      (col("l_tax") * 100.0).as("z")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic
    // lineitem, so mirror the query's semantics: duplicate-key query
    // rows merge into one output key, and self-exclusion drops every
    // corpus row sharing the key
    val queries = pts.filter(_._1 <= JoinOps.KNN_MAX_QUERY_ORDERKEY)
    val expected = queries.groupBy(q => (q._1, q._2)).flatMap { case (k, qs) =>
      val ds = qs.flatMap(q =>
        pts.filter(p => !(p._1 == q._1 && p._2 == q._2))
          .map(p => math.sqrt((p._3 - q._3) * (p._3 - q._3)
            + (p._4 - q._4) * (p._4 - q._4) + (p._5 - q._5) * (p._5 - q._5)))
          .filter(_ <= JoinOps.KNN_RADIUS))
      if (ds.isEmpty) None
      else Some(k ->
        (ds.length.toLong,
          ds.map(d => math.floor(d * 1e6 + 0.5).toLong).sum.toDouble / 1e6 / ds.length))
    }
    assert(got.keySet == expected.keySet && got.nonEmpty)
    expected.foreach { case (k, (n, md)) =>
      assert(got(k)._1 == n, s"$k count")
      assert(math.abs(got(k)._2 - md) < 1e-12, s"$k mean dist")
    }
  }

  test("q100 plan: grid equi-join, no nested loop over the corpus") {
    val p = graft.queries.JoinOps.q100RadiusNeighbors(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "radius join must be grid-cell equi-ized")
  }
}
