package graft

import graft.queries.PatternOps
import org.apache.spark.sql.functions._

class PatternOpsSpec extends SparkSpec {

  test("every pattern query has an oracle and runs non-empty") {
    PatternOps.queries.foreach { case (name, fn) =>
      assert(PatternOps.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q175 equals a driver-side subsequence scan") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val types = ev.map(_._2).distinct.sorted
    val byUser = ev.groupBy(_._1)
    val want = (for { a <- types; b <- types } yield {
      val n = byUser.values.count { evs =>
        val as = evs.filter(_._2 == a).map(e => (e._3, e._4))
        val bs = evs.filter(_._2 == b).map(e => (e._3, e._4))
        as.nonEmpty && bs.nonEmpty &&
          implicitly[Ordering[(Long, Long)]].lt(as.min, bs.max)
      }
      (a, b) -> n.toLong
    }).toMap
    val got = PatternOps.q175SeqPattern(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("q175 plan is one aggregate over users, no self-join") {
    val plan = PatternOps.q175SeqPattern(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }

  test("q176 MAD is robust: outlier rule matches a driver-side recompute") {
    val ev = Tables(spark, sfDir).events
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def medianOf(v: Array[Double]): Double = {
      val s = v.sorted; val n = s.length
      val pos = (n - 1) * 0.5
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      s(lo) + (s(hi) - s(lo)) * (pos - lo)
    }
    val want = ev.groupBy(_._1).map { case (t, rs) =>
      val vs = rs.map(_._2)
      val med = medianOf(vs)
      val adev = vs.map(v => math.abs(v - med))
      val mad = medianOf(adev)
      t -> ((adev.count(_ > mad * 3).toLong, med, mad))
    }
    PatternOps.q176MadOutliers(spark, sfDir).collect().foreach { r =>
      val (nOut, med, mad) = want(r.getString(0))
      assert(r.getAs[Long]("n_outliers") === nOut)
      assert(r.getAs[Double]("med") === med)
      assert(r.getAs[Double]("mad") === mad)
    }
  }

  test("q177 observed digit counts cover all orders; expected sums to n") {
    val rows = PatternOps.q177Benford(spark, sfDir).collect()
    val n = Tables(spark, sfDir).orders.count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum === n)
    val expSum = rows.map(_.getAs[Double]("expected")).sum
    // digits 1..9 only; Benford expectations must total n (within fp)
    assert(rows.forall(r => (1 to 9).contains(r.getAs[Int]("digit"))))
    assert(math.abs(expSum - n) < 1e-6 * n)
  }

  test("q178 inverted index round-trips token positions") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val idx = PatternOps.q178InvertedIndex(spark, sfDir).collect()
    // spot-check: every posting's positions point at the token
    idx.take(200).foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty)
      val ps = r.getAs[String]("positions").split(",").map(_.toInt)
      assert(ps.length === r.getAs[Long]("tf"))
      ps.foreach(p => assert(toks(p - 1) === r.getAs[String]("token")))
    }
    // df is consistent: count of docs per token
    val byToken = idx.groupBy(_.getAs[String]("token"))
    byToken.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("df")).distinct.length === 1)
      assert(rs.head.getAs[Long]("df") === rs.length.toLong)
    }
  }
}
