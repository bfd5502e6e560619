package graft

import graft.queries.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  test("q249 removes frequent segments EVERYWHERE, keeps rare ones") {
    // driver-side replay of the policy over the real table
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val segsOf = docs.map { case (id, t) =>
      id -> t.split(" ", -1).grouped(CorpusOps.BOILER_SEG_TOKENS)
        .map(_.mkString(" ")).toArray
    }.toMap
    val freq = segsOf.values.flatten
      .groupBy(identity).view.mapValues(_ => 0).toMap.keySet
      .map(s => s -> segsOf.count(_._2.contains(s))).toMap
    val got = CorpusOps.q249BoilerplateStrip(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, _) =>
      val segs = segsOf(id)
      val boiler = segs.count(s => freq(s) >= CorpusOps.BOILER_K)
      assert(got(id).getAs[Long]("n_segs") === segs.length.toLong, s"doc $id")
      assert(got(id).getAs[Long]("n_boiler") === boiler.toLong, s"doc $id")
      val keptChars = segs.filter(s => freq(s) < CorpusOps.BOILER_K)
        .map(_.length.toLong).sum
      assert(got(id).getAs[Long]("chars_kept") === keptChars, s"doc $id")
    }
    // the policy differs from q80: at least one first occurrence of a
    // boilerplate segment is dropped here
    assert(got.values.map(_.getAs[Long]("n_boiler")).sum > 0L)
  }

  test("q250 pattern counts partition the blocked candidate pairs") {
    val perCust = Tables(spark, sfDir).orders
      .groupBy("o_custkey").count().collect().map(_.getLong(1))
    val wantPairs = perCust.map(n => n * (n - 1) / 2).sum
    val rows = CorpusOps.q250LinkagePatterns(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === wantPairs)
    // patterns are distinct agreement vectors
    val pats = rows.map(r => (r.getBoolean(0), r.getBoolean(1),
      r.getBoolean(2), r.getBoolean(3)))
    assert(pats.distinct.length === pats.length)
  }

  test("q251 sketch estimates sit within the additive rank-error bound") {
    val rows = CorpusOps.q251SketchQuantileEval(spark, sfDir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("weight_exact"), s"${r.getString(0)} weight")
      assert(r.getAs[Boolean]("ok_p50"), s"${r.getString(0)} p50 bound")
      assert(r.getAs[Boolean]("ok_p90"), s"${r.getString(0)} p90 bound")
    }
    // exact p50 matches the built-in percentile (oracle parity)
    val want = Tables(spark, sfDir).lineitem
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getAs[Double]("p50") === want(r.getString(0))))
  }
}
