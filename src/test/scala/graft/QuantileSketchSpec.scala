package graft

import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.Sketch
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {

  private def exactRank(xs: Seq[Double], v: Double): Long =
    xs.count(_ <= v).toLong

  /** Cumulative worst-case rank drift: each compaction at level l
    * shifts any rank by at most 2^l (one promoted item's weight); a
    * level of capacity k compacts at most n/(k·2^l) times, so the
    * total is <= |levels| · n/k + |levels| — deterministic compaction
    * drifts ADD across levels (the randomized textbook compactor
    * cancels them to O(n/k); the round-8 sf0.1 gate caught an earlier
    * 3n/k claim here missing the |levels| factor at n≈200k).
    */
  private def bound(s: Sketch): Long =
    QuantileSketch.rankErrorBound(s)

  test("sketch preserves total weight exactly and bounds rank error") {
    val xs = (1 to 50000).map(i => ((i * 2654435761L) % 100000).toDouble)
    val s = xs.foldLeft(QuantileSketch.empty(QuantileSketch.DEFAULT_K))(_.insert(_))
    assert(s.n === xs.length.toLong)
    assert(s.retainedWeight === s.n, "compaction must conserve weight")
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = s.quantile(q)
      val estRank = exactRank(sorted, est)
      val target = math.ceil(q * xs.length).toLong
      assert(math.abs(estRank - target) <= bound(s),
        s"q=$q est=$est rank=$estRank target=$target bound=${bound(s)}")
    }
  }

  test("merge is weight-exact and stays within the additive error bound") {
    val a = (1 to 20000).map(i => ((i * 48271L) % 65536).toDouble)
    val b = (1 to 30000).map(i => ((i * 69621L) % 65536).toDouble)
    val sa = a.foldLeft(QuantileSketch.empty())(_.insert(_))
    val sb = b.foldLeft(QuantileSketch.empty())(_.insert(_))
    val m = sa.merge(sb)
    assert(m.n === (a.length + b.length).toLong)
    assert(m.retainedWeight === m.n)
    val all = (a ++ b).sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val estRank = exactRank(all, m.quantile(q))
      val target = math.ceil(q * all.length).toLong
      assert(math.abs(estRank - target) <= bound(m),
        s"merged q=$q rank=$estRank target=$target")
    }
  }

  test("memory stays bounded: retained items ~ k·log(n/k), not n") {
    val s = (1 to 100000).map(_.toDouble)
      .foldLeft(QuantileSketch.empty(100))(_.insert(_))
    val retained = s.levels.map(_.length).sum
    assert(retained <= 100 * (s.levels.length + 1),
      s"retained $retained items across ${s.levels.length} levels")
    assert(s.levels.length <= 16, "levels grow logarithmically")
  }

  test("quantile_sketch is registered for SQL use") {
    Tables(spark, sfDir).lineitem.createOrReplaceTempView("li_qs")
    val row = spark.sql(
      "SELECT quantile_sketch(l_extendedprice) AS sk FROM li_qs")
      .head.getAs[org.apache.spark.sql.Row]("sk")
    assert(row.getAs[Long]("n") === Tables(spark, sfDir).lineitem.count())
  }

  test("Spark aggregate sketches per group within the bound") {
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"))
    val sketches = li.groupBy("l_returnflag")
      .agg(QuantileSketch.sketch(col("l_extendedprice")).as("sk"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[org.apache.spark.sql.Row]("sk"))
    val exact = li.collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sketches.nonEmpty)
    sketches.foreach { case (flag, row) =>
      val sk = Sketch(row.getAs[Int]("k"), row.getAs[Long]("n"),
        row.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("levels")
          .map(_.toSeq).toSeq)
      val xs = exact(flag)
      assert(sk.n === xs.length.toLong, s"$flag row count")
      assert(sk.retainedWeight === sk.n, s"$flag weight conservation")
      for (q <- Seq(0.5, 0.95)) {
        val estRank = exactRank(xs, sk.quantile(q))
        val target = math.ceil(q * xs.length).toLong
        assert(math.abs(estRank - target) <= bound(sk),
          s"$flag q=$q rank=$estRank target=$target")
      }
    }
  }
}
