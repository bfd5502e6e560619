package graft

import graft.queries.LayoutOps
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {

  test("every layout query has an oracle and runs non-empty") {
    LayoutOps.queries.foreach { case (name, fn) =>
      assert(LayoutOps.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q165 quantiles equal the naive per-group sort interpolation") {
    val t = Tables(spark, sfDir)
    val byFlag = t.lineitem.select("l_returnflag", "l_extendedprice")
      .collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }
    def qcont(v: Array[Double], q: Double): Double = {
      val pos = (v.length - 1) * q
      val lo = math.floor(pos); val hi = math.ceil(pos)
      // symmetric weighted form — what DuckDB quantile_cont, Spark's
      // built-in percentile, and the operator all evaluate
      if (lo == hi) v(lo.toInt)
      else (hi - pos) * v(lo.toInt) + (pos - lo) * v(hi.toInt)
    }
    LayoutOps.q165GroupQuantiles(spark, sfDir).collect().foreach { r =>
      val v = byFlag(r.getString(0))
      assert(r.getAs[Double]("p25") === qcont(v, 0.25))
      assert(r.getAs[Double]("p50") === qcont(v, 0.50))
      assert(r.getAs[Double]("p75") === qcont(v, 0.75))
    }
  }

  test("q166 morton keys are within 32-bit range and brand counts cover part") {
    val res = LayoutOps.q166ZorderProfile(spark, sfDir).collect()
    val total = res.map(_.getAs[Long]("n")).sum
    assert(total === Tables(spark, sfDir).part.count())
    res.foreach { r =>
      assert(r.getAs[Long]("z_min") >= 0L)
      assert(r.getAs[Long]("z_max") < (1L << 32))
    }
  }

  test("q229 recommendations are the argmin of the three size models") {
    val rows = LayoutOps.q229EncodingAdvisor(spark, sfDir).collect()
    assert(rows.length === LayoutOps.ENC_COLS.size)
    val n = Tables(spark, sfDir).lineitem.count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      val (p, d, rl) = (r.getAs[Long]("plain_bits"),
        r.getAs[Long]("dict_bits"), r.getAs[Long]("rle_bits"))
      val want =
        if (rl <= d && rl <= p) "RLE" else if (d <= p) "DICT" else "PLAIN"
      assert(r.getAs[String]("recommended") === want, r.getString(0))
      assert(r.getAs[Long]("ndv") >= 1L &&
        r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows"))
    }
    // the flags dictionary-encode; near-unique cents must not
    val byCol = rows.map(r => r.getString(0) ->
      r.getAs[String]("recommended")).toMap
    assert(byCol("l_returnflag") === "DICT")
    assert(byCol("price_cents") === "PLAIN")
  }

  test("q204 run profile matches a driver-side segment fold") {
    val rows = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    def profile(pick: ((Long, Int, String, String)) => String): (Long, Long, Long) = {
      val runLens = rows.groupBy(_._1).values.flatMap { seg =>
        val vals = seg.map(t => (t._2, pick(t))).sorted.map(_._2)
        vals.foldLeft(List.empty[(String, Long)]) {
          case ((v, n) :: rest, x) if v == x => (v, n + 1) :: rest
          case (acc, x) => (x, 1L) :: acc
        }.map(_._2)
      }.toSeq
      (runLens.sum, runLens.length.toLong, runLens.max)
    }
    val got = LayoutOps.q204RunProfile(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("max_run"))).toMap
    assert(got("l_returnflag") === profile(_._3))
    assert(got("l_linestatus") === profile(_._4))
  }
}
