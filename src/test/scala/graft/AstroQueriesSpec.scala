package graft

import graft.queries.AstroQueries
import graft.functions.Astro
import org.apache.spark.sql.functions._

class AstroQueriesSpec extends SparkSpec {

  test("every astro query has an oracle and runs non-empty") {
    AstroQueries.queries.foreach { case (name, fn) =>
      assert(AstroQueries.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q11 quantiles are ordered min <= q1 <= median <= q3 <= max") {
    AstroQueries.q11DescriptiveStats(spark, sfDir).collect().foreach { r =>
      val vals = Seq("min", "q1", "median", "q3", "max").map(r.getAs[Double])
      assert(vals == vals.sorted, s"unordered quantiles: $vals")
    }
  }

  test("q12 half-mass radius sits between group min and max radius") {
    val t = Tables(spark, sfDir).lineitem
      .groupBy("l_returnflag")
      .agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
    val joined = AstroQueries.q12HalfMassRadius(spark, sfDir)
      .join(t, "l_returnflag")
      .filter(col("r_half_mass") < col("lo") || col("r_half_mass") > col("hi"))
    assert(joined.count() == 0)
  }

  test("q12 half-mass: at least half the mass is within r_half_mass") {
    val rh = AstroQueries.q12HalfMassRadius(spark, sfDir)
    val li = Tables(spark, sfDir).lineitem.join(rh, "l_returnflag")
    val frac = li.groupBy("l_returnflag")
      .agg((sum(when(col("l_extendedprice") <= col("r_half_mass"), col("l_quantity"))
        .otherwise(0.0)) / sum(col("l_quantity"))).as("f"))
    assert(frac.filter(col("f") < 0.5).count() == 0)
  }

  test("q13 ring counts sum to table count") {
    val total = AstroQueries.q13AnnularHist(spark, sfDir)
      .agg(sum("n_stars")).collect().head.getLong(0)
    assert(total == Tables(spark, sfDir).lineitem.count())
  }

  test("q14 photocentric position lies between the two components") {
    val li = Tables(spark, sfDir).lineitem.filter(col("l_linenumber") <= 2)
      .groupBy("l_orderkey")
      .agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"),
        count(lit(1)).as("n"))
      .filter(col("n") === 2)
    val bad = AstroQueries.q14Photocentric(spark, sfDir)
      .join(li, "l_orderkey")
      .filter(col("photo_x") < col("lo") - 1e-6 || col("photo_x") > col("hi") + 1e-6)
    assert(bad.count() == 0)
  }

  test("logAdd10 matches direct computation in safe range") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (3.0, 3.0), (-2.0, 4.0), (0.0, 0.0)).toDF("a", "b")
      .select(col("a"), col("b"), Astro.logAdd10(col("a"), col("b")).as("lse"))
    df.collect().foreach { r =>
      val expect = math.log10(math.pow(10, r.getDouble(0)) + math.pow(10, r.getDouble(1)))
      assert(math.abs(r.getDouble(2) - expect) < 1e-12)
    }
  }

  test("kepler semi-major axis: earth-sun sanity (1 Msol, 1 yr -> ~1 AU)") {
    import spark.implicits._
    val semi = Seq((1.0, 0.0, 365.25)).toDF("m1", "m2", "p")
      .select(Astro.keplerSemiMajorAxisAu(col("m1"), col("m2"), col("p")).as("a"))
      .collect().head.getDouble(0)
    assert(math.abs(semi - 1.0) < 1e-3, s"got $semi AU")
  }

  test("q19 inclination is in [0, pi]") {
    val bad = AstroQueries.q19Inclination(spark, sfDir)
      .filter(col("incl_rad") < 0.0 || col("incl_rad") > math.Pi)
    assert(bad.count() == 0)
  }

  test("q20 scaled distance consistent with flags") {
    val bad = AstroQueries.q20DensityCenterDist(spark, sfDir)
      .filter((col("in_r_tidal") && col("dist_dc_scaled") > 1.0) ||
        (!col("in_r_tidal") && col("dist_dc_scaled") <= 1.0))
    assert(bad.count() == 0)
  }

  test("effective temperature of the sun is T_SUN") {
    import spark.implicits._
    val t = Seq((1.0, 1.0)).toDF("l", "r")
      .select(Astro.effectiveTemperatureK(col("l"), col("r")).as("t"))
      .collect().head.getDouble(0)
    assert(math.abs(t - Astro.T_SUN_K) < 1e-9)
  }

  test("q95 dispersion profile: sigma matches a driver-side two-pass recount") {
    val byRing = Tables(spark, sfDir).lineitem
      .select((ceil(col("l_extendedprice") / 1000.0)).cast("long").as("ring"),
        (col("l_tax") * 100.0 - col("l_discount") * 50.0).as("vr"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = AstroQueries.q95VelocityDispersion(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == byRing.filter(_._2.length >= 2).keySet)
    got.foreach { case (ring, (n, mean, sigma)) =>
      val vs = byRing(ring)
      assert(n == vs.length)
      val m = vs.sum / vs.length
      val s = math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (vs.length - 1))
      assert(math.abs(mean - m) < 1e-9 * math.max(1.0, math.abs(m)),
        s"ring $ring mean")
      if (s.isNaN) assert(sigma.isNaN, s"ring $ring sigma NaN parity")
      else assert(math.abs(sigma - s) < 1e-6 * math.max(1.0, s),
        s"ring $ring sigma")
    }
  }

  test("q96 Lagrangian radii are monotone and r50 equals the half-mass radius") {
    val lag = AstroQueries.q96LagrangianRadii(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(lag.nonEmpty)
    lag.values.foreach { case (r10, r25, r50, r75, r90) =>
      assert(r10 <= r25 && r25 <= r50 && r50 <= r75 && r75 <= r90,
        "Lagrangian radii must be monotone in the mass fraction")
    }
    val half = AstroQueries.q12HalfMassRadius(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    lag.foreach { case (flag, (_, _, r50, _, _)) =>
      assert(r50 == half(flag), s"flag $flag: r50 != q12 half-mass radius")
    }
  }

  test("q97 mass-function slope matches a driver-side histogram fit") {
    val masses = Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = masses.groupBy(_._1).map { case (flag, ms) =>
      val hist = ms.groupBy(m => math.floor(math.log10(m._2) * 10.0).toLong)
        .view.mapValues(_.length).toMap
      val pts = hist.toSeq.map { case (b, c) =>
        (b, math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong) }
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      flag -> ((n * sxy - sx * sy).toDouble / ((n * sxx - sx * sx) * 100000.0))
    }
    val got = AstroQueries.q97MassFunctionSlope(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    expected.foreach { case (flag, slope) =>
      assert(math.abs(got(flag) - slope) < 1e-12, s"flag $flag slope")
    }
  }
}
