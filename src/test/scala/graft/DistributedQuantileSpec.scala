package graft

import graft.operators.DistributedQuantile
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bucket-prune order statistics must equal the naive one-sort
  * formulation exactly — same ranks, same interpolation arithmetic —
  * on skewed, duplicate-heavy, and degenerate inputs.
  */
class DistributedQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def naiveQuantile(
      rows: Seq[(String, Double)], q: Double): Map[String, Double] =
    rows.groupBy(_._1).map { case (g, vs) =>
      val s = vs.map(_._2).sorted
      val pos = (s.size - 1) * q
      val loR = math.floor(pos); val hiR = math.ceil(pos)
      val lo = s(loR.toInt); val hi = s(hiR.toInt)
      // symmetric weighted form — what DuckDB quantile_cont and
      // Spark's built-in percentile both evaluate
      g -> (if (loR == hiR) lo else (hiR - pos) * lo + (pos - loR) * hi)
    }

  test("quantiles match the naive sort on skewed data, few buckets") {
    val rng = new scala.util.Random(7)
    // heavy skew: one group with exponential-ish tail, one tiny group,
    // one group of all-equal values
    val rows =
      (1 to 5000).map(i => ("big", math.exp(rng.nextDouble() * 8))) ++
        (1 to 3).map(i => ("tiny", i.toDouble)) ++
        (1 to 100).map(_ => ("const", 42.0))
    val df = rows.toDF("g", "v")
    // numBuckets=4 forces multi-row buckets -> exercises local ranks
    val got = DistributedQuantile
      .quantiles(df, Seq("g"), "v", Seq("q1" -> 0.25, "med" -> 0.5, "q3" -> 0.75), 4)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    for ((qn, q) <- Seq(("q1", 0.25), ("med", 0.5), ("q3", 0.75))) {
      val want = naiveQuantile(rows, q)
      for ((g, _) <- want) {
        val gotV = qn match {
          case "q1" => got(g)._1; case "med" => got(g)._2; case _ => got(g)._3
        }
        assert(gotV === want(g), s"group $g quantile $qn")
      }
    }
  }

  test("interpolation is bit-identical to Spark's built-in percentile " +
      "at large magnitudes (the q188 repr-hash class)") {
    // ~1e11-scale values with fractional interpolation positions:
    // lo + (hi-lo)*frac differs from the symmetric form by 1-2 ulps
    // here, which flips a repr hash. Assert EXACT bit equality.
    val rng = new scala.util.Random(188)
    val rows = (1 to 997).map { _ =>
      ("g" + rng.nextInt(3), 2.5e10 + rng.nextDouble() * 6.9e10)
    } :+ (("g3", 88135969469.000031))
    val df = rows.toDF("g", "v")
    val got = DistributedQuantile
      .quantiles(df, Seq("g"), "v", Seq("p50" -> 0.5, "p90" -> 0.9), 16)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = df.groupBy("g")
      .agg(percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.9)).as("p90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((g, (p50, p90)) <- want) {
      assert(java.lang.Double.doubleToLongBits(got(g)._1) ===
        java.lang.Double.doubleToLongBits(p50), s"$g p50 not bit-equal")
      assert(java.lang.Double.doubleToLongBits(got(g)._2) ===
        java.lang.Double.doubleToLongBits(p90), s"$g p90 not bit-equal")
    }
  }

  test("quantilesWithSum rides exact long count+sum along the histogram pass") {
    val rows = Seq(("a", 10L), ("a", 20L), ("a", 31L), ("b", 7L), ("b", 100000000007L))
    val df = rows.toDF("g", "v")
    val got = DistributedQuantile
      .quantilesWithSum(df, Seq("g"), "v", Seq("p50" -> 0.5), 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("a") === ((3L, 61L, 20.0)))
    assert(got("b") === ((2L, 100000000014L, 50000000007.0)))
  }

  test("quantilesDisc returns the ceil(q*n)-ranked element, no interpolation") {
    val rows = Seq("a" -> 10.0, "a" -> 20.0, "a" -> 30.0, "a" -> 40.0,
      "b" -> 7.0)
    val df = rows.toDF("g", "v")
    val got = DistributedQuantile
      .quantilesDisc(df, Seq("g"), "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75), 4)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // n=4: ranks ceil(1)=1, ceil(2)=2, ceil(3)=3 (1-based) -> 10, 20, 30
    assert(got("a") === ((10.0, 20.0, 30.0)))
    assert(got("b") === ((7.0, 7.0, 7.0)))
    // results are always actual data values on skewed data too
    val rng = new scala.util.Random(262)
    val big = (1 to 2003).map(i => ("s", math.exp(rng.nextDouble() * 6)))
    val vals = big.map(_._2).toSet
    DistributedQuantile
      .quantilesDisc(big.toDF("g", "v"), Seq("g"), "v",
        Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99), 8)
      .collect().foreach { r =>
        Seq(1, 2, 3).foreach(i => assert(vals.contains(r.getDouble(i))))
      }
  }

  test("quantiles ignore nulls and handle a single-row group") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", Some(9.0)))
      .toDF("g", "v")
    val got = DistributedQuantile.quantiles(df, Seq("g"), "v", Seq("med" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 2.0)
    assert(got("b") === 9.0)
  }

  test("weightedCrossing equals the global-window half-mass formulation") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      (if (i % 3 == 0) "x" else "y", rng.nextInt(100000) / 100.0, i.toLong,
        (1 + rng.nextInt(5000)) / 100.0)
    }
    val df = rows.toDF("g", "r", "id", "m")
    val got = DistributedQuantile
      .weightedCrossing(df, Seq("g"), "r", Seq("id"), col("m"), scale = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap

    val wCum = Window.partitionBy("g").orderBy("r", "id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("g")
    val want = df
      .withColumn("cw", sum(functions.Exact.dec(col("m"))).over(wCum))
      .withColumn("tw", sum(functions.Exact.dec(col("m"))).over(wAll))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy("g").agg(min("r").as("r"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(got === want)
  }

  test("plan has no cartesian product and no full-group sort of the base data") {
    val df = Tables(spark, sfDir).lineitem
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val q = DistributedQuantile.quantiles(df, Seq("g"), "v", Seq("med" -> 0.5))
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "unexpected cartesian")
    q.collect() // must run green end-to-end
  }
}
