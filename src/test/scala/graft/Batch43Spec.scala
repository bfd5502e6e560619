package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-43 spec: word-length spectrum (q382), systematic
  * sampling (q383), Gumbel block-maxima fit (q384) — driver-side
  * recomputes plus the design properties that make each operator
  * what it claims (capped bins, even-coverage stride, return-level
  * ordering).
  */
class Batch43Spec extends SparkSpec {

  test("q382 equals a driver-side token-length histogram; bins capped") {
    import graft.queries.LlmText.WORDLEN_CAP
    val rows = Tables(spark, sfDir).documents
      .select(col("source"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(t => (r.getString(0), math.min(t.length.toLong, WORDLEN_CAP)))
      }
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong)
    val totals = rows.groupBy(_._1).view.mapValues(_.length.toLong)
    val want = cells.map { case ((src, len), n) =>
      (src, len, n, n * 1000000L / totals(src))
    }.toSet
    val got = graft.queries.LlmText.q382WordlenSpectrum(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    assert(got.forall(_._2 <= WORDLEN_CAP), "bins must be capped")
    // shares per source sum to ~1 (ppm, floor rounding loses < |bins|)
    got.groupBy(_._1).foreach { case (_, bins) =>
      val s = bins.toSeq.map(_._4).sum
      assert(s > 1000000L - bins.size && s <= 1000000L)
    }
  }

  test("q383 equals every-Kth-by-rank and covers the frame evenly") {
    import graft.queries.TrainPrep.{SYS_C, SYS_K}
    val keys = Tables(spark, sfDir).orders
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val want = keys.zipWithIndex.collect {
      case (k, i) if (i + 1) % SYS_K == SYS_C => (k, (i + 1).toLong)
    }.toSeq
    val got = graft.queries.TrainPrep.q383SystematicSample(spark, sfDir)
      .select("o_orderkey", "ord").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === want)
    // even coverage: consecutive sampled ranks differ by exactly K
    got.map(_._2).sliding(2).foreach(w => assert(w(1) - w(0) === SYS_K))
  }

  test("q384 equals a driver-side moments fit; rl(30) beats the mean") {
    import graft.queries.StatsOps.{EULER_GAMMA, GUMBEL_T, SQRT6_OVER_PI}
    val daily = Tables(spark, sfDir).events
      .select(expr("unix_micros(ts) div 86400000000").as("x"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("x").agg(max("c").as("m"))
      .collect().map(r => r.getLong(1))
    val n = daily.length.toLong
    val s = daily.sum
    val ss = daily.map(m => m * m).sum
    val mean = s.toDouble / n
    val sd = math.sqrt((n.toDouble * ss - s.toDouble * s) /
      (n.toDouble * (n - 1.0)))
    val beta = sd * SQRT6_OVER_PI.toDouble
    val mu = mean - EULER_GAMMA.toDouble * beta
    val rl = mu - beta * math.log(-math.log(1.0 - 1.0 / GUMBEL_T))
    val want = (n, daily.max,
      math.floor(mean * 1e6 + 0.5).toLong,
      math.floor(beta * 1e6 + 0.5).toLong,
      math.floor(mu * 1e6 + 0.5).toLong,
      math.floor(rl * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q384GumbelFit(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got === want)
    // a once-per-30-blocks return level must sit above the mean
    // block maximum (T=30 > the ~0.58-quantile the mean sits at)
    assert(got._6 > got._3)
  }
}
