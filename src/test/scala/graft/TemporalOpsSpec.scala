package graft

import graft.queries.TemporalOps
import org.apache.spark.sql.functions._

class TemporalOpsSpec extends SparkSpec {

  test("every temporal query has an oracle and runs non-empty") {
    TemporalOps.queries.foreach { case (name, fn) =>
      assert(TemporalOps.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q162 transition counts sum to events minus one per active user") {
    val t = Tables(spark, sfDir)
    val total = TemporalOps.q162MarkovTransitions(spark, sfDir)
      .agg(sum("n")).head.getLong(0)
    val nEvents = t.events.count()
    val nUsers = t.events.select("user_id").distinct().count()
    assert(total === nEvents - nUsers)
  }

  test("q162 probabilities row-normalize to ~1e6 per prev_type") {
    val rows = TemporalOps.q162MarkovTransitions(spark, sfDir)
      .groupBy("prev_type").agg(sum("prob_micro").as("p")).collect()
    rows.foreach { r =>
      val p = r.getAs[Long]("p")
      // rounding of each cell can drift the row total by at most #cells/2
      assert(math.abs(p - 1000000L) <= 3, s"row sums to $p")
    }
  }

  test("q163 lag-0 sanity: autocorrelation formula gives 1 at lag 0") {
    // driver-side recompute of lag-1 from the daily series
    val daily = Tables(spark, sfDir).events
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).orderBy("day")
      .collect().map(_.getLong(1).toDouble)
    val x = daily.dropRight(1); val y = daily.drop(1)
    val n = x.length.toDouble
    val r = (n * x.zip(y).map { case (a, b) => a * b }.sum - x.sum * y.sum) /
      (math.sqrt(n * x.map(a => a * a).sum - x.sum * x.sum) *
        math.sqrt(n * y.map(a => a * a).sum - y.sum * y.sum))
    val got = TemporalOps.q163DailyAutocorr(spark, sfDir)
      .filter(col("lag") === 1).head.getAs[Long]("acf_micro")
    assert(math.abs(got - math.floor(r * 1e6 + 0.5).toLong) <= 1)
  }

  test("q246 decayed scores equal the integer half-life fold") {
    val days = Tables(spark, sfDir).lineitem
      .select(col("l_partkey"),
        expr("unix_micros(l_shipdate) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDay = days.map(_._2).max
    val scores = days.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map { case (_, d) =>
        (1L << TemporalOps.DECAY_UNIT_SHIFT) >>
          math.min((maxDay - d) / TemporalOps.DECAY_EPOCH_DAYS,
            TemporalOps.DECAY_UNIT_SHIFT.toLong).toInt
      }.sum)
    }.toMap
    val want = scores.toSeq.sortBy { case (k, (_, s)) => (-s, k) }
      .take(TemporalOps.DECAY_TOP)
      .map { case (k, (n, s)) => (k, n, s) }
    val got = TemporalOps.q246DecayedPopularity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("q236 backtest metrics equal a driver-side lag-7 recompute") {
    val daily = Tables(spark, sfDir).events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = TemporalOps.q236ForecastBacktest(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("mae_n_micro"),
          r.getAs[Long]("bias_n"), r.getAs[Long]("mape_v_micro"))).toMap
    daily.groupBy(_._1).foreach { case (et, xs) =>
      val byDay = xs.map(t => t._2 -> ((t._3, t._4))).toMap
      val scored = xs.flatMap { case (_, d, n, v) =>
        byDay.get(d - TemporalOps.FORECAST_LAG_DAYS)
          .map { case (pn, pv) => (n, pn, v, pv) }
      }
      val k = scored.length.toLong
      val mae = math.floor(
        scored.map(t => math.abs(t._1 - t._2)).sum * 1e6 / k + 0.5).toLong
      val bias = scored.map(t => t._1 - t._2).sum
      val mape = math.floor(
        scored.map(t => math.abs(t._3 - t._4) * 1000000L / t._3).sum
          .toDouble / k + 0.5).toLong
      assert(got(et) === ((k, mae, bias, mape)), s"type $et")
    }
  }

  test("q231 trigram counts equal a driver-side stream fold") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = ev.groupBy(_._1).values.flatMap { xs =>
      val seq = xs.sortBy(t => (t._2, t._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).map(w => (w(0), w(1), w(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranked = counts.values.toSeq.distinct.sorted.reverse.zipWithIndex
      .map { case (n, i) => n -> (i + 1) }.toMap
    val want = counts.filter(c => ranked(c._2) <= TemporalOps.TRIGRAM_TOP)
      .map { case (tri, n) => tri -> ((ranked(n), n)) }
    val got = TemporalOps.q231EventTrigrams(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)) ->
        ((r.getAs[Int]("rank"), r.getAs[Long]("n")))).toMap
    assert(got === want)
  }

  test("q164 equals a driver-side NOT EXISTS recompute") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val want = ev.filter(_._2 == "click").groupBy(_._1).map { case (u, clicks) =>
      val purchases = byUser(u).filter(_._2 == "purchase")
      val abandoned = clicks.count { c =>
        !purchases.exists(p =>
          (p._3 > c._3 || (p._3 == c._3 && p._4 > c._4)) &&
            p._3 - c._3 <= TemporalOps.ABANDON_US)
      }
      u -> (clicks.length.toLong, abandoned.toLong)
    }
    val got = TemporalOps.q164AbandonedClicks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
  }

  test("q164 plan is a single window pass, no self-join") {
    val plan = TemporalOps.q164AbandonedClicks(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "anti-sequence must not self-join")
    assert(plan.contains("Window"))
  }
}
