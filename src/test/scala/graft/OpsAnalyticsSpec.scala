package graft

import graft.queries.OpsAnalytics
import org.apache.spark.sql.functions._

class OpsAnalyticsSpec extends SparkSpec {

  test("every ops-analytics query has an oracle and runs non-empty") {
    OpsAnalytics.queries.foreach { case (name, fn) =>
      assert(OpsAnalytics.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q201 attributes every purchase exactly once") {
    val df = OpsAnalytics.q201LastTouch(spark, sfDir).collect()
    val totalPurchases = Tables(spark, sfDir).events
      .filter(col("event_type") === "purchase").count()
    assert(df.map(_.getAs[Long]("n_purchases")).sum === totalPurchases)
    val camps = df.map(_.getAs[Long]("campaign")).toSet
    assert(camps.subsetOf(
      (-1L until OpsAnalytics.ATTR_CAMPAIGNS.toLong).toSet))
  }

  test("q201 matches a driver-side per-purchase lookup") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"),
        (get_json_object(col("props"), "$.k").cast("long") %
          OpsAnalytics.ATTR_CAMPAIGNS).as("camp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getLong(5)))
    val byUser = ev.groupBy(_._1)
    val credited = ev.filter(_._4 == "purchase").map { p =>
      val clicks = byUser(p._1).filter(_._4 == "click")
        .filter(c => c._2 < p._2 || (c._2 == p._2 && c._3 <= p._3))
      if (clicks.isEmpty) -1L
      else {
        val last = clicks.maxBy(c => (c._2, c._3))
        if (p._2 - last._2 <= OpsAnalytics.ATTR_LOOKBACK_US) last._6 else -1L
      }
    }
    val want = credited.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = OpsAnalytics.q201LastTouch(spark, sfDir).collect()
      .map(r => r.getAs[Long]("campaign") -> r.getAs[Long]("n_purchases"))
      .toMap
    assert(got === want)
  }

  test("q202 histogram covers every event with buckets in range") {
    val df = OpsAnalytics.q202LatenessProfile(spark, sfDir).collect()
    val total = Tables(spark, sfDir).events.count()
    assert(df.map(_.getAs[Long]("n_events")).sum === total)
    df.foreach { r =>
      val b = r.getAs[Long]("late_min")
      assert(b >= 0 && b <= OpsAnalytics.LATE_CAP_MIN)
    }
  }

  test("q244 both models conserve purchases and 'last' matches q201") {
    val rows = OpsAnalytics.q244AttributionCompare(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("campaign"), r.getString(1)) ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_cents"))).toMap
    val totalPurchases = Tables(spark, sfDir).events
      .filter(col("event_type") === "purchase").count()
    Seq("last", "first").foreach { m =>
      val per = rows.filter(_._1._2 == m).values
      assert(per.map(_._1).sum === totalPurchases, s"model $m coverage")
    }
    // the last-touch column of the comparison IS q201
    val q201 = OpsAnalytics.q201LastTouch(spark, sfDir).collect()
      .map(r => r.getAs[Long]("campaign") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_cents"))).toMap
    q201.foreach { case (c, v) =>
      assert(rows((c, "last")) === v, s"campaign $c last-touch")
    }
  }

  test("q240 contract verdicts match direct violation counts") {
    val rows = OpsAnalytics.q240EventContract(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
          r.getAs[Boolean]("pass"))).toMap
    val ev = Tables(spark, sfDir).events
    val n = ev.count()
    assert(rows.size === 5)
    rows.values.foreach { case (nr, v, pass) =>
      assert(nr === n)
      assert(pass === (v == 0L))
      assert(v >= 0L && v <= n)
    }
    // direct recount of one rule on each side of the pass/fail line
    val badValue = ev.filter(!(col("value") >= 0)).count()
    assert(rows("value_non_negative")._2 === badValue)
    val badEnum = ev.filter(!col("event_type")
      .isin("click", "view", "purchase", "signup", "error")).count()
    assert(rows("event_type_enum")._2 === badEnum)
  }

  test("q202 block decomposition equals the one-task running max") {
    // driver-side single-pass recompute over the jittered arrival order
    val rows = Tables(spark, sfDir).events
      .select(unix_micros(col("ts")).as("us"),
        (unix_micros(col("ts")) +
          conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % OpsAnalytics.LATE_JITTER_US).as("arr"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._3))
    var runMax = Long.MinValue
    val want = rows.map { case (us, _, _) =>
      runMax = math.max(runMax, us)
      math.min((runMax - us) / 60000000L, OpsAnalytics.LATE_CAP_MIN)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = OpsAnalytics.q202LatenessProfile(spark, sfDir).collect()
      .map(r => r.getAs[Long]("late_min") -> r.getAs[Long]("n_events")).toMap
    assert(got === want)
  }
}
