package graft

import graft.operators.AsOfJoin
import graft.queries.{JoinOps, StatsOps}
import org.apache.spark.sql.functions._

/** Round-5 batch-9 specs: forward as-of, gap profile, decile lift. */
class Batch9Spec extends SparkSpec {

  test("earliestAfter picks the first right at-or-after, per key") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-01-01 10:30:00")), (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 09:00:00")))
      .toDF("k", "t")
    val r = Seq((1L, ts("2024-01-01 11:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (2L, ts("2024-01-01 08:00:00"), "c"))
      .toDF("k", "rt", "v")
    val got = AsOfJoin.earliestAfter(l, r, Seq("k"), "t", "rt", Seq("rt", "v"))
      .orderBy("k", "t").collect()
    // 10:30 -> 11:00 "a"; 11:00 -> inclusive match 11:00 "a";
    // key 2 has no right at-or-after -> null
    assert(got(0).getAs[String]("v") === "a")
    assert(got(1).getAs[String]("v") === "a")
    assert(got(2).isNullAt(got(2).fieldIndex("v")))
  }

  test("q189 equals a driver-side next-checkpoint scan") {
    val t = Tables(spark, sfDir)
    val hourly = t.events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .count().select("user_id", "hour").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    val ev = t.events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = JoinOps.q189AsofForward(spark, sfDir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    ev.take(500).foreach { case (id, u, tsUs) =>
      val want = hourly(u).find(_ * 1000L >= tsUs).map(ms => fmt.format(ms))
      val gotV = got(id).map(_.take(19))
      assert(gotV === want, s"event $id")
    }
  }

  test("q188 gap sums reconcile with first/last timestamps per user") {
    val t = Tables(spark, sfDir)
    val total = StatsOps.q188GapQuantiles(spark, sfDir)
      .agg(sum("sum_gap_us")).head.getLong(0)
    // sum of ALL per-user gaps = sum over users of (last - first)
    val want = t.events.groupBy("user_id")
      .agg((unix_micros(max("ts")) - unix_micros(min("ts"))).as("span"))
      .agg(sum("span")).head.getLong(0)
    assert(total === want)
  }

  test("q190 bands cover all rows; capture ends at 100%; lift averages to 1") {
    val rows = StatsOps.q190DecileLift(spark, sfDir)
      .orderBy("decile").collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    assert(rows.last.getAs[Long]("capture_micro") === 1000000L)
    val n = rows.map(_.getAs[Long]("n")).sum
    val pos = rows.map(_.getAs[Long]("pos")).sum
    // weighted mean lift == 1 by construction (within per-band rounding)
    val weighted = rows.map(r =>
      r.getAs[Long]("lift_micro") * r.getAs[Long]("n")).sum / n
    assert(math.abs(weighted - 1000000L) < 1000, s"weighted lift $weighted")
    assert(pos > 0 && n > pos)
  }
}
