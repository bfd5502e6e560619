package graft

import graft.queries.{DedupOps, SessionOps}
import org.apache.spark.sql.functions._

class TrainAuditSpec extends SparkSpec {

  test("q66 diff statuses partition correctly around the cutoff") {
    val ev = Tables(spark, sfDir).events
    val cutoff = lit(SessionOps.DIFF_CUTOFF).cast("timestamp")
    val diff = SessionOps.q66StateDiff(spark, sfDir).collect()
    assert(diff.nonEmpty)
    val added = diff.filter(_.getString(3) == "added").map(_.getLong(0)).toSet
    val changed = diff.filter(_.getString(3) == "changed").map(_.getLong(0)).toSet
    assert(diff.length == added.size + changed.size, "only added/changed expected")
    // added users have NO events before the cutoff; changed users do
    val before = ev.filter(col("ts") < cutoff)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(added.forall(u => !before.contains(u)))
    assert(changed.forall(before.contains))
    // changed rows really changed
    diff.filter(_.getString(3) == "changed")
      .foreach(r => assert(r.getLong(1) != r.getLong(2)))
    // users whose latest event precedes the cutoff are absent
    val diffUsers = added ++ changed
    val after = ev.filter(col("ts") >= cutoff)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(diffUsers.subsetOf(after),
      "a user with no post-cutoff event cannot appear in the diff")
  }

  test("q67 reports exactly the candidate pairs that straddle splits") {
    val leaks = DedupOps.q67SplitLeakage(spark, sfDir).collect()
    val split = DedupOps.docSplit(Tables(spark, sfDir).documents)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = DedupOps.q27MinhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.filter { case (a, b) => split(a) != split(b) }.toSet
    val got = leaks.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    leaks.foreach { r =>
      assert(r.getString(2) == split(r.getLong(0)))
      assert(r.getString(3) == split(r.getLong(1)))
      assert(r.getString(2) != r.getString(3))
    }
  }

  test("docSplit fractions are roughly 80/10/10 and deterministic") {
    val sp = DedupOps.docSplit(Tables(spark, sfDir).documents)
    val counts = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(math.abs(counts.getOrElse("train", 0L) / n - 0.8) < 0.1)
    val again = DedupOps.docSplit(Tables(spark, sfDir).documents)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sp.collect().foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
  }
}
