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

  test("q71 reports one exact stats row per column") {
    val rows = graft.queries.TrainPrep.q71TableStats(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      graft.queries.TrainPrep.STATS_COLS.sorted)
    val n = Tables(spark, sfDir).documents.count()
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == 0L, s"${r.getString(0)}: unexpected nulls")
      assert(r.getLong(3) <= n)
    }
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("doc_id").getLong(3) == n, "doc_id must be unique")
  }

  test("q72 signature estimates track exact jaccard on verified near-dups") {
    val est = DedupOps.q72MinhashEstimate(spark, sfDir).collect()
    assert(est.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      DedupOps.q27MinhashLsh(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      "q72 must score exactly the candidate pairs")
    est.foreach { r =>
      val (nEq, e) = (r.getLong(2), r.getDouble(3))
      assert(nEq >= 0 && nEq <= DedupOps.NUM_HASHES)
      assert(e == nEq.toDouble / DedupOps.NUM_HASHES)
    }
    val verified = DedupOps.q29NgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val estMap = est.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    verified.foreach { p =>
      assert(estMap(p) >= 0.5,
        s"pair $p verified >= ${DedupOps.JACCARD_MIN} but estimated ${estMap(p)}")
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

  test("q126 merge applies upserts, deletes, and carries untouched keys") {
    import org.apache.spark.sql.functions._
    val cutoff = java.sql.Timestamp.valueOf(
      graft.queries.SessionOps.DIFF_CUTOFF.replace(" ", " "))
    val ev = Tables(spark, sfDir).events
      .select("user_id", "event_id", "event_type", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getTimestamp(4)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (u, rows) =>
      def us(t: java.sql.Timestamp): Long =
        t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
      def last(pred: ((Long, Long, String, Double, java.sql.Timestamp)) => Boolean) = {
        val c = rows.filter(pred)
        if (c.isEmpty) None
        else Some(c.maxBy(r => (us(r._5), r._2)))
      }
      val snap = last(_._5.before(cutoff))
      val op = last(!_._5.before(cutoff))
      op match {
        case Some(o) if o._3 == "error" => None // deleted
        case Some(o) =>
          Some(u -> (o._2, o._4, if (snap.isEmpty) "added" else "upserted"))
        case None => snap.map(s => u -> (s._2, s._4, "carried"))
      }
    }
    val got = graft.queries.SessionOps.q126CdcMerge(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getString(3)))
      .toMap
    assert(got == expected && got.nonEmpty)
  }
}
