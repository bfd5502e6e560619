package graft

import graft.operators.SpatialNeighbors
import org.apache.spark.sql.functions._

class SpatialNeighborsSpec extends SparkSpec {

  test("densityCenter matches a driver-side brute force per sim") {
    import spark.implicits._
    // two sims: a tight clump near (0,0,0) plus outliers; clump
    // dominates density so the center lands near the clump
    val stars = Seq(
      ("s1", 0.0, 0.0, 0.0, 2.0), ("s1", 0.1, 0.0, 0.0, 1.0),
      ("s1", 0.0, 0.1, 0.0, 1.0), ("s1", 5.0, 5.0, 5.0, 1.0),
      ("s2", 9.0, 9.0, 9.0, 1.0), ("s2", 9.1, 9.0, 9.0, 1.0))
      .toDF("sim_id", "x", "y", "z", "mass")
    val r = 1.0
    val got = SpatialNeighbors
      .densityCenter(stars, Seq("sim_id"), "x", "y", "z", "mass", r)
      .collect().map(row => row.getString(0) ->
        (row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getLong(4)))
      .toMap
    val rows = stars.collect().map(row => (row.getString(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4)))
    val expected = rows.groupBy(_._1).map { case (sim, ss) =>
      val withRho = ss.map { s =>
        val rho = ss.filter { t =>
          val d = math.sqrt((t._2 - s._2) * (t._2 - s._2)
            + (t._3 - s._3) * (t._3 - s._3) + (t._4 - s._4) * (t._4 - s._4))
          d <= r
        }.map(_._5).sum
        (s._2, s._3, s._4, rho)
      }
      val tot = withRho.map(_._4).sum
      sim -> (withRho.map(s => s._1 * s._4).sum / tot,
        withRho.map(s => s._2 * s._4).sum / tot,
        withRho.map(s => s._3 * s._4).sum / tot,
        ss.length.toLong)
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (sim, (ex, ey, ez, n)) =>
      assert(got(sim)._4 == n, s"$sim star count")
      assert(math.abs(got(sim)._1 - ex) < 1e-9, s"$sim dc_x")
      assert(math.abs(got(sim)._2 - ey) < 1e-9, s"$sim dc_y")
      assert(math.abs(got(sim)._3 - ez) < 1e-9, s"$sim dc_z")
    }
    // sims do not contaminate each other: s2's center is near (9,9,9)
    assert(got("s2")._1 > 8.5 && got("s1")._1 < 1.0)
  }

  test("densityCenter plan has no cartesian product") {
    import spark.implicits._
    val stars = Seq(("s1", 0.0, 0.0, 0.0, 1.0)).toDF("sim_id", "x", "y", "z", "mass")
    val p = SpatialNeighbors
      .densityCenter(stars, Seq("sim_id"), "x", "y", "z", "mass", 1.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
