package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-47 spec: Cramér–von Mises two-sample (q395),
  * O'Brien–Fleming group-sequential interims (q396), Heaps'-law fit
  * (q397) — driver-side recomputes via literal CDF walks / cumulative
  * interim folds / point-set OLS.
  */
class Batch47Spec extends SparkSpec {

  test("q395 equals a driver-side CDF-walk recompute") {
    import graft.queries.StatsOps.{CVM_A, CVM_B}
    val rows = Tables(spark, sfDir).events
      .filter(col("event_type").isin(CVM_A, CVM_B))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val grid = rows.toSeq.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (v, xs) =>
        (v, xs.count(_._1 == CVM_A).toLong, xs.count(_._1 == CVM_B).toLong)
    }
    val n1 = grid.map(_._2).sum; val n2 = grid.map(_._3).sum
    var c1 = 0L; var c2 = 0L; var sp = 0L
    grid.foreach { case (_, t1, t2) =>
      c1 += t1; c2 += t2
      val f = (c1 * n2 - c2 * n1).toDouble / (n1.toDouble * n2.toDouble)
      sp += math.floor((t1 + t2).toDouble * f * f * 1e12 + 0.5).toLong
    }
    val t = sp.toDouble / 1e12 * n1 * n2 /
      ((n1.toDouble + n2) * (n1.toDouble + n2))
    val want = (n1, n2, math.floor(t * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q395CramerVonMises(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .head
    assert(got === want)
  }

  test("q396 equals a driver-side interim fold; boundaries decrease") {
    import graft.queries.StatsOps.{OBF_BOUNDS_MICRO, OBF_P0}
    val days = Tables(spark, sfDir).events
      .select(expr("unix_micros(ts) div 86400000000").as("d"),
        (col("event_type") === "purchase").as("p"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val d0 = days.map(_._1).min
    val byK = days.map { case (d, p) =>
      (math.min((d - d0) / 7 + 1, 4L), p)
    }.groupBy(_._1)
    var n = 0L; var x = 0L; var fcd = -1L
    val want = (1L to 4L).map { k =>
      val xs = byK.getOrElse(k, Array.empty)
      n += xs.length; x += xs.count(_._2)
      val z = (x.toDouble / n - OBF_P0) /
        math.sqrt(OBF_P0 * (1.0 - OBF_P0) / n)
      val zM = math.floor(z * 1e6 + 0.5).toLong
      val b = OBF_BOUNDS_MICRO(k.toInt - 1)
      val crossed = if (math.abs(zM) >= b) 1L else 0L
      if (crossed == 1L && fcd < 0) fcd = k
      (k, n, x, zM, b, crossed, fcd)
    }
    val got = graft.queries.StatsOps.q396ObfInterims(spark, sfDir)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === want)
    // the OBF ladder must SPEND alpha monotonically: bounds decrease
    assert(OBF_BOUNDS_MICRO === OBF_BOUNDS_MICRO.sorted.reverse)
  }

  test("q397 equals a point-set OLS; the templated fixture reads " +
    "beta ~ 0") {
    val rows = Tables(spark, sfDir).documents
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val pts = rows.toSeq.groupBy(_._1).toSeq.map { case (_, xs) =>
      val all = xs.flatMap(_._2)
      (math.floor(math.log(all.length.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(all.distinct.length.toDouble) * 1e6 + 0.5)
          .toLong)
    }
    val k = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = (k.toDouble * sxy - sx.toDouble * sy) /
      (k.toDouble * sxx - sx.toDouble * sx)
    val lnK = (sy.toDouble - beta * sx) / k / 1e6
    val want = (k, math.floor(beta * 1e6 + 0.5).toLong,
      math.floor(math.exp(lnK) * 1e6 + 0.5).toLong)
    val got = graft.queries.LlmText.q397HeapsFit(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .head
    assert(got === want)
    // the fixture shares ONE ~31-token vocabulary across sources
    // (the q334/q356 finding), so vocabulary growth is SATURATED —
    // beta near 0 is the CORRECT Heaps diagnosis of templated text,
    // exactly what the metric exists to flag
    assert(got._2 < 200000L, "templated corpus must read beta << 0.5")
  }
}
