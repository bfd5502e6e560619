package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-44 spec: personalized PageRank (q385), degree
  * assortativity (q386), cluster-sample design effect (q387), window
  * value-extractor surface (q388) — driver-side recomputes with
  * independent data structures (adjacency maps / sorted folds).
  */
class Batch44Spec extends SparkSpec {

  private def edges(): Seq[(Long, Long)] = {
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.toSeq.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ps = rows.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).toSeq
      .collect { case (e, xs)
        if xs.length >= graft.queries.GraphOps.TRIANGLE_MIN_SUPPORT => e }
  }

  test("q385 equals a driver-side 5-round PPR; seed mass dominates") {
    import graft.queries.GraphOps.{PPR_ITERS, PPR_SEED_MOD}
    val und = edges()
    val dir = und ++ und.map(_.swap)
    val deg = dir.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val out = dir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank: Map[Long, Long] = deg.keys.map(n =>
      n -> (if (n % 50 == PPR_SEED_MOD) 1000000000L else 0L)).toMap
    for (_ <- 1 to PPR_ITERS) {
      val in = scala.collection.mutable.Map[Long, Long]()
      rank.foreach { case (n, r) =>
        out.getOrElse(n, Nil).foreach { d =>
          in(d) = in.getOrElse(d, 0L) +
            Math.floorDiv(85L * r, 100L * deg(n))
        }
      }
      deg.keys.filter(_ % 50 == PPR_SEED_MOD).foreach { s =>
        in(s) = in.getOrElse(s, 0L) + 150000000L
      }
      rank = in.toMap
    }
    val want = rank.map { case (n, r) =>
      (n, r, if (n % 50 == PPR_SEED_MOD) 1L else 0L)
    }.toSet
    val got = graft.queries.GraphOps
      .q385PersonalizedPagerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // personalization property: mean seed rank far above mean non-seed
    val seedMean = got.toSeq.filter(_._3 == 1L).map(_._2).sum /
      math.max(1L, got.count(_._3 == 1L))
    val otherMean = got.toSeq.filter(_._3 == 0L).map(_._2).sum /
      math.max(1L, got.count(_._3 == 0L))
    assert(seedMean > 5L * otherMean,
      s"teleport must concentrate mass at seeds ($seedMean vs $otherMean)")
  }

  test("q386 equals a driver-side moments recompute; |r| <= 1") {
    val und = edges()
    val dir = und ++ und.map(_.swap)
    val deg = dir.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pairs = dir.map { case (u, v) => (deg(u), deg(v)) }
    val n = pairs.length.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val r = (n.toDouble * sxy - sx.toDouble * sy) /
      math.sqrt((n.toDouble * sxx - sx.toDouble * sx) *
        (n.toDouble * syy - sy.toDouble * sy))
    val want = (n, math.floor(sx.toDouble / n * 1e6 + 0.5).toLong,
      math.floor(r * 1e6 + 0.5).toLong)
    val got = graft.queries.GraphOps.q386Assortativity(spark, sfDir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .head
    assert(got === want)
    assert(math.abs(got._3) <= 1000000L)
  }

  test("q387 equals a driver-side ANOVA-components recompute") {
    import graft.queries.StatsOps.{CLUSTER_KEEP, CLUSTER_MOD}
    val rows = Tables(spark, sfDir).events
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5)
        .toLong))
      .filter(r => r._1 % CLUSTER_MOD < CLUSTER_KEEP)
    val g = rows.groupBy(_._1).map { case (_, xs) =>
      val n = xs.length.toLong
      val s = xs.map(_._2).sum
      val ss = xs.map(x => x._2 * x._2).sum
      (n, s, ss,
        math.floor(s.toDouble * s / n * 1e6 + 0.5).toLong)
    }.toSeq
    val k = g.length.toLong
    val nn = g.map(_._1).sum
    val stot = g.map(_._2).sum; val sstot = g.map(_._3).sum
    val aM = g.map(_._4).sum
    val snn = g.map(x => x._1 * x._1).sum
    val aD = aM.toDouble / 1e6
    val msb = (aD - stot.toDouble * stot / nn) / (k - 1.0)
    val msw = (sstot - aD) / (nn.toDouble - k)
    val m0 = (nn - snn.toDouble / nn) / (k - 1.0)
    val rho = (msb - msw) / (msb + (m0 - 1.0) * msw)
    val deff = 1.0 + (nn.toDouble / k - 1.0) * rho
    val want = (k, nn, math.floor(m0 * 1e6 + 0.5).toLong,
      math.floor(rho * 1e6 + 0.5).toLong,
      math.floor(deff * 1e6 + 0.5).toLong)
    val got = graft.queries.StatsOps.q387ClusterDeff(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    assert(got === want)
  }

  test("q388 equals per-type sorted folds; NULL semantics hold") {
    val daily = Tables(spark, sfDir).events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.toSeq.groupBy(_._1).flatMap { case (ty, rowsU) =>
      val rows = rowsU.sortBy(_._2)
      val n = rows.length
      val vals = rows.map(_._3)
      val nulls = rows.map(r => if (r._2 % 3 == 0) None else Some(r._3))
      val lastNn = nulls.flatten.lastOption.getOrElse(-1L)
      rows.zipWithIndex.map { case ((_, day, rev), i) =>
        val nv3 = if (i >= 2) vals(2) else -1L
        val firstNn = nulls.take(i + 1).flatten.headOption.getOrElse(-1L)
        (ty, day, rev, nv3, firstNn, lastNn,
          if (n == 1) 0.0 else i.toDouble / (n - 1.0),
          (i + 1).toDouble / n)
      }
    }.toSet
    val got = graft.queries.SqlSurface.q388WindowExtrema(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7))).toSet
    assert(got === want)
    // nth_value must be NULL (sentineled) until the frame holds 3 rows
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(_._2)
      assert(sorted.take(2).forall(_._4 == -1L))
      if (sorted.size > 2) assert(sorted.drop(2).forall(_._4 != -1L))
    }
  }
}
