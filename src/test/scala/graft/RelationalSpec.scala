package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every relational query has an oracle and runs non-empty") {
    Relational.queries.foreach { case (name, fn) =>
      assert(Relational.oracles.contains(name), s"$name missing oracle")
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q01 aggregates are internally consistent") {
    val rows = Relational.q01AggSummary(spark, sfDir).collect()
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(sumQty / n - avgQty) < 1e-3)
    }
  }

  test("q02 pushes filter and projection into the scan") {
    val plan = Relational.q02FilterProject(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      "expected pushed filter on l_quantity")
  }

  test("q03 broadcasts the small dims") {
    val plan = Relational.q03JoinDims(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast join for nation/region")
  }

  test("q05 anti join excludes urgent-order customers") {
    val t = Tables(spark, sfDir)
    val anti = Relational.q05AntiJoin(spark, sfDir)
    val urgentCust = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
    assert(anti.join(urgentCust, Seq("c_custkey"), "inner").count() == 0)
  }

  test("q06 running sum is monotone per supplier") {
    val df = Relational.q06WindowRunning(spark, sfDir)
      .groupBy("l_suppkey")
      .agg((max("running_qty") === last("running_qty")).as("mono"))
    assert(df.filter(!col("mono")).count() == 0)
  }

  test("q08 approx distinct tracks exact within 5% (SURVEY: exact + approx)") {
    // approx_count_distinct is NOT oracle-portable (engine HLLs differ),
    // so the approx half of the q08 inventory line lives here.
    val t = Tables(spark, sfDir).lineitem
    val r = t.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }

  test("q07 returns at most 3 per priority") {
    val df = Relational.q07TopkPerGroup(spark, sfDir)
      .groupBy("o_orderpriority").count()
    assert(df.filter(col("count") > 3).count() == 0)
  }

  test("q10 rollup grand total equals table count") {
    val total = Relational.q10RollupStats(spark, sfDir)
      .filter(col("returnflag") === "ALL" && col("linestatus") === "ALL")
      .select("n").collect().head.getLong(0)
    assert(total == Tables(spark, sfDir).lineitem.count())
  }

  test("q92 monthly revenue sums back to the order total; growth = rev/prev") {
    val rows = Relational.q92RevenueGrowth(spark, sfDir).collect()
    val total = rows.map(_.getDouble(2)).sum
    val want = Tables(spark, sfDir).orders
      .agg(graft.functions.Exact.sumExact(col("o_totalprice")))
      .collect().head.getDouble(0)
    assert(math.abs(total - want) < 1e-6 * want)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getDouble(4) == r.getDouble(2) / r.getDouble(3))
    }
    assert(rows.count(_.isNullAt(3)) ==
      rows.map(_.getString(0)).distinct.length,
      "exactly one month without a predecessor per segment")
  }

  test("q93 pair supports match a driver-side basket recount") {
    val baskets = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val truth = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length) {
        val k = (parts(i), parts(j))
        truth(k) = truth.getOrElse(k, 0L) + 1
      }
    }
    val want = truth.filter(_._2 >= Relational.Q93_MIN_SUPPORT)
    val got = Relational.q93BasketAffinity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want.toMap)
  }

  test("q103 integer pagerank matches a driver-side power iteration") {
    import graft.queries.Relational
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
    val pairCounts = byOrder.flatMap { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= Relational.Q93_MIN_SUPPORT).keys.toSeq
    val edges = pairCounts.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var ranks = deg.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to Relational.PAGERANK_ITERS) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => (85L * ranks(src)) / (100L * deg(src)) }.sum
      }
      ranks = in.map { case (n, s) => n -> (150000000L + s) }
    }
    val got = Relational.q103PartPagerank(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.keySet == ranks.keySet)
    ranks.foreach { case (n, r) => assert(got(n) == r, s"part $n rank") }
  }

  test("q130 RFM quartiles match the SQL-standard ntile over each ordering") {
    def sqlNtile[K](ordered: Seq[K], buckets: Int): Map[K, Long] = {
      val n = ordered.length
      val base = n / buckets; val rem = n % buckets
      val sizes = (0 until buckets).map(b => if (b < rem) base + 1 else base)
      val bounds = sizes.scanLeft(0)(_ + _)
      ordered.zipWithIndex.map { case (k, i) =>
        k -> (bounds.indexWhere(_ > i).toLong)
      }.toMap
    }
    val rows = Relational.q130RfmSegments(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val byR = rows.sortBy(r => (r._2, r._1)).map(_._1).toSeq
    val byF = rows.sortBy(r => (r._3, r._1)).map(_._1).toSeq
    val byM = rows.sortBy(r => (r._4, r._1)).map(_._1).toSeq
    val expR = sqlNtile(byR, Relational.RFM_TILES)
    val expF = sqlNtile(byF, Relational.RFM_TILES)
    val expM = sqlNtile(byM, Relational.RFM_TILES)
    rows.foreach { case (c, _, _, _, r, f, m, seg) =>
      assert(r == expR(c), s"cust $c r_score")
      assert(f == expF(c), s"cust $c f_score")
      assert(m == expM(c), s"cust $c m_score")
      assert(seg == r * 100 + f * 10 + m)
    }
  }

  test("q138 cheapest supplier is the per-part argmin with lower-suppkey ties") {
    val rows = Tables(spark, sfDir).lineitem
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1e6 / r.getDouble(3) + 0.5).toLong))
    val expected = rows.groupBy(_._1).map { case (p, v) =>
      val perSupp = v.groupBy(_._2).map { case (s, w) => (s, w.map(_._3).min) }
      val (s, c) = perSupp.toSeq.minBy { case (s, c) => (c, s) }
      p -> ((s, c))
    }
    val got = graft.queries.Relational.q138CheapestSupplier(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // display attrs come from the dims: every winner resolves a name
    val named = graft.queries.Relational.q138CheapestSupplier(spark, sfDir)
      .collect()
    named.foreach { r =>
      assert(r.getString(3).nonEmpty && r.getString(4).nonEmpty)
    }
  }

  test("q138 plan: dims broadcast, no join-back of the fact to its own aggregate") {
    val df = graft.queries.Relational.q138CheapestSupplier(spark, sfDir)
    df.collect()
    // AQE's toString repeats the tree under "== Initial Plan ==" —
    // count scans in the final plan only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    // exactly one scan of lineitem: the argmin is an aggregate, not a self-join
    val scans = "parquet [^\\n]*lineitem".r.findAllIn(p).length
    assert(scans <= 1, s"lineitem scanned $scans times")
  }

  test("q150 integrity audit: clean data has zero violations, orphans are detected") {
    val cleanRows = graft.queries.Relational.q150IntegrityAudit(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(cleanRows.length == 5)
    assert(cleanRows.forall(_._3 == 0L), s"driver data must be referentially clean")
    assert(cleanRows.forall(_._2 > 0L))
    // fixture: copy the tables, inject an orphan order and an orphan lineitem
    val dir = java.nio.file.Files.createTempDirectory("integrity").toString
    val t = Tables(spark, sfDir)
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet").write.parquet(s"$dir/$n.parquet")
    }
    t.orders.limit(50)
      .withColumn("o_custkey",
        when(col("o_orderkey") === t.orders.limit(1).collect()(0).getLong(0),
          lit(-999L)).otherwise(col("o_custkey")))
      .write.parquet(s"$dir/orders.parquet")
    t.lineitem.limit(200)
      .withColumn("l_partkey",
        when(col("l_linenumber") === 1, lit(-777L)).otherwise(col("l_partkey")))
      .write.parquet(s"$dir/lineitem.parquet")
    val dirty = graft.queries.Relational.q150IntegrityAudit(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(dirty("orders.o_custkey -> customer") == 1L, "injected orphan order")
    assert(dirty("lineitem.l_partkey -> part") > 0L, "injected orphan lineitems")
    assert(dirty("customer.c_nationkey -> nation") == 0L)
  }

  test("q239 chi-square equals a driver-side contingency recompute") {
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = Tables(spark, sfDir).orders.count()
    val supp = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length; if ps(i) < ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= graft.queries.Relational.Q93_MIN_SUPPORT).toMap
    val got = graft.queries.Relational.q239AssocSignificance(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_both"), r.getAs[Long]("chi2_milli")))).toMap
    assert(got.keySet === pairCounts.keySet)
    pairCounts.foreach { case (k @ (pa, pb), a) =>
      val b = supp(pa) - a; val c = supp(pb) - a; val d = n - supp(pa) - supp(pb) + a
      val chi2 = n.toDouble * (a * d - b * c) * (a * d - b * c) /
        ((a + b) * (c + d) * (a + c).toDouble * (b + d))
      assert(got(k) === ((a, math.floor(chi2 * 1000 + 0.5).toLong)), s"$k")
    }
  }

  test("q237 shares reconcile: children sum to parents, parents to 1e6") {
    val rows = graft.queries.Relational.q237Contribution(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("rev_c"),
        r.getAs[Long]("nation_in_region_micro"),
        r.getAs[Long]("region_of_total_micro")))
    // nation shares within each region sum to ~1e6 (per-row rounding)
    rows.groupBy(_._1).foreach { case (region, ns) =>
      val s = ns.map(_._4).sum
      assert(math.abs(s - 1000000L) <= ns.length / 2 + 1, s"$region: $s")
      // every nation in the region reports the SAME region share
      assert(ns.map(_._5).distinct.length === 1, region)
    }
    // region shares sum to ~1e6
    val regionShares = rows.groupBy(_._1).map(_._2.head._5)
    assert(math.abs(regionShares.sum - 1000000L) <= regionShares.size / 2 + 1)
    // revenue conserves against a direct total
    val total = Tables(spark, sfDir).orders
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("r"))
      .agg(sum("r")).head.getLong(0)
    assert(rows.map(_._3).sum === total)
  }

  test("q219 Apriori triples equal the unpruned brute-force count") {
    // sf0.01: the smallest sf with any support-2 triple
    val dir = "/root/testdata/sf0.01"
    val baskets = Tables(spark, dir).lineitem
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sorted.toSeq)
    val want = baskets.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length;
           k <- j + 1 until ps.length)
        yield (ps(i), ps(j), ps(k))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= graft.queries.Relational.Q93_MIN_SUPPORT).toMap
    val got = graft.queries.Relational.q219FrequentTriples(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got === want, "Apriori pruning must be lossless")
  }
}
