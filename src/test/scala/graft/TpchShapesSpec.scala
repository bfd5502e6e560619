package graft

import graft.queries.TpchShapes
import org.apache.spark.sql.functions._

class TpchShapesSpec extends SparkSpec {

  test("every TPC-H-shape query has an oracle and runs") {
    TpchShapes.queries.foreach { case (name, fn) =>
      assert(TpchShapes.oracles.contains(name), s"$name missing oracle")
      fn(spark, sfDir).collect() // q159 may be 1 row with zero matches at tiny sf
    }
  }

  test("q158 buckets partition the customer table exactly") {
    val t = Tables(spark, sfDir)
    val dist = TpchShapes.q158OrderCountDist(spark, sfDir)
    val total = dist.agg(sum("n_customers")).head.getLong(0)
    assert(total === t.customer.count())
    // zero bucket == customers absent from orders (left-anti recount)
    val zero = dist.filter(col("n_orders") === 0)
      .agg(coalesce(sum("n_customers"), lit(0L))).head.getLong(0)
    val anti = t.customer.join(t.orders,
      col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(zero === anti)
  }

  test("q159 equals a driver-side recompute of the correlated filter") {
    val t = Tables(spark, sfDir)
    val li = t.lineitem
      .join(t.part.filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("qc"),
        floor(col("l_extendedprice") * 1e6 + lit(0.5)).cast("long").as("pm"))
      .collect()
    val byPart = li.groupBy(_.getLong(0))
    val want = li.filter { r =>
      val g = byPart(r.getLong(0))
      r.getLong(1) * 5 * g.length < g.map(_.getLong(1)).sum
    }
    val got = TpchShapes.q159SmallQtyRevenue(spark, sfDir).head
    assert(got.getLong(0) === want.length.toLong)
    assert(got.getLong(1) === want.map(_.getLong(2)).sum)
  }

  test("q160 members have no orders and exceed the positive-average balance") {
    val t = Tables(spark, sfDir)
    val res = TpchShapes.q160DormantRich(spark, sfDir)
    val nCust = res.agg(coalesce(sum("n_cust"), lit(0L))).head.getLong(0)
    // recompute membership directly
    val bal = t.customer.select(col("c_custkey"),
      floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bc")).collect()
    val pos = bal.map(_.getLong(1)).filter(_ > 0)
    val withOrders = t.orders
      .filter(col("o_orderdate") >=
        lit(TpchShapes.DORMANT_CUTOFF).cast("timestamp"))
      .select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val want = bal.count { r =>
      r.getLong(1) * pos.length > pos.sum && !withOrders(r.getLong(0))
    }
    assert(nCust === want.toLong)
  }

  test("q161 sweep skyline equals the brute-force dominance definition") {
    val t = Tables(spark, sfDir)
    val pts = t.part.select(col("p_partkey"), col("p_size").cast("long"),
      floor(col("p_retailprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pts.filter { case (_, sz, pr) =>
      !pts.exists { case (_, sz2, pr2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(_._1).toSet
    val got = TpchShapes.q161Skyline(spark, sfDir)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("q182 rank movers equals a driver-side rank recompute") {
    val t = Tables(spark, sfDir)
    val rev = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .select(date_format(date_trunc("MONTH", col("o_orderdate")), "yyyy-MM")
        .as("m"), col("p_brand"),
        floor(col("l_extendedprice") * 1e6 + lit(0.5)).cast("long").as("r"))
      .groupBy("m", "p_brand").agg(sum("r").as("r")).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val ranks = rev.groupBy(_._1).toSeq.flatMap { case (m, rows) =>
      rows.sortBy(x => (-x._3, x._2)).zipWithIndex.toSeq
        .map { case (x, i) => (m, x._2) -> (i + 1).toLong }
    }.toMap
    val months = rev.map(_._1).distinct.sorted
    val want = (for {
      b <- rev.map(_._2).distinct
      (prevM, curM) <- months.zip(months.tail)
      prev <- ranks.get((prevM, b)); cur <- ranks.get((curM, b))
      if prev != cur
    } yield (curM, b, cur, prev)).toSet
    // driver recompute pairs consecutive PRESENT months per brand, as
    // lag() does over the brand's own month sequence
    val wantLag = (for {
      b <- rev.map(_._2).distinct
      bm = months.filter(m => ranks.contains((m, b)))
      (pm, cm) <- bm.zip(bm.tail)
      if ranks((pm, b)) != ranks((cm, b))
    } yield (cm, b, ranks((cm, b)), ranks((pm, b)))).toSet
    val got = TpchShapes.q182RankMovers(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === wantLag)
    // when every brand appears every month the two formulations agree
    if (rev.map(_._2).distinct.forall(b =>
      months.forall(m => ranks.contains((m, b))))) assert(got === want)
  }

  test("q183 disjunctive filter equals a driver-side recompute") {
    val t = Tables(spark, sfDir)
    val rows = t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_size"),
        floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("qc"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 1e4
          + lit(0.5)).cast("long").as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val keep = rows.filter { case (b, s, q, _) =>
      (b == "Brand#12" && s >= 1 && s <= 5 && q >= 100 && q <= 1100) ||
      (b == "Brand#23" && s >= 1 && s <= 10 && q >= 1000 && q <= 2000) ||
      (b == "Brand#34" && s >= 1 && s <= 15 && q >= 2000 && q <= 3000)
    }
    val got = TpchShapes.q183DisjunctiveRevenue(spark, sfDir).head
    assert(got.getLong(0) === keep.length.toLong)
    assert(got.getLong(1) === keep.map(_._4).sum)
  }

  test("q184 promo share reconciles against the unconditioned total") {
    val got = TpchShapes.q184PromoShare(spark, sfDir).head
    val promo = got.getLong(0); val total = got.getLong(1)
    assert(promo >= 0 && promo <= total && total > 0)
    assert(got.getLong(2) ===
      math.floor(promo * 1e6 / total + 0.5).toLong)
  }

  test("q161 plan has no self-join on part and only broadcast joins") {
    val plan = TpchShapes.q161Skyline(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "skyline must not shuffle-join")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q212 report is the exact revenue-ordered top 20") {
    val rows = TpchShapes.q212ReturnedReport(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("lost_rev"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "desc order")
    // every reported row is a real (R-flag, in-window) aggregate
    rows.foreach { r => assert(r.getAs[Long]("n_items") >= 1L) }
  }

  test("q213 returns exactly the argmax supplier(s)") {
    val rows = TpchShapes.q213TopSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("total_rev")).distinct
    assert(revs.length === 1, "all rows carry the shared max revenue")
  }

  test("q214 finds exactly the orders above the quantity threshold") {
    val want = Tables(spark, sfDir).lineitem
      .groupBy("l_orderkey")
      .agg(sum(floor(col("l_quantity") * 100 + lit(0.5)).cast("long"))
        .as("q"))
      .filter(col("q") > TpchShapes.LARGE_ORDER_QTY_C).count()
    assert(TpchShapes.q214LargeOrders(spark, sfDir).count() === want)
  }

  test("q253 nation-pair revenue reconciles to the unpartitioned total") {
    val rows = TpchShapes.q253NationTrade(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val gotLines = rows.map(_.getAs[Long]("n_lines")).sum
    assert(gotLines === Tables(spark, sfDir).lineitem.count())
    // pair matrix covers both directions independently
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.exists { case (a, b) => a != b && pairs.contains((b, a)) })
  }

  test("q254 nation revenues sum exactly to their region-year total") {
    val rows = TpchShapes.q254MarketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getString(0), r.getInt(1))).foreach {
      case ((region, yr), rs) =>
        val tot = rs.head.getAs[Long]("total_cmicro")
        assert(rs.forall(_.getAs[Long]("total_cmicro") == tot))
        assert(rs.map(_.getAs[Long]("rev_cmicro")).sum === tot,
          s"$region $yr share sum")
    }
  }

  test("q255 waiting suppliers: sole-late attribution replayed driver-side") {
    val t = Tables(spark, sfDir)
    val li = t.lineitem
      .join(t.orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL ${TpchShapes.LATE_DAYS} DAYS"))
          .as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = li.groupBy(_._1)
    val want = li.filter(_._3).map(t3 => (t3._1, t3._2)).distinct
      .filter { case (ok, sk) =>
        val others = byOrder(ok).filter(_._2 != sk)
        others.nonEmpty && !others.exists(_._3)
      }
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = TpchShapes.q255WaitingSuppliers(spark, sfDir).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("n_waiting_orders"))
      .toMap
    assert(got === want)
  }

  test("q215 shares reconcile and the filter is the cross-multiplied form") {
    val rows = TpchShapes.q215ImportantParts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every kept part clears the threshold in exact integer form
    val total = Tables(spark, sfDir).lineitem
      .select(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
        lit(1e4) + lit(0.5)).cast("long").as("r"))
      .agg(sum("r")).head.getLong(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_rev") * 1000000L >
        TpchShapes.IMPORTANT_PART_MICRO * total)
      assert(r.getAs[Long]("share_micro") ===
        math.floor(r.getAs[Long]("part_rev") * 1e6 / total + 0.5).toLong)
    }
  }
}
