package graft

import graft.queries.MaintOps
import org.apache.spark.sql.functions._

class MaintOpsSpec extends SparkSpec {

  test("every maintenance query has an oracle and runs non-empty") {
    MaintOps.queries.foreach { case (name, fn) =>
      assert(MaintOps.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q179 bins conserve bytes and respect the running-sum rule") {
    val files = Tables(spark, sfDir).lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_extendedprice")).cast("long")).as("b"))
      .orderBy("l_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    val wantBins = files.map { case (_, b) =>
      val bin = cum / MaintOps.COMPACT_TARGET; cum += b; (bin, b)
    }
    val want = wantBins.groupBy(_._1)
      .map { case (bin, xs) => bin -> (xs.length.toLong, xs.map(_._2).sum) }
    val got = MaintOps.q179CompactionPlan(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
    assert(got.values.map(_._2).sum === files.map(_._2).sum)
  }

  test("q180 keeps ALL ties at a kept price point") {
    val df = MaintOps.q180DenseTopk(spark, sfDir)
    // ranks are dense per brand: exactly the top <=3 distinct prices
    val perBrand = df.groupBy("p_brand")
      .agg(countDistinct("price_c").as("d"), max("rk").as("m")).collect()
    perBrand.foreach { r =>
      assert(r.getAs[Long]("d") === r.getAs[Int]("m").toLong)
      assert(r.getAs[Int]("m") <= 3)
    }
    // every part at a kept (brand, price) is present
    val t = Tables(spark, sfDir).part
      .select(col("p_brand"),
        floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
          .as("price_c"), col("p_partkey"))
    val kept = df.select("p_brand", "price_c").distinct()
    val expected = t.join(kept, Seq("p_brand", "price_c")).count()
    assert(df.count() === expected)
  }

  test("q181 CDF is monotone and ends at 1000 permille per flag") {
    val rows = MaintOps.q181CdfNormalize(spark, sfDir)
      .orderBy("l_returnflag", "qty_c").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val cds = rs.map(_.getAs[Long]("cdf_permille"))
      assert(cds.zip(cds.tail).forall { case (a, b) => a <= b }, "monotone")
      assert(cds.last === 1000L)
    }
  }

  test("q205 zone-map skipping is sound and matched counts are exact") {
    val rows = MaintOps.q205ZonemapSkip(spark, sfDir).collect()
    assert(rows.length === MaintOps.ZM_PREDS.size)
    val li = Tables(spark, sfDir).lineitem.select(
      datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long")
        .as("day"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"))
    rows.foreach { r =>
      val predId = r.getAs[Int]("pred_id")
      val (_, c, lo, hi) = MaintOps.ZM_PREDS.find(_._1 == predId).get
      // soundness: no matching row lives in a skipped file
      assert(r.getAs[Long]("rows_matched") <= r.getAs[Long]("rows_scanned"))
      assert(r.getAs[Long]("files_skipped") <= r.getAs[Long]("files_total"))
      // exactness: matched count equals a direct filter
      val want = li.filter(col(c).between(lo, hi)).count()
      assert(r.getAs[Long]("rows_matched") === want, s"pred $predId")
    }
    // the quarterly layout makes at least one date predicate prunable
    val dateSkips = rows.filter(_.getAs[Int]("pred_id") <= 3)
      .map(_.getAs[Long]("files_skipped"))
    assert(dateSkips.exists(_ > 0), "expected date zone maps to skip files")
  }

  test("q228 layouts agree on matches; z-order prunes the price band") {
    val rows = MaintOps.q228LayoutCompare(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        (r.getAs[Long]("files_skipped"), r.getAs[Long]("rows_scanned"),
          r.getAs[Long]("rows_matched"))).toMap
    assert(rows.keySet === Set(("date", "date_range"), ("date", "price_band"),
      ("zorder", "date_range"), ("zorder", "price_band")))
    // a layout never changes WHAT matches, only what gets scanned
    assert(rows(("date", "date_range"))._3 === rows(("zorder", "date_range"))._3)
    assert(rows(("date", "price_band"))._3 === rows(("zorder", "price_band"))._3)
    rows.values.foreach { case (_, scanned, matched) =>
      assert(matched <= scanned, "zone-map soundness")
    }
    // the point of the query: z-order buys price pruning the
    // date-clustered layout cannot deliver
    assert(rows(("zorder", "price_band"))._1 > rows(("date", "price_band"))._1)
  }
}
