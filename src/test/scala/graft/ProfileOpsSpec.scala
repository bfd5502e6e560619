package graft

import graft.queries.ProfileOps
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkSpec {

  test("every profile query has an oracle and runs non-empty") {
    ProfileOps.queries.foreach { case (name, fn) =>
      assert(ProfileOps.oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q191 p50 <= p95 and counts cover all events") {
    val df = ProfileOps.q191HourlyP95(spark, sfDir)
    assert(df.filter(col("p50") > col("p95")).count() === 0)
    assert(df.agg(sum("n")).head.getLong(0) ===
      Tables(spark, sfDir).events.count())
  }

  test("q192 containment equals a driver-side set computation") {
    val sets = Tables(spark, sfDir).documents
      .select(col("source"), graft.plans.ShingleHashSet(col("text"),
        graft.queries.DedupOps.SHINGLE_N).as("sh"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.flatMap(_.getSeq[Long](1)).toSet }
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      inter = (sa & sb).size if inter > 0
    } yield (a, b) ->
      (inter.toLong, math.floor(inter * 1e6 / sa.size + 0.5).toLong)).toMap
    val got = ProfileOps.q192SourceContainment(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
  }

  test("q193 bins tile the range: counts total n, bins are dense-ish") {
    val rows = ProfileOps.q193FdHistogram(spark, sfDir).collect()
    val n = Tables(spark, sfDir).orders.count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === n)
    val width = rows.map(_.getAs[Long]("width_c")).distinct
    assert(width.length === 1 && width.head >= 1L)
    // bin 0 exists (contains v_min)
    assert(rows.exists(_.getAs[Long]("bin") === 0L))
  }

  test("q216 equi-depth buckets follow the ntile rule with ordered bounds") {
    val rows = ProfileOps.q216EquiDepthHist(spark, sfDir)
      .orderBy("bucket").collect()
    assert(rows.length === ProfileOps.EQD_BUCKETS)
    val n = Tables(spark, sfDir).lineitem.count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === n)
    // SQL-standard ntile: first (n % k) buckets get one extra row
    val base = n / ProfileOps.EQD_BUCKETS; val rem = n % ProfileOps.EQD_BUCKETS
    rows.zipWithIndex.foreach { case (r, i) =>
      val want = if (i < rem) base + 1 else base
      assert(r.getAs[Long]("n_rows") === want, s"bucket ${i + 1} size")
    }
    // bounds are monotone: bucket k's hi <= bucket k+1's lo
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_c") <= b.getAs[Long]("lo_c"))
      case _ =>
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("lo_c") <= r.getAs[Long]("hi_c") &&
        r.getAs[Long]("ndv") >= 1L))
  }

  test("q218 crossing count is minimal and sufficient per source") {
    val docs = Tables(spark, sfDir).documents
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = ProfileOps.q218ParetoConcentration(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("docs_for_80pct"))).toMap
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val sizes = xs.map(_._2).sorted.reverse
      val total = sizes.sum
      val (nDocs, k) = got(src)
      assert(nDocs === sizes.length.toLong)
      // k docs reach 80%, k-1 do not (minimality)
      assert(sizes.take(k.toInt).sum * ProfileOps.PARETO_DEN >=
        total * ProfileOps.PARETO_NUM, s"$src: $k insufficient")
      assert(k === 1L || sizes.take(k.toInt - 1).sum * ProfileOps.PARETO_DEN <
        total * ProfileOps.PARETO_NUM, s"$src: ${k - 1} already sufficient")
    }
  }
}
