package graft

import org.apache.spark.sql.functions._

/** Round-6 batch-14 specs: string/regex surface parity, hop-bounded
  * BFS, table-version diff, right-to-forget audit (q269-q273). Each is
  * checked against an independent driver-side re-derivation on the
  * tiny sf0.001 tables.
  */
class Batch14Spec extends SparkSpec {

  test("q269 string surface matches JVM string ops row-by-row") {
    val got = graft.queries.SqlSurface.q269StringSurface(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val names = Tables(spark, sfDir).part
      .filter(col("p_partkey") % 7 === 0)
      .select("p_partkey", "p_name", "p_brand", "p_type")
      .collect()
    assert(names.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    names.foreach { r =>
      val (k, n) = (r.getLong(0), r.getString(1))
      val row = got(k)
      assert(row.getAs[Long]("name_len") === n.length.toLong)
      assert(row.getAs[String]("name_up") === n.toUpperCase)
      assert(row.getAs[Long]("first_space") === (n.indexOf(' ') + 1).toLong)
      val words = n.split(" ")
      assert(row.getAs[String]("w1") === words.headOption.getOrElse(""))
      assert(row.getAs[String]("w1_rev") ===
        words.headOption.getOrElse("").reverse)
      val w2 = if (words.length > 1) words(1) else ""
      assert(row.getAs[Long]("lev_widget") === lev(w2, "widget").toLong)
      assert(row.getAs[String]("key_pad") === f"$k%08d")
      assert(row.getAs[String]("name_tr") ===
        n.map(c => if ("aeiou".contains(c)) c.toUpper else c))
      assert(row.getAs[String]("brand_type") ===
        s"${r.getString(2)}|${r.getString(3)}")
      val md = java.security.MessageDigest.getInstance("MD5")
      assert(row.getAs[String]("name_md5") ===
        md.digest(n.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
  }

  test("q270 regex surface matches java.util.regex re-derivation") {
    val got = graft.queries.SqlSurface.q270RegexSurface(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val docs = Tables(spark, sfDir).documents
      .filter(col("doc_id") % 5 === 0).select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    def count(re: String, s: String): Long = {
      val m = java.util.regex.Pattern.compile(re).matcher(s)
      var n = 0L; while (m.find()) n += 1; n
    }
    docs.foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      val row = got(id)
      assert(row.getAs[Long]("n_a_words") === count("\\ba[a-z]*", t))
      assert(row.getAs[Long]("n_ss") === count("[a-z]*ss[a-z]*", t))
      assert(row.getAs[Long]("scrub_len") ===
        t.replaceAll("[aeiou]+", "#").length.toLong)
      val fl = java.util.regex.Pattern.compile("\\b([a-z]{6,})\\b").matcher(t)
      assert(row.getAs[String]("first_long") ===
        (if (fl.find()) fl.group(1) else ""))
    }
  }

  test("q271 BFS distances equal a driver-side BFS on the same edges") {
    import graft.queries.GraphOps
    val got = GraphOps.q271BfsHops(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the co-purchase edge list independently
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
    // pair support counts LINEITEM pair instances (the self-join's
    // count(*)), so duplicate partkeys within an order multiply
    val pairSup = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    byOrder.foreach { rows =>
      val cnt = rows.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
      val keys = cnt.keys.toArray.sorted
      for (i <- keys.indices; j <- i + 1 until keys.length)
        pairSup((keys(i), keys(j))) += cnt(keys(i)) * cnt(keys(j))
    }
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    pairSup.foreach { case ((u, v), sup) =>
      if (sup >= GraphOps.TRIANGLE_MIN_SUPPORT) { adj(u) += v; adj(v) += u }
    }
    val nodes = adj.keySet
    var dist = nodes.filter(_ % GraphOps.BFS_SEED_MOD == 0)
      .map(_ -> 0L).toMap
    var frontier = dist.keySet
    for (h <- 1 to GraphOps.BFS_MAX_HOPS) {
      val next = frontier.flatMap(adj).diff(dist.keySet)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    assert(got === dist)
  }

  test("q272 diff classes reconcile with the version-derivation rules") {
    val rows = graft.queries.MaintOps.q272TableDiff(spark, sfDir).collect()
    val byStatus = rows.groupBy(_.getString(1))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("n")).sum }
    val orders = Tables(spark, sfDir).orders
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(byStatus("removed") === orders.count(_ % 53 == 0).toLong)
    assert(byStatus.getOrElse("changed", 0L) ===
      orders.count(k => k % 53 != 0 && k % 41 == 0).toLong)
    assert(byStatus.values.sum === orders.length.toLong)
    // repricing is +1% floored: delta must be non-negative, and zero
    // exactly for removed/same rows
    rows.foreach { r =>
      val d = r.getAs[Long]("delta_c")
      if (r.getString(1) == "changed") assert(d >= 0L)
      else assert(d === 0L)
    }
  }

  test("q273 purge audit equals driver-side joins over collected keys") {
    val got = graft.queries.OpsAnalytics.q273ForgetAudit(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val purge = Tables(spark, sfDir).customer.select("c_custkey").collect()
      .map(_.getLong(0)).filter(_ % graft.queries.OpsAnalytics.PURGE_MOD == 0)
      .toSet
    val orders = Tables(spark, sfDir).orders
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ordersHit = orders.filter(o => purge(o._2))
    val hitOrderKeys = ordersHit.map(_._1).toSet
    val custOfOrder = ordersHit.toMap
    val liHit = Tables(spark, sfDir).lineitem.select("l_orderkey").collect()
      .map(_.getLong(0)).filter(hitOrderKeys)
    assert(got("customer") === ((purge.size.toLong, purge.size.toLong)))
    assert(got("orders") ===
      ((ordersHit.length.toLong, ordersHit.map(_._2).distinct.length.toLong)))
    assert(got("lineitem") ===
      ((liHit.length.toLong,
        liHit.map(custOfOrder).distinct.length.toLong)))
  }
}
