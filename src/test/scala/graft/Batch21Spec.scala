package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-21 specs: sized semantic dedup, FIM transform, array
  * set-algebra surface, local clustering coefficient (q313–q316) —
  * independent driver-side re-derivations on sf0.001.
  */
class Batch21Spec extends SparkSpec {

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Driver-side SemDeDup recompute under an arbitrary cell count —
    * shared by the q63 (sized) and q313 (fixed-cell control) specs.
    */
  private def semDedupRecompute(cells: Long): Map[Long, (Long, Long, Boolean)] = {
    import graft.queries.VectorOps.SEM_MIN_SIM
    val embs = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    val cents = embs.filter(_._1 < cells)
    val assigned = embs.map { case (v, e) =>
      v -> cents.map { case (c, ce) => (c, cosine(ce, e)) }
        .maxBy { case (c, s) => (s, -c) }._1
    }.toMap
    val pairs = for {
      (a, ea) <- embs; (b, eb) <- embs
      if a < b && assigned(a) == assigned(b) && cosine(ea, eb) >= SEM_MIN_SIM
    } yield (a, b)
    // union-find over the verified pairs
    val parent = scala.collection.mutable.Map(embs.map(e => e._1 -> e._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    val cluster = embs.map { case (v, _) =>
      v -> embs.collect { case (u, _) if find(u) == find(v) => u }.min
    }.toMap
    val sizes = cluster.values.groupBy(identity).view.mapValues(_.size.toLong)
    embs.map { case (v, _) =>
      v -> ((cluster(v), sizes(cluster(v)), v == cluster(v)))
    }.toMap
  }

  test("q63 equals a driver-side sized-quantizer dedup recompute") {
    import graft.queries.VectorOps.SEM_TARGET_POP
    val got = graft.queries.VectorOps.q63SemanticDedup(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val n = Tables(spark, sfDir).embeddings.count()
    val cells = Iterator.iterate(1L)(_ * 2)
      .find(p => p * SEM_TARGET_POP >= n).get
    // the quantizer must actually size with the corpus
    assert(cells * SEM_TARGET_POP >= n && cells <= n.max(1))
    assert(got === semDedupRecompute(cells))
  }

  test("q313 control equals the same recompute under fixed cells") {
    import graft.queries.VectorOps.SEM_CELLS
    val got = graft.queries.VectorOps.q313FixedcellControl(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === semDedupRecompute(SEM_CELLS.toLong))
  }

  test("q314 equals a codepoint-exact driver-side FIM recompute") {
    val got = graft.queries.TrainPrep.q314FimSplit(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect().map { r =>
        // Spark length()/substring() are CODEPOINT-based; Scala String
        // indexing is UTF-16 — recompute over the codepoint array so
        // astral chars can't silently diverge the oracle
        val cps = r.getString(1).codePoints.toArray
        val nn = cps.length
        val p1 = nn / 3; val p2 = 2 * nn / 3
        def seg(from: Int, until: Int) = new String(cps, from, until - from)
        val psm = "<PRE>" + seg(0, p1) + "<SUF>" + seg(p2, nn) +
          "<MID>" + seg(p1, p2)
        val h = md.digest(psm.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        r.getLong(0) -> (((p1: Long), (p2 - p1: Long), (nn - p2: Long), h))
      }.toMap
    assert(got === want)
  }

  test("q315 equals a driver-side set-algebra recompute") {
    val got = graft.queries.SqlSurface.q315ArraySurface(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6), r.getLong(7), r.getLong(8)))).toMap
    val rows = Tables(spark, sfDir).lineitem
      .join(Tables(spark, sfDir).orders,
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_custkey"), col("l_partkey"),
        (month(col("o_orderdate")) <= 6).as("h1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
      val a = rs.filter(_._3).map(_._2).toSet
      val b = rs.filterNot(_._3).map(_._2).toSet
      if (a.isEmpty || b.isEmpty) None
      else {
        val inter = a intersect b
        val fc = if (inter.isEmpty) -1L else inter.min
        val pos =
          if (inter.isEmpty) 0L
          else a.toSeq.sorted.indexOf(inter.min).toLong + 1
        Some(c -> ((a.size.toLong, b.size.toLong, inter.size.toLong,
          (a diff b).size.toLong, (a union b).size.toLong,
          inter.nonEmpty, fc, pos)))
      }
    }
    assert(got === want)
  }

  test("q316 equals a driver-side adjacency-set recompute") {
    import graft.queries.GraphOps.TRIANGLE_MIN_SUPPORT
    val got = graft.queries.GraphOps.q316ClusteringCoeff(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // pair support counts lineitem ROW combinations (the query's
    // self-join semantics — a part appearing twice in an order
    // contributes multiplicity), not distinct parts per order
    val edges = li.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val ps = rs.map(_._2).toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity)
      // NOT `.collect { case (e, os) if ... => e }`: collect on a Map
      // yielding (u, v) tuples rebuilds a MAP and silently dedupes
      // edges by their first endpoint (2452 -> 189 here)
      .filter(_._2.size >= TRIANGLE_MIN_SUPPORT).keySet
    val adj = (edges.toSeq.flatMap(e => Seq(e, e.swap)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = adj.map { case (v, nb) =>
      val d = nb.size.toLong
      val t = nb.toSeq.map(u => (nb intersect adj(u)).size.toLong).sum / 2
      val q = d * (d - 1)
      val c = if (d >= 2) (4 * t * 1000000L + q) / (2 * q) else 0L
      v -> ((d, t, c))
    }
    assert(got === want)
    // sanity: the coefficient is a probability in micro units
    assert(want.values.forall(v => v._3 >= 0L && v._3 <= 1000000L))
  }
}
