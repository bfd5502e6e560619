package graft

import graft.queries.Retrieval
import org.apache.spark.sql.functions._

/** q114 BM25 and q115 TF-IDF cosine pairs against driver-side
  * brute-force recomputations of the same definitions (same JVM libm,
  * so the float paths are bit-comparable).
  */
class RetrievalSpec extends SparkSpec {

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  test("q114 BM25 scores match a driver-side brute-force recompute") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
    val nDocs = docs.length.toLong
    val totalLen = docs.map(_._2.length.toLong).sum
    val expected = docs.map { case (id, tk) =>
      val dl = tk.length
      val score = Retrieval.BM25_TERMS.map { t =>
        val tf = tk.count(_ == t)
        val df = docs.count(_._2.contains(t)).toLong
        val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
        val norm = tf + 1.2 * (0.25 + 0.75 * dl * nDocs / totalLen.toDouble)
        math.floor(idf * (tf * 2.2) / norm * 1e6 + 0.5).toLong
      }.sum
      (id, dl.toLong, score)
    }.sortBy { case (id, _, s) => (-s, id) }.take(Retrieval.BM25_TOP)

    val got = Retrieval.q114Bm25TopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("q115 TF-IDF cosine pairs match a brute-force recompute") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = Retrieval.TFIDF_SHINGLE_N
    def grams(text: String): Seq[String] =
      (1 to math.max(text.length - (n - 1), 1))
        .map(i => text.slice(i - 1, i - 1 + n))
    val tf: Map[(Long, String), Long] = docs
      .flatMap { case (id, t) => grams(t).map(g => (id, g)) }
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val df: Map[String, Long] =
      tf.keys.toSeq.map(_._2).groupBy(identity).map { case (g, v) => (g, v.length.toLong) }
    val nDocs = docs.length.toLong
    val w: Map[(Long, String), Long] = tf.map { case ((id, g), f) =>
      ((id, g), f * math.floor(math.log(nDocs.toDouble / df(g)) * 1e6 + 0.5).toLong)
    }
    val byDoc: Map[Long, Map[String, Long]] =
      w.groupBy(_._1._1).map { case (id, m) =>
        (id, m.map { case ((_, g), x) => (g, x) })
      }
    val n2: Map[Long, Long] =
      byDoc.map { case (id, m) => (id, m.values.map(x => x * x).sum) }
    val rare = w.keys.filter { case (_, g) => df(g) <= Retrieval.TFIDF_DF_MAX }
    val cand = (for {
      (a, g) <- rare
      (b, g2) <- rare
      if g == g2 && a < b
    } yield (a, b)).toSet
    val expected = cand.toSeq.sorted.map { case (a, b) =>
      val ma = byDoc(a); val mb = byDoc(b)
      val shared = ma.keySet.intersect(mb.keySet)
      val dot = shared.toSeq.map(g => ma(g) * mb(g)).sum
      val cos = math.floor(dot.toDouble /
        (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble)) * 1e6 + 0.5).toLong
      (a, b, shared.size.toLong, cos)
    }
    val got = Retrieval.q115TfidfPairs(spark, sfDir)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q114 plan: top-k is TakeOrderedAndProject, stats broadcast") {
    val df = Retrieval.q114Bm25TopK(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), "expected heap-based top-k, not a global sort")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "expected the 1-row stats frame to broadcast")
  }

  test("q115 candidates never cross the rare-shingle bound") {
    val pairs = Retrieval.q115TfidfPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    // every pair genuinely shares at least one shingle
    pairs.foreach { r => assert(r.getLong(2) >= 1) }
  }

  test("q203 fuses both rankers with exact RRF arithmetic") {
    val rows = Retrieval.q203RrfFusion(spark, sfDir).collect()
    // every query emits exactly RRF_TOP rows, ranks 1..RRF_TOP
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === Retrieval.RRF_QUERIES)
    byQuery.values.foreach { qs =>
      assert(qs.map(_.getAs[Int]("rank")).sorted.toSeq ===
        (1 to Retrieval.RRF_TOP))
      // fused scores weakly decrease with rank (ties broken by vec_id)
      val ordered = qs.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("rrf_micro"))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rankers")
      assert(n === 1L || n === 2L)
      // a candidate's score is bounded by n perfect rank-1 contributions
      assert(r.getAs[Long]("rrf_micro") <=
        n * math.floor(1e6 / (Retrieval.RRF_K + 1)).toLong)
    }
  }
}
