package graft

import org.apache.spark.sql.functions._

/** Round-6 batch-17 specs: TPC-H Q9 profit shape, matryoshka
  * truncation recall, Flesch readability, cohort LTV (q283-q286),
  * each against an independent driver-side re-derivation on sf0.001.
  */
class Batch17Spec extends SparkSpec {

  test("q283 equals a driver-side decimal-exact profit rollup") {
    import graft.queries.TpchShapes
    val got = TpchShapes.q283ProductProfit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val t = Tables(spark, sfDir)
    val parts = t.part.filter(col("p_name").contains(TpchShapes.PROFIT_TOKEN))
      .select("p_partkey", "p_retailprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val orderYear = t.orders.select("o_orderkey", "o_orderdate").collect()
      .map { r =>
        val c = java.util.Calendar.getInstance()
        c.setTime(r.getTimestamp(1)); r.getLong(0) -> (c.get(java.util.Calendar.YEAR))
      }.toMap
    val suppNat = t.supplier.select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val natName = t.nation.select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val lines = t.lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount").collect()
      .flatMap { r =>
        parts.get(r.getLong(1)).map { rp =>
          val profit = r.getDouble(4) * (1.0 - r.getDouble(5)) -
            TpchShapes.COST_FRAC * rp * r.getDouble(3)
          ((natName(suppNat(r.getLong(2))), orderYear(r.getLong(0))), profit)
        }
      }
    val want = lines.groupBy(_._1).map { case (k, xs) =>
      val sum = xs.map(x => BigDecimal(x._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      k -> ((xs.length.toLong, sum.toDouble))
    }
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q284 equals driver-side full-vs-truncated cosine recall") {
    import graft.queries.EmbeddingOps
    val got = EmbeddingOps.q284MatryoshkaRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val embs = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def topk(q: Long, d: Int): Set[Long] = {
      val qe = embs(q)
      embs.toSeq.filter(_._1 != q)
        .map { case (id, e) => (cos(qe, e, d), id) }
        .sortBy { case (s, id) => (-s, id) }
        .take(EmbeddingOps.TOP_K).map(_._2).toSet
    }
    val want = (0L until EmbeddingOps.NUM_QUERIES.toLong).map { q =>
      q -> (topk(q, embs(q).length) & topk(q, EmbeddingOps.TRUNC_DIM)).size.toLong
    }.toMap
    assert(got === want)
    // truncation must neither be perfect everywhere nor useless
    assert(got.values.sum > 0 &&
      got.values.sum < EmbeddingOps.NUM_QUERIES.toLong * EmbeddingOps.TOP_K)
  }

  test("q285 equals a driver-side Flesch computation") {
    val got = graft.queries.LlmText.q285Readability(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def cnt(s: String, p: String): Long =
      p.r.findAllMatchIn(s).length.toLong
    val want = docs.map { case (id, text) =>
      val w = cnt(text.toLowerCase, "[a-z]+")
      val s = math.max(cnt(text, "[.!?]+"), 1L)
      val y = cnt(text.toLowerCase, "[aeiouy]+")
      val f = if (w == 0) None
        else Some(206.835 - 1.015 * (w.toDouble / s) - 84.6 * (y.toDouble / w))
      id -> ((w, s, y, f))
    }.toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q286 equals a driver-side cohort-triangle rollup") {
    val got = graft.queries.Relational.q286CohortLtv(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val orders = Tables(spark, sfDir).orders
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val c = java.util.Calendar.getInstance()
        c.setTime(r.getTimestamp(1))
        (r.getLong(0),
          c.get(java.util.Calendar.YEAR) * 12 + c.get(java.util.Calendar.MONTH) + 1,
          r.getDouble(2))
      }
    val firstM = orders.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
    def label(m: Int): String = f"${(m - 1) / 12}%04d-${(m - 1) % 12 + 1}%02d"
    val want = orders.groupBy { case (cust, m, _) =>
      (label(firstM(cust)), (m - firstM(cust)).toLong)
    }.map { case (k, xs) =>
      val ltv = xs.map(x => BigDecimal(x._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      k -> ((xs.length.toLong, xs.map(_._1).distinct.length.toLong, ltv.toDouble))
    }
    assert(got === want)
    // the triangle must have depth: some cohort older than one month
    assert(got.keys.exists(_._2 > 0))
  }
}
