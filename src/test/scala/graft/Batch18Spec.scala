package graft

import org.apache.spark.sql.functions._

/** Round-6 batch-18 specs: vocab coverage ladder, correlated scalar
  * subqueries, CSV round-trip, real image resize (q287-q290), each
  * against an independent driver-side re-derivation on sf0.001.
  */
class Batch18Spec extends SparkSpec {

  test("q287 equals a driver-side bigram coverage ladder") {
    import graft.queries.LlmText
    val got = LlmText.q287VocabCoverage(spark, sfDir).collect()
      .map(r => r.getAs[Number](0).longValue() ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val texts = Tables(spark, sfDir).documents
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    texts.foreach { t =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ws.sliding(2).filter(_.length == 2)
        .foreach(p => counts(p.mkString(" ")) += 1)
    }
    val ranked = counts.toSeq.sortBy { case (tok, n) => (-n, tok) }
    val total = ranked.map(_._2).sum
    val vocab = ranked.size.toLong
    val cums = ranked.map(_._2).scanLeft(0L)(_ + _).tail
    val want = LlmText.COVERAGE_CUTS.map { cut =>
      val at = math.min(cut, vocab).toInt
      val covered = cums(at - 1)
      cut -> ((vocab, covered, total,
        math.floor(covered * 1000000L / total.toDouble).toLong))
    }.toMap
    assert(got === want)
    // the ladder must be monotone and end clamped at full coverage
    assert(got(LlmText.COVERAGE_CUTS.max)._2 == total)
  }

  test("q288 equals a driver-side correlated-lookup recompute") {
    val got = graft.queries.SqlSurface.q288CorrelatedScalar(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val lines = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_extendedprice", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .groupBy(_._1)
    val want = Tables(spark, sfDir).orders
      .filter(col("o_totalprice") > 150000.0)
      .select("o_orderkey").collect().map(_.getLong(0))
      .map { k =>
        val ls = lines.getOrElse(k, Array.empty[(Long, Double, String)])
        val maxC = if (ls.isEmpty) -1L
          else math.floor(ls.map(_._2).max * 100 + 0.5).toLong
        k -> ((ls.length.toLong, maxC, ls.exists(_._3 == "R")))
      }.toMap
    assert(got === want)
    // COUNT over an empty correlated set must be 0, never NULL
    assert(got.values.forall(_._1 >= 0L))
  }

  test("q289 equals documents plus the four known CSV constants") {
    val got = graft.queries.CorpusOps.q289CsvRoundtrip(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val base = Tables(spark, sfDir).documents
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).length.toLong))
      .groupBy(_._1)
      .map { case (s, xs) => s -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val want = base ++ Map(
      "zz_quoted \"src\"" -> ((1L, "comma, separated text".length.toLong)),
      "zz_websrc" -> ((1L, "multi word, text".length.toLong)),
      "_corrupt" -> ((2L, 0L)))
    assert(got === want)
  }

  test("q291 equals driver-side different-label nearest negatives") {
    import graft.queries.EmbeddingOps
    val got = graft.queries.EmbeddingOps.q291HardNegatives(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getInt(3), r.getInt(4)))).toMap
    val embs = Tables(spark, sfDir).embeddings
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = embs.filter(_._1 < EmbeddingOps.NUM_QUERIES).flatMap {
      case (aid, albl, aemb) =>
        embs.filter(_._2 != albl)
          .map { case (id, lbl, e) => (cos(aemb, e), id, lbl) }
          .sortBy { case (s, id, _) => (-s, id) }
          .take(EmbeddingOps.HARD_NEG_K)
          .zipWithIndex
          .map { case ((_, id, lbl), i) =>
            (aid, i + 1L) -> ((id, albl, lbl)) }
    }.toMap
    assert(got === want)
    // negatives must really cross the label boundary
    assert(got.values.forall { case (_, a, n) => a != n })
  }

  test("q292 equals driver-side first/last-in-time-order bars") {
    val got = graft.queries.TemporalOps.q292OhlcBars(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))).toMap
    val fmtH = new java.text.SimpleDateFormat("yyyy-MM-dd HH")
    fmtH.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val ev = Tables(spark, sfDir).events
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val want = ev.groupBy { case (t, ts, _, _) => (t, fmtH.format(ts)) }
      .map { case (k, xs) =>
        val ordered = xs.sortBy { case (_, ts, id, _) =>
          (ts.getTime * 1000 + ts.getNanos / 1000 % 1000, id) }
        k -> ((ordered.head._4, xs.map(_._4).max, xs.map(_._4).min,
          ordered.last._4, xs.length.toLong))
      }
    assert(got === want)
    assert(got.nonEmpty && got.values.exists(v => v._1 != v._4))
  }

  test("q293 assigns whole clusters to one split via the md5 bucket") {
    import graft.queries.DedupOps
    val got = DedupOps.q293GroupedSplit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // cluster labels from the independently-gated q53 result
    val clusters = DedupOps.q53DupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def bucket(c: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"gsplit:$c".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(d, 16) % 100
    }
    def split(c: Long): String = {
      val b = bucket(c)
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val want = clusters.groupBy { case (_, c) => split(c) }
      .map { case (s, xs) =>
        s -> ((xs.length.toLong, xs.map(_._2).distinct.length.toLong, 0L)) }
    assert(got === want)
    // every cluster is wholly inside one split (reported AND re-checked)
    assert(got.values.forall(_._3 == 0L))
    val span = clusters.groupBy(_._2)
      .values.map(xs => xs.map(x => split(x._2)).distinct.size)
    assert(span.forall(_ == 1))
  }

  test("q294 equals a driver-side NDCG from the gated q30/q31 cuts") {
    import graft.queries.{EmbeddingOps, VectorOps}
    val got = VectorOps.q294NdcgEval(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val exact = EmbeddingOps.q30EmbeddingTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val approx = EmbeddingOps.q31LshAnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val idcg = (1 to EmbeddingOps.TOP_K).map(VectorOps.ndcgDiscountMicro).sum
    val want = approx.groupBy(_._1).map { case (q, xs) =>
      val dcg = xs.filter(x => exact.getOrElse(q, Set.empty).contains(x._3))
        .map(x => VectorOps.ndcgDiscountMicro(x._2)).sum
      q -> ((dcg, idcg, math.floor(dcg * 1000000L / idcg.toDouble).toLong))
    }
    assert(got === want)
    // the index is good but not perfect on this corpus: NDCG in (0, 1)
    val mean = got.values.map(_._3).sum / got.size
    assert(mean > 0L && mean < 1000000L)
  }

  test("q295 sketch overlap matches exact intersections within bound") {
    val got = graft.queries.CorpusOps.q295HllOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    val pu = Tables(spark, sfDir).events
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = pu.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    val want = (for {
      i <- types.indices; j <- i + 1 until types.length
      a = types(i); b = types(j)
      n = (byType(a) & byType(b)).size.toLong
      if n > 0
    } yield (a, b) -> n).toMap
    assert(got.view.mapValues(_._1).toMap === want)
    // at spec cardinalities the HLL is in exact sparse mode: every
    // inclusion-exclusion estimate must sit inside the stated bound
    assert(got.values.forall(_._2), "sketch overlap outside 3-SE bound")
    assert(got.size == types.combinations(2).size)
  }

  test("q290 resize stats equal the synthesis formula at even coords") {
    val got = graft.queries.LlmText.q290ImageResize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getInt(6)))).toMap
    val ids = Tables(spark, sfDir).documents
      .select("doc_id").collect().map(_.getLong(0))
    val want = ids.map { id =>
      val w = (id % 13 + 4).toInt; val h = (id % 7 + 3).toInt
      val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
      val px = for (y <- 0 until h2; x <- 0 until w2)
        yield graft.operators.ImageCodec.synthPixel(id, 2 * x, 2 * y)
      id -> ((w2, h2, w2.toLong * h2, px.map(_.toLong).sum, px.min, px.max))
    }.toMap
    assert(got === want)
  }
}
