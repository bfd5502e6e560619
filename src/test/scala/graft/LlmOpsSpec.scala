package graft

import graft.operators.{MediaRecord, MultimodalStub}
import graft.queries.{DedupOps, EmbeddingOps, LlmText, SessionOps}
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {

  test("every llm query has an oracle and runs non-empty") {
    val all = LlmText.queries ++ DedupOps.queries ++ EmbeddingOps.queries ++ SessionOps.queries
    val oracles = LlmText.oracles ++ DedupOps.oracles ++ EmbeddingOps.oracles ++ SessionOps.oracles
    all.foreach { case (name, fn) =>
      assert(oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("simhash of texts shorter than one shingle is 0, not all-ones") {
    import spark.implicits._
    val df = Seq("ab", "", "x", "1234").toDF("text")       // all < SHINGLE_N = 5
    val fps = df.select(
      graft.plans.SimHashFingerprint(col("text"), DedupOps.SHINGLE_N, 32).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps.forall(_ == 0L),
      "short text must fingerprint to 0 (matches HOF variant and oracle)")
  }

  test("q111 samples stride-spaced REALLY-decoded frames with exact sums") {
    import graft.operators.ImageCodec
    val rows = LlmText.q111MediaFrames(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, f) = (r.getAs[Int]("n_frames"), r.getAs[Int]("frame_idx"))
      assert(n == (id % 5 + 1).toInt, "container frame count")
      assert(f < n && f % LlmText.FRAME_STRIDE == 0)
      val (w, h) = ((id % 9 + 3).toInt, (id % 5 + 2).toInt)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      val seed = id * 31 + f
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield ImageCodec.synthPixel(seed, x, y).toLong).sum
      assert(r.getAs[Long]("px_sum") == want, s"pixel sum doc=$id frame=$f")
    }
    // every medium contributes its frame 0
    val docs = Tables(spark, sfDir).documents.count()
    assert(rows.count(_.getAs[Int]("frame_idx") == 0) == docs)
  }

  test("winnow_fingerprint equals a brute-force window scan incl. rightmost ties") {
    import spark.implicits._
    val k = 3
    val w = 4
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def brute(t: String): (Long, Long, String) = {
      val m = t.length - k + 1
      val grams = (0 until m).map(i => md5hex(t.substring(i, i + k)))
      val sels = (0 to m - w).map { s =>
        val win = (s until s + w)
        val minH = win.map(grams).min
        val sel = win.filter(i => grams(i) == minH).max // rightmost minimal
        (sel + 1, grams(sel))
      }.distinct.sortBy(_._1)
      val dig = md5hex(sels.map { case (p, h) => s"$p:$h" }.mkString(","))
      (m.toLong, sels.size.toLong, dig)
    }
    val texts = Seq(
      "abcabcabcabc",  // repeated grams: the rightmost-min tie rule decides
      "zyxwvutsrqpon", // distinct grams
      "aaaaaaaaaa",    // ALL grams equal: every window picks its last slot
      "abcdef")        // exactly k+w-1 chars -> a single window
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), graft.plans.WinnowFingerprint(col("text"), k, w).as("wf"))
      .select(col("id"), col("wf.n_grams"), col("wf.n_fp"), col("wf.fp_digest"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === brute(t), s"text #$i: '$t'")
    }
  }

  test("HyperplaneBuckets equality includes the weight matrix") {
    // Catalyst subexpression elimination substitutes expressions that
    // compare equal; two instances with identical (tables, planes)
    // config but DIFFERENT hyperplanes must not be interchangeable.
    import graft.plans.HyperplaneBuckets
    val child = org.apache.spark.sql.GraftBridge.expression(col("emb"))
    val w1 = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val w2 = Array(Array(1.0, 2.0), Array(3.0, -4.0))
    val a = HyperplaneBuckets(child, w1, 1, 2)
    val b = HyperplaneBuckets(child, w1.map(_.clone()), 1, 2)
    val c = HyperplaneBuckets(child, w2, 1, 2)
    assert(a == b && a.hashCode == b.hashCode,
      "content-equal weights must compare equal (by value, not identity)")
    assert(a != c, "differing weights must break equality")
  }

  test("q26 keeps one id per content hash and covers all docs") {
    val d = LlmText.q26DedupExact(spark, sfDir)
    val total = d.agg(sum("n_copies")).collect().head.getLong(0)
    assert(total == Tables(spark, sfDir).documents.count())
    assert(d.groupBy("content_md5").count().filter(col("count") > 1).count() == 0)
  }

  test("q27 minhash candidates include all true near-dup pairs (recall vs q29)") {
    val cand = DedupOps.q27MinhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = DedupOps.q29NgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "expected planted near-dup pairs in the corpus")
    val missed = truth -- cand
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: $missed")
  }

  test("q28 simhash of near-identical docs differs in few bits") {
    val fp = DedupOps.q28Simhash(spark, sfDir)
      .select("doc_id", "simhash32").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupOps.q29NgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect()
    pairs.foreach { r =>
      val d = java.lang.Long.bitCount(fp(r.getLong(0)) ^ fp(r.getLong(1)))
      assert(d <= 6, s"near-dup pair ${r.getLong(0)},${r.getLong(1)} hamming $d > 6")
    }
  }

  test("q94 REAL decode pixel stats equal a driver-side formula replay") {
    import graft.operators.ImageCodec
    val want = Tables(spark, sfDir).documents
      .select("doc_id").collect().map { r =>
        val id = r.getLong(0)
        val (w, h) = ((id % 13 + 4).toInt, (id % 7 + 3).toInt)
        val px = for (y <- 0 until h; x <- 0 until w)
          yield ImageCodec.synthPixel(id, x, y)
        (id, w, h, w.toLong * h, px.map(_.toLong).sum, px.min, px.max)
      }.toSet
    val got = LlmText.q94MediaDecode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getInt(6))).toSet
    assert(got == want)
  }

  test("q83 finds exactly the brute-force Hamming<=HAM_MAX pairs") {
    val fp = DedupOps.q28Simhash(spark, sfDir)
      .select("doc_id", "simhash32").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // brute-force truth over all pairs (500 docs at spec scale)
    val truth = (for {
      (a, fa) <- fp; (b, fb) <- fp if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= DedupOps.HAM_MAX
    } yield (a, b, java.lang.Long.bitCount(fa ^ fb).toLong)).toSet
    val got = DedupOps.q83SimhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth,
      s"banding must be exhaustive: missing ${truth -- got}, extra ${got -- truth}")
  }

  test("q30 neighbors are ranked by true cosine similarity") {
    val emb = Tables(spark, sfDir).embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    EmbeddingOps.q30EmbeddingTopk(spark, sfDir).collect()
      .groupBy(_.getLong(0)).foreach { case (q, rows) =>
        val sims = rows.sortBy(_.getInt(1)).map(r => cos(emb(q), emb(r.getLong(2))))
        assert(sims.zip(sims.tail).forall { case (a, b) => a >= b - 1e-12 },
          s"ranks for query $q not ordered by similarity")
      }
  }

  test("q31 LSH ANN achieves reasonable recall@5 vs exact q30") {
    val exact = EmbeddingOps.q30EmbeddingTopk(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val approx = EmbeddingOps.q31LshAnn(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, t) =>
      approx.get(q).map(a => (a & t).size.toDouble / t.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.5, f"mean recall@5 $mean%.2f too low for 8-table LSH")
  }

  test("q40 near-dup pairs are exactly the bucket-colliding pairs above threshold") {
    val got = EmbeddingOps.q40EmbeddingNeardup(spark, sfDir).collect()
    assert(got.nonEmpty, "expected some near-dup pairs at the chosen threshold")
    // every emitted pair really is above threshold with correct exact cosine
    val emb = Tables(spark, sfDir).embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(a < b, "pairs must be ordered")
      val sim = cos(emb(a), emb(b))
      assert(math.abs(sim - r.getAs[Double]("sim")) < 1e-9)
      assert(sim >= EmbeddingOps.NEARDUP_MIN_SIM)
    }
  }

  test("q41 IVF neighbors come from probed cells and rank by true cosine") {
    val got = EmbeddingOps.q41IvfAnn(spark, sfDir).collect()
    assert(got.nonEmpty)
    // per query: ranks are 1..k dense and no self-matches
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"ranks not dense for query $q")
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
    }
    // IVF recall vs exact top-k: probing 2 of 8 cells must find a
    // nontrivial share of the true neighbors
    val exact = EmbeddingOps.q30EmbeddingTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = got.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.2, s"IVF recall@5 $recall too low")
  }

  test("connected components label multi-hop chains with the component min") {
    import spark.implicits._
    // 1-2-3-4 is a diameter-3 chain (forces >1 propagation round);
    // 10-11 a separate component; 7-7 a self-loop singleton.
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (7L, 7L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.ConnectedComponents
      .components(edges, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 7L -> 7L))
  }

  test("q53 clusters are transitively consistent with q27 pairs") {
    val pairs = DedupOps.q27MinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = DedupOps.q53DupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every candidate pair landed in one cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster ids are component minima: the label is a member and <= all members
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.contains(cid) && members.keySet.min == cid)
    }
    // exactly one keep per cluster, sizes partition the corpus
    val rows = DedupOps.q53DupClusters(spark, sfDir).collect()
    val keeps = rows.filter(_.getBoolean(3)).map(_.getLong(1))
    assert(keeps.toSet == clusters.values.toSet && keeps.length == keeps.toSet.size)
    assert(rows.length == Tables(spark, sfDir).documents.count())
  }

  test("q119 keeps exactly the best (longest, then lowest-id) doc per cluster") {
    val rows = DedupOps.q119ClusterKeepBest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // same cluster assignment as q53
    val q53 = DedupOps.q53DupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (doc, cl, _, _) => assert(q53(doc) == cl) }
    // exactly one keep per cluster, and it is the (n_chars desc, doc_id) max
    rows.groupBy(_._2).foreach { case (cl, members) =>
      val keeps = members.filter(_._4)
      assert(keeps.length == 1, s"cluster $cl has ${keeps.length} keeps")
      val best = members.minBy { case (doc, _, nc, _) => (-nc, doc) }
      assert(keeps.head._1 == best._1, s"cluster $cl kept ${keeps.head._1}, best is ${best._1}")
    }
  }

  test("q54 NFC collapses canonically-equal strings to one hash") {
    import spark.implicits._
    val composed = "caf\u00e9"            // e-acute precomposed
    val decomposed = "cafe\u0301"         // e + combining acute
    val df = Seq(composed, decomposed, "a\tb\u0000c", " x  y ").toDF("text")
    val out = df.select(
      graft.plans.NormalizeNfc(col("text")).as("nfc"),
      trim(regexp_replace(regexp_replace(
        graft.plans.NormalizeNfc(col("text")),
        "[\\x00-\\x1f\\x7f]", " "), "\\s+", " ")).as("norm"))
      .collect()
    assert(out(0).getString(0) == out(1).getString(0),
      "NFC must unify composed and decomposed forms")
    assert(out(0).getString(0) == composed)
    assert(out(2).getString(1) == "a b c")
    assert(out(3).getString(1) == "x y")
  }

  test("q55 keywords rank by tf desc with df and term tie-breaks") {
    val rows = LlmText.q55DocKeywords(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.size) && ranks.size <= LlmText.KEYWORDS_K,
        s"doc $doc ranks $ranks not dense/bounded")
      val ordered = rs.sortBy(_.getInt(1))
      ordered.zip(ordered.tail).foreach { case (hi, lo) =>
        val cmp = (hi.getLong(3) compare lo.getLong(3), // tf desc
          lo.getLong(4) compare hi.getLong(4),           // df asc
          lo.getString(2) compare hi.getString(2))       // term asc
        assert(cmp._1 > 0 || (cmp._1 == 0 && (cmp._2 > 0 || (cmp._2 == 0 && cmp._3 > 0))),
          s"doc $doc keyword order violated: $hi before $lo")
      }
    }
    // spot-check one doc against a driver-side count
    val doc0 = Tables(spark, sfDir).documents
      .filter(col("doc_id") === 0L).select("text").head.getString(0)
    val tf0 = doc0.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.filter(_.getLong(0) == 0L).foreach { r =>
      assert(tf0(r.getString(2)) == r.getLong(3),
        s"tf mismatch for doc 0 term ${r.getString(2)}")
    }
  }

  test("q61 encodes in-vocab tokens by frequency rank and flags OOV") {
    val out = LlmText.q61VocabEncode(spark, sfDir).collect()
    assert(out.length == Tables(spark, sfDir).documents.count())
    // n_oov <= n_tok, and with K=20 on a ~31-word vocab some OOV exists
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(out.map(_.getLong(2)).sum > 0, "expected OOV tokens at K=20")
    // cross-check one doc by hand
    val vocab = Tables(spark, sfDir).documents
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(LlmText.ENCODE_VOCAB_K)
      .zipWithIndex.map { case ((t, _), i) => t -> i }.toMap
    val doc0 = Tables(spark, sfDir).documents
      .filter(col("doc_id") === 0L).select("text").head.getString(0)
    val ids0 = doc0.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .map(t => vocab.getOrElse(t, -1))
    val row0 = out.find(_.getLong(0) == 0L).get
    assert(row0.getLong(1) == ids0.length && row0.getLong(2) == ids0.count(_ == -1))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(ids0.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row0.getString(3) == md, "id-sequence hash mismatch for doc 0")
  }

  test("q37 session gaps never exceed threshold inside a session") {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = Tables(spark, sfDir).events
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess", when(col("gap_us").isNull || col("gap_us") > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("sess_idx", sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val maxInGap = ev.filter(col("new_sess") === 0)
      .agg(max("gap_us")).collect().head.getLong(0)
    assert(maxInGap <= 30L * 60 * 1000000)
    // session count matches q37 output
    val nSess = ev.select("user_id", "sess_idx").distinct().count()
    assert(nSess == SessionOps.q37EventsSessionize(spark, sfDir).count())
  }

  test("multimodal stub decodes per-partition with deterministic output") {
    import spark.implicits._
    val ds = Tables(spark, sfDir).documents
      .select(col("doc_id"), (octet_length(col("text")) % 3).cast("int").as("media_kind"),
        col("text").cast("binary").as("bytes"))
      .as[MediaRecord]
      .repartition(4)
    val out1 = MultimodalStub.decode(ds).collect().sortBy(_.doc_id)
    val out2 = MultimodalStub.decode(ds.repartition(7)).collect().sortBy(_.doc_id)
    assert(out1.length == ds.count())
    assert(out1.zip(out2).forall { case (a, b) =>
      a.doc_id == b.doc_id && a.width == b.width && a.height == b.height &&
        a.features.sameElements(b.features)
    }, "decode must be partition-count independent")
    assert(out1.forall(d => d.features.length == 8 && d.width >= 1 && d.height >= 1))
  }

  test("streaming hourly agg matches batch aggregation (stream/batch parity)") {
    val batch = graft.streaming.StreamAgg.hourlyTypeAgg(Tables(spark, sfDir).events)
    val streamed = SessionOps.q38StreamWindowAgg(spark, sfDir)
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream interval join matches the batch interval join (q59 parity)") {
    val ev = Tables(spark, sfDir).events
    val batch = graft.streaming.StreamJoin
      .clickPurchase(ev, ev, SessionOps.ATTRIB_HOURS)
    val streamed = SessionOps.q59StreamStreamJoin(spark, sfDir)
    assert(streamed.count() > 0, "expected attribution pairs in the fixture window")
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
    // every emitted lag is inside [0, window)
    val lags = streamed.select("lag_us").collect().map(_.getLong(0))
    assert(lags.forall(l => l >= 0 && l < SessionOps.ATTRIB_HOURS * 3600L * 1000000L))
  }

  test("stream-stream LEFT-OUTER join emits unmatched clicks exactly once (q278 parity)") {
    val ev = Tables(spark, sfDir).events
    val bound = ev
      .agg(max(col("ts")) - expr(s"INTERVAL ${SessionOps.ATTRIB_HOURS + 1} HOURS"))
      .collect()(0).getTimestamp(0)
    // independent batch re-derivation of the finality-bounded outer join
    val c = ev.filter(col("event_type") === "click" && col("ts") <= lit(bound))
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val batch = c.join(p,
        col("user_id") === col("p_user") && col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") +
            expr(s"INTERVAL ${SessionOps.ATTRIB_HOURS} HOURS"),
        "left_outer")
      .select(col("user_id"), col("click_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(unix_micros(col("p_ts")) - unix_micros(col("c_ts")),
          lit(-1L)).as("lag_us"))
    val streamed = SessionOps.q278StreamOuterJoin(spark, sfDir)
    assert(streamed.filter(col("purchase_id") === -1L).count() > 0,
      "fixture must contain abandoned clicks")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
    // watermark-driven expiry must emit each abandoned click ONCE
    val dupNull = streamed.filter(col("purchase_id") === -1L)
      .groupBy("click_id").count().filter(col("count") > 1).count()
    assert(dupNull == 0, "abandoned click emitted more than once")
    // matched rows keep q59 semantics: lag inside [0, window)
    val lags = streamed.filter(col("purchase_id") =!= -1L)
      .select("lag_us").collect().map(_.getLong(0))
    assert(lags.forall(l => l >= 0 && l < SessionOps.ATTRIB_HOURS * 3600L * 1000000L))
  }

  test("stream-static enrichment matches the batch join+agg (q56 parity)") {
    val t = Tables(spark, sfDir)
    val batch = graft.streaming.StreamEnrich.segmentTypeAgg(t.events, t.customer)
    val streamed = SessionOps.q56StreamEnrich(spark, sfDir)
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
    // the enrichment must not drop events: every user_id resolves
    val total = streamed.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == t.events.count(), "stream-static join dropped events")
  }

  test("q106 winnowing matches a driver-side reference implementation") {
    import graft.queries.DedupOps
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (k, w) = (DedupOps.WINNOW_K, DedupOps.WINNOW_W)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expected = docs.filter(_._2.length >= k + w - 1).map { case (id, t) =>
      val hs = (1 to t.length - k + 1).map(p => p -> md5hex(t.substring(p - 1, p - 1 + k)))
      val sel = (1 to hs.length - w + 1).map { s0 =>
        val win = hs.slice(s0 - 1, s0 - 1 + w)
        val mn = win.map(_._2).min
        win.filter(_._2 == mn).map(_._1).max -> mn
      }.distinct.sortBy(_._1)
      val digest = md5hex(sel.map { case (p, h) => s"$p:$h" }.mkString(","))
      id -> (hs.length.toLong, sel.length.toLong, digest)
    }.toMap
    val got = DedupOps.q106WinnowFingerprint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    expected.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // winnowing density guarantee: ~2/(w+1), never more than 1 per window
    got.foreach { case (id, (m, nfp, _)) =>
      assert(nfp <= m - w + 1, s"doc $id: more fingerprints than windows")
      assert(nfp >= (m - w + 1 + w - 1) / w, s"doc $id: too few fingerprints")
    }
  }

  test("BPE encode with learned merges reproduces the trainer's symbol table") {
    import spark.implicits._
    import graft.operators.BpeTrainer
    val corpus = Seq("low lower lowest low low", "newer newest new")
      .toDF("text")
    val words = BpeTrainer.wordTable(corpus, "text")
    val (merges, finalSyms) = BpeTrainer.train(words, 6)
    assert(merges.nonEmpty)
    val reEncoded = words
      .select(BpeTrainer.encode(col("word"), merges).as("syms"), col("wc"))
    val a = reEncoded.collect().map(r => (r.getSeq[String](0).toList, r.getLong(1)))
      .sortBy(_.toString)
    val b = finalSyms.collect().map(r => (r.getSeq[String](0).toList, r.getLong(1)))
      .sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("q129 hashed features match a driver-side recompute and need no vocabulary") {
    import graft.queries.LlmText
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map { tok =>
        val hv = h32(s"fh:$tok")
        ((id, hv % LlmText.FEATURE_HASH_B),
          (if (((hv >> 8) & 1) == 0) 1L else -1L))
      }
    }.groupBy(_._1).map { case (k, v) =>
      (k, (v.map(_._2).sum, v.length.toLong))
    }.filter(_._2._1 != 0L)
    val got = LlmText.q129FeatureHash(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected && got.nonEmpty)
    // every bucket stays inside the fixed feature space
    got.keys.foreach { case (_, b) =>
      assert(b >= 0 && b < LlmText.FEATURE_HASH_B)
    }
  }

  test("q149 novelty equals a driver-side shingle df computation") {
    val K = LlmText.NOVEL_K; val S = LlmText.NOVEL_STRIDE
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val shingles = docs.map { case (id, text) =>
      val n = math.max(math.ceil((text.length - K + 1) / S.toDouble), 1).toInt
      id -> (0 until n).map(i => md5hex(text.slice(i * S, i * S + K))).toSet
    }.toMap
    val df = shingles.values.flatten
      .groupBy(identity).map { case (h, v) => h -> v.size }
    val expected = shingles.map { case (id, hs) =>
      val uniq = hs.count(df(_) == 1).toLong
      id -> ((hs.size.toLong, uniq,
        math.floor(uniq * 1e6 / hs.size + 0.5).toLong))
    }
    val got = LlmText.q149NgramNovelty(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // the corpus has both shared boilerplate and unique content
    assert(got.values.exists(_._3 < 1000000L), "some shingles must be shared")
    assert(got.values.exists(_._3 > 0L), "some shingles must be unique")
  }

  test("q156 char entropy matches a driver-side histogram computation") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val hist = text.groupBy(identity).map { case (_, v) => v.length.toLong }
      val n = text.length.toLong
      val ent = hist.map(c => math.floor(
        (c.toDouble / n.toDouble) * math.log(n.toDouble / c.toDouble) * 1e6
          + 0.5).toLong).sum
      id -> ((n, hist.size.toLong, ent))
    }.toMap
    val got = LlmText.q156CharEntropy(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // natural text sits well above degenerate entropy
    assert(got.values.forall(_._3 > 0L))
  }

  test("q207 ROI totals reconcile with q26's cluster view") {
    val roi = DedupOps.q207DedupRoi(spark, sfDir).collect()
    val docs = Tables(spark, sfDir).documents.count()
    assert(roi.map(_.getAs[Long]("n_docs")).sum === docs)
    // total removed = docs minus one keeper per content hash (q26 rows)
    val clusters = LlmText.q26DedupExact(spark, sfDir).count()
    assert(roi.map(_.getAs[Long]("n_removed")).sum === docs - clusters)
    roi.foreach { r =>
      assert(r.getAs[Long]("cross_source_dups") <= r.getAs[Long]("n_removed"))
    }
  }

  test("q243 multi-probe recall@5 dominates single-probe q31") {
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = hits(EmbeddingOps.q30EmbeddingTopk(spark, sfDir))
    val single = hits(EmbeddingOps.q31LshAnn(spark, sfDir))
    val multi = hits(EmbeddingOps.q243MultiProbe(spark, sfDir))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size
      }
      per.sum / per.size
    }
    val rs = recall(single); val rm = recall(multi)
    // probing Hamming-1 buckets can only ADD candidates
    assert(rm >= rs, s"multi-probe recall $rm < single-probe $rs")
    assert(rm > 0.5, s"multi-probe recall unexpectedly low: $rm")
  }

  test("q238 guarantees: exact-dup docs always link, counts are consistent") {
    // identical texts chunk identically, so EVERY exact-duplicate doc
    // pair must appear with all its chunks linked — the guaranteed
    // floor of chunk-level recall (general near-dups may or may not
    // collide per chunk; that selectivity is the operator's point)
    val dupPairs = LlmText.q26DedupExact(spark, sfDir)
      .filter(col("n_copies") > 1).collect()
      .map(_.getAs[String]("content_md5"))
    val byHash = Tables(spark, sfDir).documents
      .select(col("doc_id"), md5(col("text")).as("h"),
        length(col("text")).as("len"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .groupBy(_._2)
    val rows = DedupOps.q238ChunkNeardup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_chunk_links"), r.getAs[Long]("n_chunks_a"),
          r.getAs[Long]("n_chunks_b"))).toMap
    dupPairs.foreach { h =>
      val ids = byHash(h).map(_._1).sorted
      val nChunks = math.max(
        math.ceil(byHash(h).head._3 / DedupOps.CHUNK_ND_STRIDE.toDouble), 1).toLong
      for (i <- ids.indices; j <- i + 1 until ids.length) {
        val k = (ids(i), ids(j))
        assert(rows.contains(k), s"exact dup pair $k has no chunk links")
        // every chunk of an identical pair collides with its twin
        assert(rows(k)._2 === nChunks && rows(k)._3 === nChunks, s"pair $k")
      }
    }
    rows.values.foreach { case (links, ca, cb) =>
      assert(ca <= links && cb <= links)
    }
    assert(rows.nonEmpty)
  }

  test("q230 golden records fuse fields by their per-field rules") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byId = docs.map(d => d._1 -> d).toMap
    val clusters = DedupOps.q53DupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet)
      .filter(_._2.size > 1) // multi-doc clusters only
    val got = DedupOps.q230Survivorship(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === clusters.keySet)
    clusters.foreach { case (c, members) =>
      val r = got(c)
      val ms = members.toSeq.map(byId)
      assert(r.getAs[Long]("n_members") === members.size.toLong)
      assert(r.getAs[Long]("golden_id") === members.min)
      val maxChars = ms.map(_._3).max
      assert(r.getAs[Long]("content_chars") === maxChars)
      assert(r.getAs[Long]("content_donor") ===
        ms.filter(_._3 == maxChars).map(_._1).min)
      assert(r.getAs[String]("provenance") === ms.map(_._2).min)
      assert(r.getAs[Long]("n_sources") === ms.map(_._2).distinct.size.toLong)
    }
  }

  test("q225 cluster density is consistent with q53 components and q27 pairs") {
    val pairs = DedupOps.candidatePairs(Tables(spark, sfDir).documents)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find over the candidate pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byCluster = nodes.groupBy(find)
    val edgesByCluster = pairs.groupBy(p => find(p._1))
    val got = DedupOps.q225ClusterDensity(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
          r.getAs[Long]("density_micro"))).toMap
    assert(got.keySet === byCluster.keySet)
    byCluster.foreach { case (c, ns) =>
      val e = edgesByCluster(c).length.toLong
      val n = ns.length.toLong
      val (gn2, ge, gd) = got(c)
      assert(gn2 === n && ge === e, s"cluster $c counts")
      assert(gd === math.floor(e * 2 * 1e6 / (n * (n - 1)) + 0.5).toLong)
      // a cluster's edges never exceed the clique bound
      assert(e <= n * (n - 1) / 2)
    }
  }

  test("q222 confusion matrix reconciles with q32's per-doc predictions") {
    val perDoc = LlmText.q32LangId(spark, sfDir)
      .select("actual_lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = perDoc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = LlmText.q222LangidConfusion(spark, sfDir).collect()
    val got = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(got === want)
    // row fractions sum to ~1e6 per actual language
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val s = rs.map(_.getAs[Long]("row_frac_micro")).sum
      assert(math.abs(s - 1000000L) <= rs.length / 2 + 1, s"row sums to $s")
    }
  }

  test("q220 eval counts reconcile between the candidate and truth frames") {
    val rows = DedupOps.q220DedupEval(spark, sfDir).collect()
      .map(r => r.getAs[Long]("tau_micro") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_cand"),
          r.getAs[Long]("tp"))).toMap
    assert(rows.keySet === DedupOps.EVAL_TAUS.toSet)
    val exact = DedupOps.q168PrefixJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("jac_micro"))
      .toMap
    val cand = DedupOps.candidatePairs(Tables(spark, sfDir).documents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    DedupOps.EVAL_TAUS.foreach { t =>
      val truth = exact.filter(_._2 >= t).keySet
      val (nTrue, nCand, tp) = rows(t)
      assert(nTrue === truth.size.toLong, s"tau $t truth")
      assert(nCand === cand.size.toLong, s"tau $t candidates")
      assert(tp === (truth & cand).size.toLong, s"tau $t hits")
    }
  }

  test("q208 probabilities obey the banding monotonicity laws") {
    val rows = DedupOps.q208LshTuning(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("expected_detect_micro"),
        r.getAs[Long]("n_majority")))
    assert(rows.map(t => (t._1, t._2)).toSet === DedupOps.LSH_CONFIGS.toSet)
    // every config evaluates the same candidate frame
    assert(rows.map(_._3).distinct.length === 1)
    // more rows per band = stricter: expected detections weakly decrease
    val byR = rows.sortBy(_._2).map(_._4)
    assert(byR.zip(byR.tail).forall { case (lo, hi) => lo >= hi },
      s"expected-detect not monotone in r: ${rows.sortBy(_._2).mkString(", ")}")
    // (b,r)=(16,1) detects every pair with any signature agreement
    val b16 = rows.find(_._1 == 16).get
    assert(b16._4 >= rows.find(_._1 == 1).get._4)
  }
}
