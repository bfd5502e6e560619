package graft

import graft.operators.{RegexScrub, SeqPack}
import graft.queries.TrainPrep
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Training-prep operators: packing arithmetic, scrub counts/redaction,
  * and decontamination flags on planted fixtures.
  */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  test("SeqPack cuts at the token budget with per-shard prefix sums") {
    // one shard; tokens 100,200,300,250 at ctx=256:
    // prefixes 0,100,300,600 -> packs 0,0,1,2
    val df = Seq((0L, 100), (1L, 200), (2L, 300), (3L, 250))
      .toDF("doc_id", "n_tok")
    val got = SeqPack.assignPacks(df, lit(0), Seq("doc_id"), col("n_tok"), 256)
      .select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("SeqPack shards pack independently") {
    val df = Seq((0L, 10), (1L, 10), (2L, 10), (3L, 10))
      .toDF("doc_id", "n_tok")
    val got = SeqPack
      .assignPacks(df, pmod(col("doc_id"), lit(2)), Seq("doc_id"), col("n_tok"), 15)
      .select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shard 0: docs 0,2 at prefixes 0,10 -> packs 0,0; same for shard 1
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("RegexScrub counts and redacts every rule in order") {
    val df = Seq(
      (1L, "mail a@b.com twice a@b.org see https://x.y/z id 12345678 the hash"),
      (2L, "clean text only")).toDF("doc_id", "text")
    val got = RegexScrub.scrub(df, col("text"), TrainPrep.SCRUB_RULES)
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Int]("n_email") === 2)
    assert(r1.getAs[Int]("n_url") === 1)
    assert(r1.getAs[Int]("n_digits") === 1)
    assert(r1.getAs[Int]("n_canary") === 1)
    assert(r1.getAs[String]("redacted") ===
      "mail <EMAIL> twice <EMAIL> see <URL> id <NUM> the <CANARY>")
    val r2 = got(1)
    assert(Seq("n_email", "n_url", "n_digits", "n_canary")
      .forall(c => r2.getAs[Int](c) === 0))
    assert(r2.getAs[String]("redacted") === "clean text only")
  }

  test("q48 flags a planted benchmark near-dup and only that") {
    // doc 10 is in the benchmark slice; doc 100 shares a >=30-char span
    // with it, doc 101 does not.
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (10L, s"benchmark item: $shared end"),
      (100L, s"training copy — $shared — with extra words"),
      (101L, "completely different content with no overlapping span here at all"))
      .toDF("doc_id", "text")
    val shingled = docs.select(col("doc_id"),
      explode(graft.plans.ShingleHashSet(col("text"), TrainPrep.DECON_N)).as("sh"))
    val bench = shingled.filter(col("doc_id") < 50).select("sh").distinct()
    val hits = shingled.filter(col("doc_id") >= 50)
      .join(broadcast(bench), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(100L) && hits(100L) > 0)
    assert(!hits.contains(101L))
  }

  test("Compaction.latestByKey survives timestamp ties deterministically") {
    import org.apache.spark.sql.functions.col
    // user 1: ts tie at 100 — packed ord must pick the higher event_id
    val df = Seq(
      (1L, 100L, 7L, "a"), (1L, 100L, 9L, "b"), (1L, 50L, 8L, "c"),
      (2L, 10L, 1L, "d"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val ord = col("ts_us") * 1048576L + col("event_id")
    val got = graft.operators.Compaction
      .latestByKey(df, Seq("user_id"), ord, Seq("event_type", "event_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(1L -> (("b", 9L, 3L)), 2L -> (("d", 1L, 1L))))
  }

  test("q50 keeps exactly the rows under their source weight, deterministically") {
    val a = SparkEntry.queries("q50_corpus_mix")(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.forall(r => r.getAs[Long]("bucket") < r.getAs[Int]("mix_weight")))
    val b = SparkEntry.queries("q50_corpus_mix")(spark, sfDir).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
  }

  test("q52 repetition fold equals brute-force bigram counting") {
    // "a b a b a b": bigrams (a b)x3, (b a)x2 -> 3/5; short docs -> 0
    val docs = Seq((1L, "a b a b a b"), (2L, "one"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val got = graft.queries.TrainPrep.q52RepNgrams(spark, sfDir)
    assert(got.columns.toSeq ==
      Seq("doc_id", "n_bigrams", "max_rep", "rep_ratio"))
    // crafted-row check of the fused native expression
    val res = docs
      .select(col("doc_id"), graft.plans.RepetitionStats(col("text")).as("rs"))
      .select(col("doc_id"), col("rs.n_bigrams"), col("rs.max_rep")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(res === Map(1L -> ((5L, 3L)), 2L -> ((0L, 0L)), 3L -> ((2L, 1L))))
  }

  test("q71 HLL path keeps the report schema and estimates within sketch error") {
    val exact = TrainPrep.q71TableStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = TrainPrep.q71TableStats(spark, sfDir, approxDistinct = true)
    assert(approx.columns.toSeq ==
      Seq("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"))
    val est = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(est.keySet == exact.keySet)
    // lgK=12 -> ~1.6% standard error; allow 5 sigma plus small-count slack
    est.foreach { case (c, e) =>
      val x = exact(c).toDouble
      assert(math.abs(e - x) <= math.max(3.0, 0.08 * x),
        s"$c: HLL estimate $e too far from exact ${exact(c)}")
    }
  }

  test("q57 manifest is invariant to partitioning and covers every doc") {
    val base = TrainPrep.q57ShardManifest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // totals partition the corpus
    val nDocs = Tables(spark, sfDir).documents.count()
    assert(base.values.map(_._1).sum == nDocs)
    assert(base.keySet.subsetOf((0L until TrainPrep.MANIFEST_SHARDS).toSet))
    // the order-independent hash: same manifest from a reshuffled input
    val reshuffled = Tables(spark, sfDir).documents.repartition(7)
      .select(
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long"), lit(TrainPrep.MANIFEST_SHARDS.toLong)).as("shard"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tok"),
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long").as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        sum("h").as("content_hash_sum"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(reshuffled == base, "manifest depends on partitioning")
  }

  test("q58 caps every source at the quota with deterministic picks") {
    val got = TrainPrep.q58SourceQuota(spark, sfDir)
    val perSource = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.values.forall(_ <= TrainPrep.QUOTA_PER_SOURCE))
    // sources with >= quota docs are filled exactly to the quota
    val totals = Tables(spark, sfDir).documents.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (s, n) =>
      assert(perSource.getOrElse(s, 0L) ==
        math.min(n, TrainPrep.QUOTA_PER_SOURCE.toLong), s"source $s")
    }
    // determinism: two runs pick the identical subset
    val a = got.collect().map(_.getLong(0)).sorted.toSeq
    val b = TrainPrep.q58SourceQuota(spark, sfDir).collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("q80 drops later occurrences of a repeated segment, keeps the first") {
    import spark.implicits._
    // 12-token segment A repeated: doc 0 (first, kept), doc 2 (dropped),
    // and twice inside doc 3 (second in-doc copy dropped too).
    val segA = (1 to 12).map(i => s"w$i").mkString(" ")
    val segB = (1 to 12).map(i => s"x$i").mkString(" ")
    val segC = (1 to 12).map(i => s"y$i").mkString(" ")
    Seq(
      (0L, s"$segA $segB"),
      (1L, segC),
      (2L, s"$segA $segC"),
      (3L, s"$segB $segB"))
      .toDF("doc_id", "text").createOrReplaceTempView("q80fix")
    val docs = spark.table("q80fix")
    // run the library query against a temp parquet dir
    val tmp = java.nio.file.Files.createTempDirectory("q80fix").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TrainPrep.q80SegmentDedup(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((2L, 2L)))   // both segments are first occurrences
    assert(out(1L) == ((1L, 1L)))
    assert(out(2L) == ((2L, 0L)))   // segA seen in doc 0, segC seen in doc 1
    assert(out(3L) == ((2L, 0L)))   // both copies of segB already seen (doc 0)
  }

  test("q81 rules: zero-shuffle plan and sane flag on the fixture corpus") {
    val df = TrainPrep.q81QualityRules(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"q81 should be scan-stage only:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getLong(1); val nDistinct = r.getLong(2)
      assert(nDistinct <= nWords)
      val dup = r.getDouble(5)
      assert(dup >= 0.0 && dup < 1.0)
    }
  }

  test("q46/q47/q48/q49 run end-to-end on the fixture tables") {
    for (q <- Seq("q46_seq_pack", "q47_regex_scrub", "q48_decontaminate",
        "q49_latest_by_key")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      assert(df.count() > 0, q)
    }
    // q48 at sf0.001: contamination is consistent between flag and count
    val q48 = SparkEntry.queries("q48_decontaminate")(spark, sfDir)
    val bad = q48.filter(
      (col("contaminated") && col("n_hit_shingles") === 0) ||
        (!col("contaminated") && col("n_hit_shingles") > 0)).count()
    assert(bad === 0)
  }

  test("q86 pair counts match a driver-side brute force") {
    val texts = Tables(spark, sfDir).documents
      .select("text").collect().map(_.getString(0))
    val truth = scala.collection.mutable.Map.empty[(String, String), Long]
    var nTok = 0L
    val uni = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      nTok += ws.length
      ws.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      for {
        i <- ws.indices
        d <- 1 to TrainPrep.COOC_WINDOW if i + d < ws.length
      } {
        val k = (ws(i), ws(i + d))
        truth(k) = truth.getOrElse(k, 0L) + 1
      }
    }
    val want = truth.filter(_._2 >= TrainPrep.COOC_MIN)
    val got = TrainPrep.q86WordCoocc(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, n) =>
      assert(got(k)._1 == n, s"pair $k count ${got(k)._1} != $n")
      val lift = n.toDouble * nTok / (uni(k._1) * uni(k._2))
      assert(math.abs(got(k)._2 - lift) < 1e-12 * lift, s"pair $k lift off")
    }
  }

  test("q101 bigram scores: nonpositive, bounded rows, unigram-only docs dropped") {
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text"))
        .as("toks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val rows = TrainPrep.q101BigramLmScore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expectedDocs = docs.filter(_._2.length >= 2).map(_._1).toSet
    assert(rows.map(_._1).toSet == expectedDocs)
    rows.foreach { case (id, nb, score) =>
      val nTok = docs.toMap.apply(id).length
      assert(nb == nTok - 1, s"doc $id bigram count")
      assert(score <= 1e-12, s"doc $id: log-prob must be <= 0")
    }
  }

  test("q108 weighted sample is deterministic, K-sized, and length-biased") {
    val a = TrainPrep.q108WeightedSample(spark, sfDir).collect()
    assert(a.length == TrainPrep.WSAMPLE_K)
    val b = TrainPrep.q108WeightedSample(spark, sfDir).collect()
    assert(a.map(_.getLong(0)).sorted.toSeq == b.map(_.getLong(0)).sorted.toSeq)
    // A-ES with w = n_chars must bias the sample toward longer docs
    val sampleMean = a.map(_.getAs[Long]("n_chars").toDouble).sum / a.length
    val corpus = Tables(spark, sfDir).documents
      .agg(avg("n_chars")).collect().head.getDouble(0)
    assert(sampleMean > corpus,
      s"weighted sample mean $sampleMean must exceed corpus mean $corpus")
  }

  test("q109 global shuffle is a permutation with dense shard packing") {
    val rows = TrainPrep.q109GlobalShuffle(spark, sfDir).collect()
    val n = Tables(spark, sfDir).documents.count()
    assert(rows.length == n)
    val ords = rows.map(_.getAs[Long]("ord")).sorted
    assert(ords.toSeq == (1L to n).toSeq, "ord must be a 1..N permutation")
    val byShard = rows.groupBy(_.getAs[Long]("shard_id"))
    val full = TrainPrep.SHUFFLE_SHARD_DOCS
    byShard.foreach { case (sid, rs) =>
      assert(rs.length <= full)
      if (sid < byShard.keys.max) assert(rs.length == full,
        s"non-final shard $sid must hold exactly $full docs")
      // offsets within a shard are dense 0..len-1
      assert(rs.map(_.getAs[Long]("offset_in_shard")).sorted.toSeq ==
        (0L until rs.length).toSeq)
    }
  }

  test("q101 a repeated-phrase doc outscores a unique-word doc") {
    // the model is self-trained, so the odd doc must REUSE corpus
    // words in unseen orders (novel bigrams over frequent unigrams
    // score ln(1/n1)); a doc of globally-unique words would get
    // conditional probability 1 everywhere and score 0
    import spark.implicits._
    val corpus = (Seq.fill(20)("the cat sat") ++ Seq("cat the sat the"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("q101").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val scores = TrainPrep.q101BigramLmScore(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(0L) > scores(20L),
      "frequent-pattern doc must outscore the unique-words doc")
  }

  test("q133 negatives: K per user, never a positive, deterministic slots") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sfDir)
    val ord = t.orders
    val li = t.lineitem
    val positives = ord
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nCust = t.customer.count()
    val rows = TrainPrep.q133NegativeSampling(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every customer fills its K negatives (the 4x over-draw suffices)
    val perUser = rows.groupBy(_._1)
    assert(perUser.size == nCust, s"${perUser.size} users vs $nCust customers")
    perUser.foreach { case (u, ns) =>
      assert(ns.length == TrainPrep.NEG_K, s"user $u drew ${ns.length}")
      assert(ns.map(_._3).distinct.length == TrainPrep.NEG_K, s"user $u dup item")
      assert(ns.map(_._2).sorted.toSeq == (1L to TrainPrep.NEG_K).toSeq)
    }
    // no sampled negative is a positive interaction
    rows.foreach { case (u, _, item, _) =>
      assert(!positives.contains((u, item)), s"user $u sampled positive $item")
    }
    // deterministic: a second run yields the identical table
    val again = TrainPrep.q133NegativeSampling(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("q147 chunk pairs are adjacent substrings with no empty targets") {
    val C = TrainPrep.PAIR_CHUNK
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      Iterator.from(0).map { i =>
        val in = text.slice(i * C, (i + 1) * C)
        val tgt = text.slice((i + 1) * C, (i + 2) * C)
        (id, i.toLong, in, tgt)
      }.takeWhile(_._4.nonEmpty)
        .map { case (d, i, in, tgt) =>
          ((d, i), (in.length.toLong, tgt.length.toLong, md5hex(in), md5hex(tgt)))
        }.toSeq
    }.toMap
    val got = TrainPrep.q147ChunkPairs(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getInt(1).toLong),
        (r.getInt(2).toLong, r.getInt(3).toLong, r.getString(4), r.getString(5))))
      .toMap
    assert(got == expected)
    // every non-final pair has a FULL-length target; inputs always full
    assert(got.values.forall(_._1 == C.toLong))
    assert(got.values.exists(_._2 < C.toLong), "fixture exercises a partial tail")
  }

  test("q148 Poisson bootstrap: replicates, point estimate, and CI are deterministic") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val B = graft.queries.StatsOps.BOOT_B
    val cdf = graft.queries.StatsOps.BOOT_CDF
    val rows = Tables(spark, sfDir).orders
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val sw = Array.fill(B)(0L); val swx = Array.fill(B)(0L)
    rows.foreach { case (k, cents) =>
      val digs = (0 until B / 8).map(j => md5hex(s"bs$j:$k"))
      (0 until B).foreach { b =>
        val u = java.lang.Long.parseLong(
          digs(b / 8).substring((b % 8) * 4, (b % 8) * 4 + 4), 16)
        val w = cdf.indexWhere(u < _) match { case -1 => 5L; case i => i.toLong }
        sw(b) += w; swx(b) += w * cents
      }
    }
    val expReps = (0 until B).map(b =>
      b.toLong -> ((sw(b),
        math.floor(swx(b).toDouble * 1e6 / sw(b).toDouble + 0.5).toLong))).toMap
    val got = graft.queries.StatsOps.q148BootstrapCi(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    expReps.foreach { case (b, e) => assert(got(b) == e, s"replicate $b") }
    // point estimate
    val n = rows.length.toLong; val sc = rows.map(_._2).sum
    assert(got(-1L) ==
      ((n, math.floor(sc.toDouble * 1e6 / n.toDouble + 0.5).toLong)))
    // CI: percentile interpolation over the sorted replicate means
    val means = expReps.values.map(_._2.toDouble).toSeq.sorted
    def pct(p: Double): Long = {
      val idx = p * (means.length - 1)
      val lo = means(idx.toInt); val hi = means(math.ceil(idx).toInt)
      math.floor(lo + (hi - lo) * (idx - idx.toInt) + 0.5).toLong
    }
    assert(got(-2L)._2 == pct(0.025) && got(-3L)._2 == pct(0.975))
    // the interval brackets the point estimate
    assert(got(-2L)._2 <= got(-1L)._2 && got(-1L)._2 <= got(-3L)._2)
  }

  test("q153 dataset card metrics reconcile with direct recomputation") {
    val docs = Tables(spark, sfDir).documents
      .select("n_chars", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val got = TrainPrep.q153DatasetCard(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("n_docs") == docs.length.toLong)
    assert(got("n_chars") == docs.map(_._1).sum)
    assert(got("n_tokens") ==
      docs.map(_._2.toLowerCase.split("\\s+").count(_.nonEmpty).toLong).sum)
    docs.groupBy(_._3).foreach { case (l, v) =>
      assert(got(s"lang:$l") == v.length.toLong, s"lang $l")
    }
    docs.groupBy(_._4).foreach { case (src, v) =>
      assert(got(s"source:$src") == v.length.toLong, s"source $src")
    }
    // interpolated percentiles over the sorted lengths
    val sorted = docs.map(_._1.toDouble).sorted
    def pct(p: Double): Long = {
      val idx = p * (sorted.length - 1)
      val lo = sorted(idx.toInt); val hi = sorted(math.ceil(idx).toInt)
      math.floor(lo + (hi - lo) * (idx - idx.toInt) + 0.5).toLong
    }
    assert(got("len_p50_chars") == pct(0.5) && got("len_p90_chars") == pct(0.9))
    // the card is complete: scalars + both compositions + percentiles
    assert(got.size == 5 + docs.map(_._3).distinct.length +
      docs.map(_._4).distinct.length)
  }

  test("q235 split partitions all sessions and the embargo purges straddlers") {
    val rows = TrainPrep.q235PurgedSplit(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    // every event lands in exactly one split
    val totalEvents = Tables(spark, sfDir).events.count()
    assert(rows.values.map(_._2).sum === totalEvents)
    assert(rows.contains("train") && rows.contains("test"),
      s"cutoff must produce both sides: $rows")
    // recompute the classification from q37's session frame
    val cutoffUs = java.time.LocalDateTime
      .parse(TrainPrep.SPLIT_CUTOFF.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val sess = graft.queries.SessionOps.q37EventsSessionize(spark, sfDir)
      .select("sess_start", "sess_end").collect()
      .map { r =>
        def us(s: String) = java.time.LocalDateTime
          .parse(s.replace(" ", "T"))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        (us(r.getString(0)), us(r.getString(1)))
      }
    // q37 timestamps are second-truncated strings; classify with
    // second-resolution bounds, so only compare the session COUNTS of
    // the unambiguous splits (no session boundary sits within 1s of
    // the cutoff in the synthetic data)
    val want = sess.groupBy { case (s, e) =>
      if (e < cutoffUs) "train"
      else if (s >= cutoffUs + TrainPrep.SPLIT_EMBARGO_US) "test"
      else "purged"
    }.view.mapValues(_.length.toLong).toMap
    want.foreach { case (k, n) => assert(rows(k)._1 === n, s"split $k") }
  }

  test("q227 KL divergences are non-negative and vocabularies reconcile") {
    val rows = TrainPrep.q227SourceKl(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Gibbs' inequality: KL(p||q) >= 0, with a hair of float slack
      assert(r.getAs[Double]("kl_nats") >= -1e-12,
        s"${r.getString(0)} negative KL")
      assert(r.getAs[Long]("vocab") >= 1L)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("vocab"))
    }
    // token totals across sources cover the corpus exactly
    val totalToks = Tables(spark, sfDir).documents
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totalToks)
  }

  test("q221 ladder rungs are nested and the full rung covers the corpus") {
    val rows = TrainPrep.q221ScalingLadder(spark, sfDir)
      .orderBy("pct").collect()
    assert(rows.map(_.getAs[Int]("pct")).toSeq === TrainPrep.LADDER_PCTS)
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a <= b }, "nested docs")
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b }, "nested tokens")
    assert(docs.last === Tables(spark, sfDir).documents.count())
    assert(rows.last.getAs[Long]("token_frac_micro") === 1000000L)
  }

  test("q209 temperature weights flatten the proportional mixture") {
    val rows = TrainPrep.q209MixtureWeights(spark, sfDir).collect()
    // both weight columns are (near-)normalized: off by at most one
    // half-micro per source from per-source rounding
    val tol = rows.length / 2 + 1
    assert(math.abs(rows.map(_.getAs[Long]("prop_micro")).sum - 1000000L) <= tol)
    assert(math.abs(rows.map(_.getAs[Long]("w05_micro")).sum - 1000000L) <= tol)
    // α = 1/2 flattens: the biggest source loses weight, the smallest gains
    val byTokens = rows.sortBy(_.getAs[Long]("n_tokens"))
    val small = byTokens.head; val big = byTokens.last
    if (small.getAs[Long]("n_tokens") != big.getAs[Long]("n_tokens")) {
      assert(small.getAs[Long]("w05_micro") >= small.getAs[Long]("prop_micro"))
      assert(big.getAs[Long]("w05_micro") <= big.getAs[Long]("prop_micro"))
    }
    // exact recompute of the milli-quantized sqrt weights
    val s = rows.map(r => r.getAs[String]("source") ->
      math.floor(math.sqrt(r.getAs[Long]("n_tokens").toDouble) * 1000 + 0.5).toLong)
    val tot = s.map(_._2).sum
    rows.foreach { r =>
      val want = math.floor(
        s.toMap.apply(r.getAs[String]("source")) * 1e6 / tot + 0.5).toLong
      assert(r.getAs[Long]("w05_micro") === want)
    }
  }
}
