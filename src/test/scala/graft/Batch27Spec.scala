package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-27 specs: duplicated-span detection (q331), count-min
  * sketch eval + mergeability (q332), isotonic calibration vs the
  * classic sequential PAV pooling (q333), naive-Bayes language scoring
  * + holdout accuracy (q334), and Markov next-event eval (q335) — each
  * re-derived imperatively on sf0.001, sharing no Spark plan with the
  * engine under test.
  */
class Batch27Spec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q331 equals a driver-side window/interval-union recompute") {
    val w = graft.queries.CorpusOps.DUPSPAN_W
    val got = graft.queries.CorpusOps.q331DupSpans(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    // window -> set of docs containing it
    val df = scala.collection.mutable.Map[String, Set[Long]]()
    for ((id, t) <- docs; i <- 0 to t.length - w)
      df.updateWith(t.slice(i, i + w).mkString(" ")) {
        prev => Some(prev.getOrElse(Set.empty) + id)
      }
    val want = docs.map { case (id, t) =>
      val dupIs = (0 to t.length - w)
        .filter(i => df(t.slice(i, i + w).mkString(" ")).size >= 2)
      // interval union of [i, i+w), touching intervals merge
      val spans = dupIs.foldLeft(List.empty[(Int, Int)]) {
        case (acc, i) => acc match {
          case (s, e) :: rest if i <= e => (s, math.max(e, i + w)) :: rest
          case _ => (i, i + w) :: acc
        }
      }
      val dupTok = spans.map { case (s, e) => e - s }.sum
      id -> ((math.max(t.length - w + 1, 0).toLong, dupIs.size.toLong,
        spans.size.toLong, dupTok.toLong, t.length.toLong,
        dupTok.toDouble / t.length))
    }.toMap
    assert(got === want)
    assert(want.values.exists(_._4 > 0), "fixture should contain dup spans")
  }

  test("q332 estimates never undershoot and the sketch is mergeable") {
    import graft.queries.CorpusOps.{cmsTable, CMS_D, CMS_W}
    val rows = graft.queries.CorpusOps.q332CmsEval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, s"count-min undershot on ${r.getString(0)}")
      assert(r.getLong(2) === r.getLong(1) + r.getLong(3))
    }
    // mergeability: cms(even docs) + cms(odd docs) == cms(all), cellwise
    def counts(filterExpr: String): Map[(Int, Long), Long] = {
      val tok = Tables(spark, sfDir).documents.filter(expr(filterExpr))
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      cmsTable(tok).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val all = counts("true")
    val even = counts("doc_id % 2 = 0")
    val odd = counts("doc_id % 2 = 1")
    val keys = even.keySet ++ odd.keySet
    assert(keys.nonEmpty && keys.subsetOf((for {
      r <- 0 until CMS_D; b <- 0L until CMS_W.toLong
    } yield (r, b)).toSet))
    keys.foreach { k =>
      assert(even.getOrElse(k, 0L) + odd.getOrElse(k, 0L) ===
        all.getOrElse(k, 0L), s"cell $k not mergeable")
    }
  }

  test("q333 equals sequential PAV pooling and is monotone") {
    val got = graft.queries.StatsOps.q333IsotonicFit(spark, sfDir)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.nonEmpty)
    // classic PAV: pool adjacent violators left-to-right until monotone
    case class Block(n: Long, pos: Long, bins: Int) {
      def rate: Double = pos.toDouble / n
    }
    var blocks = List.empty[Block]
    got.foreach { case (_, n, pos, _) =>
      blocks = Block(n, pos, 1) :: blocks
      while (blocks.lengthCompare(2) >= 0 &&
          blocks(1).rate >= blocks.head.rate) {
        val merged = Block(blocks.head.n + blocks(1).n,
          blocks.head.pos + blocks(1).pos, blocks.head.bins + blocks(1).bins)
        blocks = merged :: blocks.drop(2)
      }
    }
    val fitted = blocks.reverse.flatMap(b => Seq.fill(b.bins)(b.rate))
    val wantMicro = fitted.map(r => math.floor(r * 1e6 + 0.5).toLong)
    assert(got.map(_._4).toSeq === wantMicro)
    got.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "isotonic fit must be monotone")
      case _ =>
    }
  }

  test("q334 equals a driver-side NB recompute (exact model replay)") {
    import graft.queries.LlmText.NB_TEST_MOD
    val got = graft.queries.LlmText.q334NbLangScore(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq))
    val train = docs.filter(_._1 % NB_TEST_MOD != 0)
    val test = docs.filter(_._1 % NB_TEST_MOD == 0)
    val cnt = train.flatMap(d => d._3.map(t => (d._2, t)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val mass = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = cnt.keySet.map(_._2).size.toLong
    val classes = train.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTrain = train.length.toLong
    val k = classes.size.toLong
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val want = (for {
      (id, _, toks) <- test
      lang <- classes.keys
    } yield {
      val prior = micro(math.log((classes(lang) + 1.0) / (nTrain + k)))
      val terms = toks.map { t =>
        val c = cnt.getOrElse((lang, t), 0L)
        (if (c > 0) 1L else 0L,
          micro(math.log((c + 1.0) / (mass(lang) + v).toDouble)))
      }
      (id, lang) -> ((toks.length.toLong, terms.map(_._1).sum,
        prior + terms.map(_._2).sum))
    }).toMap
    assert(got === want)
    // The fixture's lang labels carry NO token signal: all five langs
    // draw from the same 31-token vocabulary (verified via DuckDB:
    // every pairwise lang vocabulary intersection is the full 31), so
    // holdout accuracy is chance (~1/k) BY CONSTRUCTION and is not
    // asserted. What IS asserted: the scorer saw real evidence (every
    // test token matched some class) and priors break the symmetric
    // likelihoods — per doc, scores still differ across classes.
    val perDoc = got.keys.groupBy(_._1)
    assert(perDoc.values.forall(_.size == classes.size))
    assert(got.values.forall(v => v._2 > 0), "every doc should match tokens")
    perDoc.foreach { case (id, ks) =>
      assert(ks.map(k => got(k)._3).toSet.size > 1,
        s"doc $id scored identically across classes")
    }
  }

  test("q335 equals a driver-side transition train/eval recount") {
    val got = graft.queries.TemporalOps.q335MarkovEval(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
    val cutoff = java.sql.Timestamp.valueOf(
      graft.queries.TemporalOps.MARKOV_SPLIT).getTime
    val evs = Tables(spark, sfDir).events
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val trans = evs.groupBy(_._1).values.flatMap { xs =>
      xs.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4, b._2 < cutoff)
      }
    }.toSeq
    val model = trans.filter(_._3).groupBy(_._1).view.mapValues { xs =>
      xs.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy(p => (-p._2, p._1)).head._1
    }.toMap
    val want = trans.filterNot(_._3).groupBy(_._1).map { case (p, xs) =>
      val pred = model.get(p)
      val correct = pred.map(pr => xs.count(_._2 == pr).toLong).getOrElse(0L)
      p -> ((pred, xs.size.toLong, correct,
        math.floor(correct * 1e6 / xs.size.toDouble + 0.5).toLong))
    }
    assert(got === want)
  }
}
