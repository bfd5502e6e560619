package graft

import graft.operators.{MediaRecord, MultimodalStub}
import graft.queries.{DedupOps, EmbeddingOps, LlmText, SessionOps}
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {

  test("every llm query has an oracle (except rows-only q31) and runs non-empty") {
    val all = LlmText.queries ++ DedupOps.queries ++ EmbeddingOps.queries ++ SessionOps.queries
    val oracles = LlmText.oracles ++ DedupOps.oracles ++ EmbeddingOps.oracles ++ SessionOps.oracles
    all.foreach { case (name, fn) =>
      if (name != "q31_lsh_ann")
        assert(oracles.contains(name), s"$name missing oracle")
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
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
}
