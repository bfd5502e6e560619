package graft

import graft.queries.{EmbeddingOps, VectorOps}
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q62 quantization codes stay within int8 and preserve sign") {
    val bad = Tables(spark, sfDir).embeddings
      .select(explode(zip_with(
        VectorOps.quantize(col("embedding")),
        col("embedding"),
        (q, x) => struct(q.as("q"), x.as("x")))).as("p"))
      .filter(col("p.q") < -128 || col("p.q") > 127 ||
        (col("p.x") >= 0 && col("p.q") < 0) ||
        (col("p.x") < 0 && col("p.q") >= 0))
    assert(bad.count() == 0)
  }

  test("q62 has an entry and oracle, returns TOP_K rows per query") {
    assert(VectorOps.oracles.contains("q62_quantized_ann"))
    val d = VectorOps.q62QuantizedAnn(spark, sfDir)
    val perQuery = d.groupBy("query_id").count().collect()
    assert(perQuery.length == EmbeddingOps.NUM_QUERIES)
    assert(perQuery.forall(_.getLong(1) == EmbeddingOps.TOP_K))
  }

  test("q62 recall vs exact brute-force top-k is high") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(EmbeddingOps.q30EmbeddingTopk(spark, sfDir))
    val quant = pairs(VectorOps.q62QuantizedAnn(spark, sfDir))
    val recall = (exact & quant).size.toDouble / exact.size
    // int8 candidates + exact rerank should recover nearly all true
    // neighbors; the cut only loses pairs the integer dot misranks
    // past RERANK_CAND
    assert(recall > 0.9, s"quantized rerank recall $recall too low")
  }

  test("q63 clusters contain only genuinely similar members (precision)") {
    val emb = Tables(spark, sfDir).embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val rows = VectorOps.q63SemanticDedup(spark, sfDir)
      .filter(col("cluster_size") > 1).collect()
    assert(rows.nonEmpty, "expected at least one semantic dup cluster")
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      val ids = members.map(_.getLong(0))
      assert(ids.min == cid, s"canonical survivor of $cid is not min id")
      // every member joined the cluster through a >= SEM_MIN_SIM edge
      // chain; direct similarity to SOME other member must hold
      ids.foreach { id =>
        val best = ids.filter(_ != id).map(o => cos(emb(id), emb(o))).max
        assert(best >= VectorOps.SEM_MIN_SIM - 1e-9,
          s"vec $id in cluster $cid has max in-cluster sim $best")
      }
    }
  }

  test("q69 refines a full centroid per non-empty cell, covering all vectors") {
    val rows = VectorOps.q69KmeansStep(spark, sfDir).collect()
    val byCell = rows.groupBy(_.getLong(0))
    byCell.foreach { case (cell, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L until 64L),
        s"cell $cell missing dimensions")
      assert(rs.map(_.getLong(3)).distinct.length == 1,
        s"cell $cell member count must not vary by dimension")
      rs.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    }
    val totalMembers = byCell.values.map(_.head.getLong(3)).sum
    assert(totalMembers == Tables(spark, sfDir).embeddings.count())
  }

  test("q76 recall eval agrees with a direct set comparison of q30/q31") {
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(EmbeddingOps.q30EmbeddingTopk(spark, sfDir))
    val approx = sets(EmbeddingOps.q31LshAnn(spark, sfDir))
    val got = VectorOps.q76AnnRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (q, (k, hit, recall)) =>
      assert(k == EmbeddingOps.TOP_K)
      assert(hit == (exact(q) & approx.getOrElse(q, Set.empty)).size)
      assert(recall == hit.toDouble / k)
    }
    val mean = got.values.map(_._3).sum / got.size
    assert(mean > 0.5, s"LSH mean recall $mean should exceed 0.5 (q31 spec bound)")
  }

  test("q63 keep flags mark exactly one survivor per cluster") {
    val d = VectorOps.q63SemanticDedup(spark, sfDir)
    val perCluster = d.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    assert(perCluster.filter(col("n_keep") =!= 1L).count() == 0)
    assert(d.count() == Tables(spark, sfDir).embeddings.count())
  }

  test("q82 has an entry and oracle, returns TOP_K ranked rows per query") {
    assert(VectorOps.oracles.contains("q82_pq_ann"))
    val rows = VectorOps.q82PqAnn(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == EmbeddingOps.NUM_QUERIES)
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to EmbeddingOps.TOP_K),
        s"query $q ranks must be 1..TOP_K")
      assert(rs.forall(_.getLong(2) != q), s"query $q must not match itself")
    }
  }

  test("q82 PQ codes + exact rerank recover most true neighbors") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(EmbeddingOps.q30EmbeddingTopk(spark, sfDir))
    val pq = pairs(VectorOps.q82PqAnn(spark, sfDir))
    val recall = (exact & pq).size.toDouble / exact.size
    // 12-bit codes are a coarse sketch; the ADC cut + exact rerank
    // should still recover a solid majority of the true top-k
    assert(recall > 0.5, s"PQ recall $recall too low")
  }

  test("q122 JL projection matches a driver-side recompute and preserves geometry") {
    val vecs = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val expected = vecs.flatMap { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
      (0 until VectorOps.JL_K).map { k =>
        ((id, k), q.indices.map(d => q(d) * VectorOps.jlSign(d, k)).sum)
      }
    }.toMap
    val got = VectorOps.q122JlProjection(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == expected)
    // JL property sanity on a small sample: projected squared distances
    // (scaled by 1/K) track the original within a loose factor
    val sample = vecs.take(20)
    val proj: Map[Long, Array[Double]] = sample.map { case (id, _) =>
      id -> (0 until VectorOps.JL_K).map(k => got((id, k)).toDouble / 1e6).toArray
    }.toMap
    val ratios = for {
      (ia, va) <- sample; (ib, vb) <- sample if ia < ib
    } yield {
      val d2 = va.zip(vb).map { case (a, b) => (a - b) * (a - b) }.sum.toDouble
      val p2 = proj(ia).zip(proj(ib)).map { case (a, b) => (a - b) * (a - b) }.sum /
        VectorOps.JL_K
      p2 / d2
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.5 && mean < 2.0, s"JL distortion off: mean ratio $mean")
  }

  test("q144 kNN prediction is the majority label of the top-k reference neighbors") {
    import org.apache.spark.sql.functions._
    // neighbors recomputed with the same native cosine expression,
    // voted driver-side
    val emb = Tables(spark, sfDir).embeddings
    val queries = emb.filter(col("vec_id") < EmbeddingOps.NUM_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("true_label"))
    val corpus = emb.filter(col("vec_id") >= EmbeddingOps.NUM_QUERIES)
    val ranked = corpus.join(broadcast(queries.select("query_id", "q_emb")), lit(true))
      .withColumn("sim",
        graft.plans.CosineSimilarity(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rank") <= EmbeddingOps.TOP_K)
      .select("query_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val expected = ranked.groupBy(_._1).map { case (q, ns) =>
      val votes = ns.groupBy(_._2).map { case (l, v) => (l, v.length.toLong) }
      val (lbl, n) = votes.toSeq.minBy { case (l, c) => (-c, l) }
      q -> ((lbl, n))
    }
    val trueLabels = queries.select("query_id", "true_label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = EmbeddingOps.q144KnnClassifier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (q, (lbl, n)) =>
      val (tl, pl, nv, c) = got(q)
      assert(tl == trueLabels(q), s"query $q true label")
      assert(pl == lbl && nv == n, s"query $q prediction")
      assert(c == (if (pl == tl) 1L else 0L), s"query $q hit flag")
    }
    // votes are bounded by k and at least ceil(k / #labels)
    got.values.foreach { case (_, _, nv, _) =>
      assert(nv >= 1L && nv <= EmbeddingOps.TOP_K)
    }
  }

  test("q154 embedding audit matches driver-side norms and folds to the summary") {
    import graft.queries.VectorOps
    val vecs = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val expected = vecs.map { case (id, e) =>
      var acc = 0.0
      e.foreach(x => acc += x.toDouble * x.toDouble)
      val norm = math.floor(math.sqrt(acc) * 1e6 + 0.5).toLong
      val nz = e.count(_ == 0.0f).toLong
      val nn = e.count(_.isNaN).toLong
      val fl = if (norm < VectorOps.NORM_LO_MICRO ||
        norm > VectorOps.NORM_HI_MICRO || nn > 0) 1L else 0L
      id -> ((e.length.toLong, norm, nz, nn, fl))
    }.toMap
    val got = VectorOps.q154EmbeddingAudit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    expected.foreach { case (id, e) => assert(got(id) == e, s"vec $id") }
    val sm = got(-1L)
    assert(sm._1 == expected.values.map(_._1).max)
    assert(sm._2 == expected.values.map(_._2).sum / expected.size)
    assert(sm._3 == expected.values.map(_._3).sum)
    assert(sm._4 == expected.values.map(_._4).sum)
    assert(sm._5 == expected.values.map(_._5).sum)
    // healthy synthetic embeddings: nothing NaN
    assert(sm._4 == 0L)
  }

  test("q241 MRR agrees with a driver-side first-hit scan") {
    val exact = graft.queries.EmbeddingOps.q30EmbeddingTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = graft.queries.EmbeddingOps.q31LshAnn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val got = graft.queries.VectorOps.q241MrrEval(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Int]("first_hit_rank"), r.getAs[Long]("rr_micro"))).toMap
    approx.groupBy(_._1).foreach { case (q, rs) =>
      val hit = rs.filter(t => exact(q).contains(t._3)).map(_._2)
      val want =
        if (hit.isEmpty) (0, 0L)
        else (hit.min, math.floor(1e6 / hit.min).toLong)
      assert(got(q) === want, s"query $q")
    }
    // reciprocal rank lives in (0, 1e6]
    got.values.foreach { case (r, rr) =>
      assert((r == 0 && rr == 0L) || (rr > 0L && rr <= 1000000L))
    }
  }

  test("q224 drift equals a driver-side centroid recompute") {
    import org.apache.spark.sql.functions._
    val rows = Tables(spark, sfDir).embeddings
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0),
        r.getAs[scala.collection.Seq[Float]](1).map(f =>
          math.floor(f.toDouble * 1e6 + 0.5).toLong).toArray))
    val dims = rows.head._2.length
    val byLabel = rows.groupBy(_._1)
    val gSums = Array.tabulate(dims)(d => rows.map(_._2(d)).sum)
    val gn = rows.length.toLong
    val got = graft.queries.VectorOps.q224CentroidDrift(spark, sfDir)
      .collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n"),
        r.getAs[Long]("drift_micro"), r.getAs[Long]("centroid_norm_micro")))
      .toMap
    byLabel.foreach { case (label, vecs) =>
      val n = vecs.length.toLong
      val s = Array.tabulate(dims)(d => vecs.map(_._2(d)).sum)
      val d2 = (0 until dims).map { d =>
        val diff = (s(d) * gn - gSums(d) * n).toDouble
        diff * diff
      }.foldLeft(0.0)(_ + _)
      val s2 = (0 until dims).map(d => s(d).toDouble * s(d)).foldLeft(0.0)(_ + _)
      val wantDrift = math.floor(math.sqrt(d2) / (n * gn) * 1e6 + 0.5).toLong
      val wantNorm = math.floor(math.sqrt(s2) / n + 0.5).toLong
      val (gotN, gotDrift, gotNorm) = got(label)
      assert(gotN === n, s"label $label n")
      assert(gotDrift === wantDrift, s"label $label drift")
      assert(gotNorm === wantNorm, s"label $label norm")
    }
  }
}
