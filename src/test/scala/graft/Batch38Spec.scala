package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-38 spec: binary-quantized ANN (q366), HLL cube
  * margins (q367), Hill tail index (q368).
  */
class Batch38Spec extends SparkSpec {

  test("q366 equals a driver-side sign-pack + Hamming + rerank recompute") {
    import graft.queries.EmbeddingOps.{NUM_QUERIES, TOP_K}
    import graft.queries.VectorOps.BQ_CAND_K
    val embs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def word(a: Array[Float]): Long =
      (0 until 64).map(d => if (a(d) > 0) 1L << d else 0L).sum
    def simNano(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e9 + 0.5).toLong
    }
    val words = embs.map { case (id, a) => (id, a, word(a)) }
    val want = words.filter(_._1 < NUM_QUERIES).sortBy(_._1)
      .flatMap { case (qid, qa, qw) =>
        val cands = words.filter(_._1 != qid)
          .map { case (id, a, w) =>
            (id, a, java.lang.Long.bitCount(w ^ qw))
          }
          .sortBy(t => (t._3, t._1)).take(BQ_CAND_K)
        cands.map { case (id, a, _) => (id, simNano(qa, a)) }
          .sortBy(t => (-t._2, t._1)).take(TOP_K).zipWithIndex
          .map { case ((id, _), i) => (qid, (i + 1).toLong, id) }
      }.toSeq
    val got = graft.queries.VectorOps.q366BinaryAnn(spark, sfDir)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSeq
    assert(got === want)
  }

  test("q367 margin estimates from merged cell sketches equal single-pass sketches") {
    import graft.operators.DistinctSketch
    val ev = Tables(spark, sfDir).events
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val cells = DistinctSketch.sketchBy(ev, "user_id", "event_type", "day")
    // mergeability: union of per-(type,day) sketches == direct per-type
    // sketch of the raw column (HLL is deterministic, so exact equality)
    val merged = DistinctSketch.rollup(cells, "event_type")
      .select(col("event_type"), col("n_distinct_est").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = DistinctSketch.rollup(
      DistinctSketch.sketchBy(ev, "user_id", "event_type"), "event_type")
      .select(col("event_type"), col("n_distinct_est").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
    // and the gated frame's flags hold (estimates within 5% of exact)
    val flags = graft.queries.CorpusOps.q367HllCubeMargins(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getBoolean(3)))
    assert(flags.nonEmpty && flags.forall(_._2),
      s"margins out of bound: ${flags.filterNot(_._2).mkString(",")}")
  }

  test("q368 equals a driver-side Hill recompute") {
    import graft.queries.StatsOps.HILL_K
    val xs = Tables(spark, sfDir).orders
      .select(col("o_totalprice"), col("o_orderkey")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(t => (-t._1, t._2)).take(HILL_K + 1)
    val xk1 = xs.last._1
    val terms = xs.take(HILL_K)
      .map(t => math.floor(math.log(t._1 / xk1) * 1e6 + 0.5).toLong)
    val sumLn = terms.sum
    val want = (HILL_K.toLong, math.floor(xk1 * 100 + 0.5).toLong, sumLn,
      math.floor(HILL_K.toDouble * 1e12 / sumLn.toDouble + 0.5).toLong)
    val got = graft.queries.StatsOps.q368HillTail(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).head
    assert(got === want)
    // the fixture's price tail is bounded (uniform-ish), so alpha is
    // LARGE (thin tail) - the estimator must say "means are safe"
    assert(got._4 > 2000000L)
  }
}
