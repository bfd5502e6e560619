package graft

/** Diagnostic main (test scope, not shipped): stage decomposition of
  * q168's plan at a given SF dir, to attribute where sf1 time goes.
  * Run: java -cp "classes:test-classes:spark jars" graft.ProbeQ168 sfDir
  */
object ProbeQ168 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("probe-q168")
    import graft.queries.DedupOps._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    // mirror q168Plan's stages, timing each materialization
    val e = Tables(spark, dir).documents
      .select(col("doc_id"),
        explode(graft.plans.ShingleHashSet(col("text"), SHINGLE_N)).as("sh"))
    timed("shingle rows")(e.count())
    val dict = e.groupBy("sh").agg(count(lit(1)).as("df"))
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("df", "sh"))
        .cast("long") - 1)
      .select("sh", "id").persist()
    timed("dict build (vocab)")(dict.count())
    val bmExpr = expr(
      "map_from_entries(transform(array_distinct(" +
        "transform(ids, i -> i div 64)), w -> struct(w, " +
        "aggregate(filter(ids, i -> i div 64 = w), 0L, " +
        "(acc, i) -> acc | shiftleft(1L, cast(i % 64 AS int))))))")
    val docs = e.join(broadcast(dict), "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list("id")).as("ids"))
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_sh"),
        col("ids"), bmExpr.as("bm"))
      .persist()
    timed("docs+bitmaps build")(docs.count())
    def prefixed(len: org.apache.spark.sql.Column) =
      docs.select(col("doc_id"), col("n_sh"),
        posexplode(slice(col("ids"), lit(1), len.cast("int"))))
        .select(col("doc_id"), col("n_sh"), (col("pos") + 1).as("p"),
          col("col").as("id"))
    val ceilTauN = (col("n_sh") * PFX_TAU_NUM + PFX_TAU_DEN - 1)
      .divide(PFX_TAU_DEN).cast("long")
    val ceil2TauN = (col("n_sh") * (2 * PFX_TAU_NUM) +
      (PFX_TAU_NUM + PFX_TAU_DEN) - 1)
      .divide(PFX_TAU_NUM + PFX_TAU_DEN).cast("long")
    val preIdx = prefixed(col("n_sh") - ceil2TauN + 1)
    val prePrb = prefixed(col("n_sh") - ceilTauN + 1)
    timed("preIdx rows")(preIdx.count())
    timed("prePrb rows")(prePrb.count())
    val ubound = lit(1) + least(col("pa.n_sh") - col("pa.p"),
      col("pb.n_sh") - col("pb.p"))
    val candRaw = preIdx.as("pa")
      .join(broadcast(prePrb.as("pb")),
        col("pa.id") === col("pb.id") &&
          (col("pa.n_sh") < col("pb.n_sh") ||
            (col("pa.n_sh") === col("pb.n_sh") &&
              col("pa.doc_id") < col("pb.doc_id"))) &&
          col("pb.n_sh") * PFX_TAU_NUM <= col("pa.n_sh") * PFX_TAU_DEN &&
          ubound * (PFX_TAU_NUM + PFX_TAU_DEN) >=
            (col("pa.n_sh") + col("pb.n_sh")) * PFX_TAU_NUM)
      .select(least(col("pa.doc_id"), col("pb.doc_id")).as("doc_a"),
        greatest(col("pa.doc_id"), col("pb.doc_id")).as("doc_b"))
    timed("candidate emissions")(candRaw.count())
    val cand = candRaw.distinct()
    timed("distinct candidates")(cand.count())
    val bm = docs.select(col("doc_id"), col("n_sh"), col("bm"))
    def side(tag: String) = bm.toDF(s"doc_${tag}1", s"n_${tag}1", s"${tag}bm")
    val interExpr = expr(
      "aggregate(map_values(map_zip_with(abm, bbm, " +
        "(k, x, y) -> bit_count(coalesce(x, 0L) & coalesce(y, 0L)))), " +
        "0L, (acc, v) -> acc + cast(v AS bigint))")
    val out = cand
      .join(broadcast(side("a")), col("doc_a") === col("doc_a1"))
      .join(broadcast(side("b")), col("doc_b") === col("doc_b1"))
      .withColumn("n_inter", interExpr)
      .filter(col("n_inter") * PFX_TAU_DEN >=
        (col("n_a1") + col("n_b1") - col("n_inter")) * PFX_TAU_NUM)
    timed("verified pairs (full)")(out.count())
    timed("full q168 end-to-end")(
      q168PrefixJoin(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
