package graft

import org.apache.spark.sql.functions._

/** Round-8 batch-50 spec: Avro roundtrip (q407) — the fourth row of
  * the interchange matrix. The recompute never touches Avro (it rolls
  * the parquet table up directly), so a lossy Avro writer/reader would
  * diverge it; a second test pins the roundtrip property itself
  * (row-for-row equality after write→read) plus the plan shape (avro
  * scan, pushed source predicate).
  */
class Batch50Spec extends SparkSpec {

  private val AVRO_FMT = graft.queries.CorpusOps.AVRO_FMT

  test("q407 equals a parquet-direct rollup (Avro adds nothing, loses nothing)") {
    val got = graft.queries.CorpusOps.q407AvroRoundtrip(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val want = Tables(spark, sfDir).documents
      .filter(col("source") =!= "src1")
      .select("source", "lang", "text", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getString(2).codePointCount(0, r.getString(2).length).toLong,
        r.getLong(3)))
      .groupBy(t => (t._1, t._2)).map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_._3).sum,
          rs.map(_._4).min, rs.map(_._4).max))
      }
    assert(got === want)
  }

  test("q407 roundtrip is lossless and the avro scan pushes the filter") {
    import graft.queries.Scratch
    val docs = Tables(spark, sfDir).documents
    val tmp = Scratch.dir("avro_spec")
    docs.write.mode("overwrite").format(AVRO_FMT).save(s"$tmp/c")
    val back = spark.read.format(AVRO_FMT).load(s"$tmp/c")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      docs.schema.map(f => (f.name, f.dataType)))
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a === b, "avro write->read must roundtrip every row exactly")
    val p = back.filter(col("source") =!= "src1")
      .groupBy("source").count()
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("avro"), s"expected an avro scan:\n$p")
    assert(p.contains("PushedFilters") && p.contains("source"),
      s"source predicate not pushed into the avro scan:\n$p")
  }
}
