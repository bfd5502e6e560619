package graft

import graft.sources.SchemaEvolution
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reading a table written by several pipeline versions: columns added
  * later surface as nulls on old shards (mergeSchema), and width drift
  * — which mergeSchema rejects outright — conforms per shard through
  * the evolved-read path, with pushdown surviving.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("merged read unions additive shard schemas and null-fills missing columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evo").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/part=v1")
    Seq((3L, "gamma", "en", 0.5), (4L, "delta", "de", 0.9))
      .toDF("doc_id", "text", "lang", "score")
      .write.parquet(s"$dir/part=v2")

    val merged = SchemaEvolution.readMerged(spark, dir)
    assert(merged.columns.toSet ==
      Set("doc_id", "text", "lang", "score", "part"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows.length == 4)
    // old shards surface the new columns as nulls
    assert(rows.take(2).forall(r => r.isNullAt(r.fieldIndex("lang"))))
    assert(rows.drop(2).forall(r => r.getAs[String]("lang") != null))
  }

  test("evolved read tolerates the int->long width drift mergeSchema rejects") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evo2").toString
    Seq((1, "a"), (2, "b")).toDF("doc_id", "text").write.parquet(s"$dir/v1")
    Seq((3L, "c", "en"), (4L, "d", "de"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$dir/v2")

    // the stock merge fails on the width flip (surfaced as
    // SparkException from the footer merge or AnalysisException from
    // planning, depending on layout)...
    intercept[Exception] {
      SchemaEvolution.readMerged(spark, dir).collect()
    }
    // ...the evolved read conforms per shard and unions by name
    val df = SchemaEvolution.readEvolved(spark, dir, "doc_id" -> LongType)
    assert(df.schema("doc_id").dataType == LongType)
    val rows = df.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.take(2).forall(r => r.isNullAt(r.fieldIndex("lang"))))
  }

  test("pushdown and pruning survive the evolved read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evo3").toString
    Seq((1, "a"), (2, "b")).toDF("doc_id", "text").write.parquet(s"$dir/v1")
    Seq((3L, "c", "en")).toDF("doc_id", "text", "lang").write.parquet(s"$dir/v2")
    val df = SchemaEvolution.readEvolved(spark, dir, "doc_id" -> LongType)
      .filter(col("doc_id") > 1).select("doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("doc_id"),
      "filter must reach the per-shard scans")
    assert(df.count() == 2)
  }
}
