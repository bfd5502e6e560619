package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audit (SURVEY §7 step 6): the properties that keep
  * these plans viable at 100 TB are asserted, not hoped for — pushed
  * filters, pruned scans, broadcast dimensions, whole-stage codegen,
  * no cartesian products.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** AQE keeps WholeStageCodegen spans out of the plan string until
    * the final plan materializes — and df.write would build a FRESH
    * QueryExecution, so execute this one via collect(). Codegen spans
    * print as "*(n) Node" in the final adaptive plan.
    */
  private def executedPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def hasCodegen(p: String): Boolean =
    p.contains("WholeStageCodegen") || p.contains("*(")

  test("q02: filter and projection reach the parquet scan") {
    val p = plan(graft.queries.Relational.q02FilterProject(spark, sfDir))
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      "filter not pushed to scan")
    assert(p.contains("ReadSchema") && !p.contains("l_returnflag"),
      "projection not pruned: scan reads unused columns")
  }

  test("q03: dimension tables broadcast, no shuffle for nation/region") {
    val p = plan(graft.queries.Relational.q03JoinDims(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
  }

  test("q01: aggregation is partial (map-side combine) before the exchange") {
    val p = executedPlan(graft.queries.Relational.q01AggSummary(spark, sfDir))
    assert(p.contains("partial_"), "expected partial (map-side) aggregation")
    assert(hasCodegen(p), "aggregation fell out of codegen")
  }

  test("per-row astro math stays inside whole-stage codegen") {
    Seq(
      graft.queries.AstroQueries.q16KeplerSemiAxis(spark, sfDir),
      graft.queries.AstroQueries.q19Inclination(spark, sfDir),
      graft.queries.Pipeline.q24OffsetFrame(spark, sfDir)
    ).foreach { df =>
      val p = executedPlan(df)
      assert(hasCodegen(p), "expected codegen span")
      assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
    }
  }

  test("q30: query set broadcasts; native cosine expression in the plan") {
    val p = plan(graft.queries.EmbeddingOps.q30EmbeddingTopk(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side should broadcast")
    assert(p.toLowerCase.contains("cosine_similarity"),
      "native CosineSimilarity expression missing from plan")
  }

  test("q27: band join is an equi-join (hash or sort-merge), never cartesian") {
    val p = plan(graft.queries.DedupOps.q27MinhashLsh(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "band join degraded to a non-equi join")
  }

  test("no query in the inventory plans a cartesian product") {
    SparkEntry.queries.filterNot(_._1 == "q38_stream_window_agg")
      .foreach { case (name, fn) =>
        val p = plan(fn(spark, sfDir))
        assert(!p.contains("CartesianProduct"),
          s"$name plans a cartesian product")
      }
  }

  test("cosine_similarity is registered as a SQL function via extensions") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    df.createOrReplaceTempView("cosreg_probe")
    val sim = spark.sql("SELECT cosine_similarity(a, b) AS s FROM cosreg_probe")
      .collect().head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }
}
