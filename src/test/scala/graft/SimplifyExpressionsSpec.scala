package graft

import org.apache.spark.sql.functions._

import graft.plans.NormalizeNfc

/** Injected optimizer rule (graft.plans.SimplifyGraftExpressions):
  * double NFC normalization collapses to one pass.
  */
class SimplifyExpressionsSpec extends SparkSpec {

  private def countNfc(planStr: String): Int =
    "normalize_nfc".r.findAllIn(planStr.toLowerCase).length

  test("NormalizeNfc(NormalizeNfc(x)) optimizes to a single pass") {
    val df = Tables(spark, sfDir).documents
      .select(NormalizeNfc(NormalizeNfc(col("text"))).as("t"))
    val analyzed = df.queryExecution.analyzed.toString
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(countNfc(analyzed) == 2, s"expected 2 in analyzed plan:\n$analyzed")
    assert(countNfc(optimized) == 1, s"expected 1 after the rule:\n$optimized")
  }

  test("the collapse preserves the result") {
    val once = Tables(spark, sfDir).documents.limit(50)
      .select(NormalizeNfc(col("text")).as("t")).collect().map(_.getString(0))
    val twice = Tables(spark, sfDir).documents.limit(50)
      .select(NormalizeNfc(NormalizeNfc(col("text"))).as("t")).collect().map(_.getString(0))
    assert(once.sameElements(twice))
  }

  test("SQL registration also benefits (rule sees parser output)") {
    Tables(spark, sfDir).documents.limit(1).createOrReplaceTempView("docs_simplify")
    val df = spark.sql("SELECT normalize_nfc(normalize_nfc(text)) AS t FROM docs_simplify")
    assert(countNfc(df.queryExecution.optimizedPlan.toString) == 1)
  }
}
