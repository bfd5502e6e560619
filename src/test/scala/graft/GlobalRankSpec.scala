package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {

  test("distributed global row number equals the single-partition window") {
    import spark.implicits._
    // deterministic multi-partition input with duplicate sort values
    val df = (1 to 5000).map(i => ((i * 7919) % 997, i.toLong))
      .toDF("k", "id").repartition(13)
    val got = GlobalRank.withRowNumber(df, "r", col("k"), col("id"))
      .select("k", "id", "r")
    val want = df.withColumn("r",
      row_number().over(Window.orderBy("k", "id")).cast("long"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("distributed running sum equals the single-partition window") {
    import spark.implicits._
    val df = (1 to 3000).map(i => ((i * 31) % 211, i.toLong, (i % 7 - 3).toLong))
      .toDF("k", "id", "v").repartition(11)
    val got = GlobalRank.withRunningSum(df, "rs", col("v"), col("k"), col("id"))
      .select("k", "id", "v", "rs")
    val want = df.withColumn("rs",
      sum("v").over(Window.orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("global rank plan has no single-partition global window") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 10, i.toLong)).toDF("k", "id")
    val ranked = GlobalRank.withRowNumber(df, "r", col("k"), col("id"))
    // the one Window node must be partitioned by the physical pid (the
    // whole point: no ORDER-BY-only window collapsing to one task)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"),
      s"expected a __pid-partitioned window, got:\n$plan")
  }
}
