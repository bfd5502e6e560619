package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Native TopKPerGroup operator (graft.plans.TopKPerGroup*):
  * equivalence vs the window-rank formulation, edge cases, and the
  * plan property that motivates it (no sort of the input).
  */
class TopKSpec extends SparkSpec {

  private def orders = Tables(spark, sfDir).orders
    .select("o_custkey", "o_orderkey", "o_totalprice")

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).drop("rk")
  }

  test("matches the row_number() formulation exactly") {
    for (k <- Seq(1, 3, 10)) {
      val native = TopK.perGroup(orders,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k)
        .collect().map(_.toSeq).toSet
      val window = windowTopK(k).collect().map(_.toSeq).toSet
      assert(native == window, s"k=$k: native != window result")
    }
  }

  test("k larger than every group passes all rows through") {
    val n = TopK.perGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_orderkey").asc), 1000000).count()
    assert(n == orders.count())
  }

  test("ascending order keeps the smallest; groups smaller than k survive whole") {
    val df = spark.range(10).toDF("id")
      .withColumn("g", col("id") % 3)
    val out = TopK.perGroup(df, Seq(col("g")), Seq(col("id").asc), 2)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(out == Set((0L, 0L), (0L, 3L), (1L, 1L), (1L, 4L), (2L, 2L), (2L, 5L)))
  }

  test("empty input yields empty output") {
    val df = spark.range(10).toDF("id").filter(col("id") < 0)
      .withColumn("g", col("id") % 3)
    assert(TopK.perGroup(df, Seq(col("g")), Seq(col("id").asc), 2).count() == 0)
  }

  test("plan: custom exec present, one exchange, and NO sort of the input") {
    val df = TopK.perGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(p.contains("TopKPerGroup"), s"custom exec not planned:\n$p")
    assert(!p.contains("Sort "), s"unexpected Sort in plan:\n$p")
    assert(p.contains("Exchange hashpartitioning"),
      s"expected the strategy-declared hash exchange:\n$p")
  }

  test("global top-k (no keys) funnels to a single partition") {
    val out = TopK.perGroup(orders, Seq.empty,
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
    assert(out.count() == 5)
    val byWindow = orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(5)
      .collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet == byWindow)
  }
}
