package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket keys plans no shuffle exchange") {
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val li2 = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    Bucketing.writeBucketed(li, "li_bucketed_a", 4, Seq("l_orderkey"))
    Bucketing.writeBucketed(li2, "li_bucketed_b", 4, Seq("l_orderkey"))
    val joined = Bucketing.bucketedJoin(spark, "li_bucketed_a", "li_bucketed_b",
      Seq("l_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS li_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS li_bucketed_b")
  }
}
