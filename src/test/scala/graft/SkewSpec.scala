package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join on heavily skewed keys") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = spark.range(0, 20000)
      .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", factor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salt spreads the hot key across buckets") {
    import spark.implicits._
    val big = spark.range(0, 8000).select(lit(7L).as("k"), col("id").as("payload"))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).cast("int"))
    val counts = salted.groupBy("__salt").count().collect().map(_.getLong(1))
    assert(counts.length == 8, "hot key should hit every salt bucket")
    assert(counts.max < 8000 * 0.25, s"salting too uneven: ${counts.toSeq}")
  }
}
