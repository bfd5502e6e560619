package graft

import graft.operators.HeavyHitters
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  test("sketch top-k equals the exact vocabulary top-k on the corpus") {
    val toks = Tables(spark, sfDir).documents
      .select(explode(tokens(col("text"))).as("token"))
    val k = graft.queries.LlmText.VOCAB_TOP_K
    val exact = graft.queries.LlmText.q42VocabTopk(spark, sfDir)
      .select(col("token"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val sketched = HeavyHitters.topK(toks, "token", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(sketched == exact,
      "sketch+recount must reproduce the exact top-k on this vocabulary")
  }

  test("survival bound holds under a tiny summary and heavy skew") {
    import spark.implicits._
    // 10k rows: item "hot" 4000x, "warm" 1000x, 5000 singletons.
    val rows = Seq.fill(4000)("hot") ++ Seq.fill(1000)("warm") ++
      (0 until 5000).map(i => s"noise_$i")
    val df = new scala.util.Random(7).shuffle(rows).toDF("item").repartition(8)
    // summarySize 64: guaranteed survival for count > 10000/64 ~ 157
    val got = HeavyHitters.topK(df, "item", k = 2, summarySize = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("hot" -> 4000L, "warm" -> 1000L),
      s"skewed hitters lost under bounded summaries: ${got.toList}")
  }
}
