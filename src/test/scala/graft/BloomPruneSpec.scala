package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  test("prune keeps every true match (no false negatives) and shrinks the fact side") {
    val t = Tables(spark, sfDir)
    val dim = t.supplier.filter(col("s_suppkey") % 10 === 0)
    val fact = t.lineitem
    val pruned = BloomPrune.prune(fact, col("l_suppkey"), dim, col("s_suppkey"),
      expectedItems = 1000)

    val exact = fact.join(dim.select("s_suppkey"),
      col("l_suppkey") === col("s_suppkey"), "left_semi")
    // superset of the exact semi-join, subset of the fact table
    assert(exact.exceptAll(pruned.select(exact.columns.map(col): _*)).count() == 0,
      "bloom prune dropped a true match")
    val (nFact, nPruned, nExact) = (fact.count(), pruned.count(), exact.count())
    assert(nPruned >= nExact && nPruned <= nFact)
    assert(nPruned < nFact, "prune removed nothing — filter not applied?")
    // 1% fpp on a 90%-selective prune: expect well under 5% extra rows
    assert(nPruned - nExact <= (nFact * 0.05).toLong,
      s"false-positive blowup: exact=$nExact pruned=$nPruned fact=$nFact")
  }

  test("the probe is a scan-stage filter: no exchange, no join, codegen") {
    val t = Tables(spark, sfDir)
    val bytes = BloomPrune.buildFilter(
      t.supplier.filter(col("s_suppkey") % 10 === 0), col("s_suppkey"), 1000)
    val pruned = t.lineitem.filter(BloomPrune.mightContain(bytes, col("l_suppkey")))
    pruned.collect()
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), "bloom predicate missing from plan")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "prune must be a pure filter, not a shuffle or join")
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      "bloom probe fell out of codegen")
  }
}
