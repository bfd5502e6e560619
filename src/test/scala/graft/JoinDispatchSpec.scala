package graft

import graft.operators.JoinDispatch
import graft.operators.JoinDispatch.{BroadcastDim, PlainShuffle, SaltedShuffle}
import org.apache.spark.sql.functions._

class JoinDispatchSpec extends SparkSpec {
  import spark.implicits._

  private def dim(n: Int) = (1 to n).map(i => (i.toLong, s"d$i")).toDF("k", "v")

  test("small dim broadcasts; plan confirms no shuffle of the fact") {
    val fact = (1 to 5000).map(i => (i.toLong % 100 + 1, i)).toDF("k", "x")
    val (out, s) = JoinDispatch.join(fact, dim(100), "k")
    assert(s === BroadcastDim)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    assert(out.count() === 5000)
  }

  test("skewed fact with a large dim salts; result equals a plain join") {
    // one hot key holds 90% of rows -> maxKeyRows * keys >> 16 * rows
    val fact = ((1 to 9000).map(_ => 1L) ++ (1 to 1000).map(i => (i % 500 + 2).toLong))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "x")
    val bigDim = dim(600)
    val (out, s) = JoinDispatch.join(fact, bigDim, "k", broadcastMaxRows = 10)
    assert(s === SaltedShuffle)
    val plain = fact.join(bigDim, "k")
    assert(out.count() === plain.count())
    // row multiset identical
    assert(out.select("k", "x", "v").except(plain.select("k", "x", "v")).count() === 0)
  }

  test("well-spread big sides take the plain shuffle join") {
    val fact = (1 to 20000).map(i => (i.toLong % 5000 + 1, i)).toDF("k", "x")
    val bigDim = dim(5000)
    val (out, s) = JoinDispatch.join(fact, bigDim, "k", broadcastMaxRows = 10)
    assert(s === PlainShuffle)
    assert(out.count() === 20000)
  }

  test("probe statistics are exact") {
    val fact = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val st = JoinDispatch.probe(fact, "k")
    assert(st.rows === 3L && st.keys === 2L && st.maxKeyRows === 2L)
  }
}
