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

  test("empty inputs probe to zero stats and join to an empty result") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    assert(JoinDispatch.probe(empty, "k") === JoinDispatch.KeyStats(0L, 0L, 0L))
    val fact = Seq((1L, "a")).toDF("k", "v")
    val (out, _) = JoinDispatch.join(fact, empty.withColumnRenamed("v", "w"), "k")
    assert(out.count() === 0L)
    val (out2, _) = JoinDispatch.join(empty, fact.withColumnRenamed("v", "w"), "k")
    assert(out2.count() === 0L)
  }

  test("skew test does not overflow Long at 100TB-scale statistics") {
    // maxKeyRows * keys = 1e10 * 1e9 = 1e19 > Long.MaxValue: the old
    // product form wrapped negative and silently chose PlainShuffle
    val fact = JoinDispatch.KeyStats(rows = 2000000000000L,
      keys = 1000000000L, maxKeyRows = 10000000000L)
    val dim = JoinDispatch.KeyStats(rows = 2000000000L, keys = 2000000000L,
      maxKeyRows = 1L)
    assert(JoinDispatch.choose(fact, dim) === SaltedShuffle)
  }
}
