package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}

import graft.plans.TopKPerGroup

/** Top-k rows per group via the native one-pass bounded-heap operator
  * ([[graft.plans.TopKPerGroupExec]]) — no per-partition sort, unlike
  * the `row_number() <= k` window formulation.
  *
  * The ordering must be total (include a unique tiebreaker) for a
  * deterministic result, exactly as with `row_number`. `keys` empty
  * means global top-k (all rows funnel through one task — prefer
  * Spark's own TakeOrderedAndProject/`limit` for that; this operator
  * earns its keep when there ARE keys).
  *
  * Requires the session to carry [[graft.plans.GraftExtensions]]
  * (GraftSession does), which injects the planner strategy.
  */
object TopK {

  /** Keep the first k rows per key under `order` (ascending SortOrder
    * semantics: `col.asc` keeps the smallest, `col.desc` the largest).
    */
  def perGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val keyExprs = keys.map(GraftBridge.catalyst)
    val sortExprs = order.map(GraftBridge.catalyst).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    GraftBridge.dataset(df.sparkSession,
      TopKPerGroup(keyExprs, sortExprs, k, df.queryExecution.logical))
  }
}
