package graft.streaming

import graft.functions.Exact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment: a streaming fact joined to a batch
  * dimension before aggregation — the streaming counterpart of the
  * q03 broadcast-dimension pattern and the fourth streaming family
  * next to windowed agg (q38), stateful sessionization (q39) and
  * streaming dedup (q51).
  *
  * Scale shape: Spark re-plans the static side per micro-batch, so a
  * small dimension stays a broadcast-hash join against every batch —
  * the stream side never shuffles for the join; the only exchange is
  * the aggregation's, keyed on the (coarse) enriched columns. A
  * dimension too big to broadcast would shuffle EVERY micro-batch —
  * at that point pre-bucket the dimension and the checkpointed state
  * store key to the same partitioning instead.
  */
object StreamEnrich {

  /** Events enriched with the customer's market segment, aggregated
    * per (segment, event type): count + exact decimal sum. Works for
    * a streaming OR batch `events` frame — the parity oracle runs the
    * identical plan in batch.
    */
  def segmentTypeAgg(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.sumExact(col("value")).as("sum_value"))
}
