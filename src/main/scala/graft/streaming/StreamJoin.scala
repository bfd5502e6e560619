package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the last Structured
  * Streaming join family next to windowed agg (q38), stateful
  * sessionization (q39), streaming dedup (q51) and stream-static
  * enrichment (q56): TWO live streams joined on a key plus an
  * event-time range (here: purchases attributed to every click of the
  * same user in the preceding window).
  *
  * Scale shape: both sides carry a watermark and the join condition
  * bounds p_ts to [c_ts, c_ts + window), so Spark derives state
  * eviction for BOTH sides — each side buffers only `window` +
  * watermark-delay of history per key in the state store instead of
  * growing forever. The join itself shuffles both streams on user_id
  * once; the interval predicate is evaluated inside the keyed state
  * match, never as a cross product. Works identically on batch frames
  * (withWatermark is a no-op in batch), which is what the parity
  * oracle runs.
  */
object StreamJoin {

  /** (click, purchase) pairs per user with the purchase inside
    * [click, click + windowHours): user_id, click_id, purchase_id,
    * lag_us. Integer microsecond lag — no cross-engine float math.
    */
  def clickPurchase(clicks: DataFrame, purchases: DataFrame,
                    windowHours: Int): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "0 seconds")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "0 seconds")
    c.join(p,
        col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") < col("c_ts") + expr(s"INTERVAL $windowHours HOURS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }
}
