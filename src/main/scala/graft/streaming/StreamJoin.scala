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

  /** LEFT-OUTER stream-stream variant: every click emits — matched
    * clicks pair with each in-window purchase, UNMATCHED clicks emit
    * one null-padded row once the watermark proves no purchase can
    * still arrive (the "abandoned click" record an attribution
    * pipeline needs as a first-class row, not as an absence).
    *
    * Finality contract: Structured Streaming can only emit the
    * null-padded side of an outer join after the watermark passes the
    * click's join window — a click near the stream head would sit in
    * state, correct but unemitted, until more data arrives. Callers
    * therefore pass `clickBound` (every click at or below it is
    * strictly flushable: bound + window + margin < max event time seen)
    * and the batch-parity oracle applies the SAME bound, making
    * stream and batch enumerate identical row sets. Nulls are
    * coalesced to -1 sentinels so the gate never compares nullable
    * BIGINTs (pandas would widen them to float64).
    */
  def clickPurchaseOuter(clicks: DataFrame, purchases: DataFrame,
                         windowHours: Int,
                         clickBound: java.sql.Timestamp): DataFrame = {
    // Watermark BEFORE the type/bound filters: the global watermark is
    // min over both sides, and each side's event-time max is tracked at
    // its EventTimeWatermark operator. Watermarking the filtered click
    // stream would freeze the click watermark at `clickBound` (no click
    // above it survives the filter), so unmatched clicks near the bound
    // could never be proven final. Tracking the RAW stream lets any
    // later event (including a flush sentinel of a filtered-out type)
    // advance both sides.
    val c = clicks.withWatermark("ts", "0 seconds")
      .filter(col("event_type") === "click")
      .filter(col("ts") <= lit(clickBound))
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "0 seconds")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    c.join(p,
        col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") < col("c_ts") + expr(s"INTERVAL $windowHours HOURS"),
        "left_outer")
      .select(col("user_id"), col("click_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(unix_micros(col("p_ts")) - unix_micros(col("c_ts")),
          lit(-1L)).as("lag_us"))
  }
}
