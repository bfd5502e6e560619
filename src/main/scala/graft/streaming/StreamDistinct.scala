package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chained stateful streaming: exact windowed DISTINCT counts via
  * streaming deduplication feeding a windowed aggregation (SURVEY §2
  * q70) — the sixth streaming family, and the only one that needs TWO
  * stateful operators in one query (Spark supports stateful chaining
  * in append mode when every stage carries the event-time column).
  *
  * Stage 1 keeps one row per (event_type, user_id, window) — state is
  * one tombstone per distinct key, evicted when the watermark passes
  * the window end. Stage 2 counts the survivors per (window,
  * event_type): an exact distinct-user count with bounded state, where
  * `approx_count_distinct` would be the sketch-based fallback and a
  * batch `count(DISTINCT)` would need the full log. Windows emit when
  * the watermark (max event time - delay) passes their end, so a
  * replay emits every window except the still-open tail — exactly the
  * set the batch oracle pins.
  */
object StreamDistinct {

  def windowedDistinct(events: DataFrame, delay: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", delay)
      .select(col("ts"), col("user_id"), col("event_type"))
      .withColumn("win", window(col("ts"), "1 hour"))
      .dropDuplicates("event_type", "user_id", "win")
      .groupBy("win", "event_type")
      .agg(count(lit(1)).as("n_distinct_users"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_distinct_users"))
}
