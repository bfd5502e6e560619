package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed QUANTILE sketches — the eighteenth stateful
  * family (SURVEY §2 q339), and the quantile counterpart to q325's
  * HLL distinct: a windowed p50/p90 of event values cannot be
  * maintained exactly in bounded state (an exact quantile needs every
  * value until the window closes — state ∝ window population), so the
  * state held per (window, type) group is ONE mergeable KLL-style
  * sketch buffer (operators/QuantileSketch — the library's own
  * Aggregator, not a built-in): O(k + log n) doubles per group,
  * CONSTANT-ish in population, with the sketch's published rank bound
  * as the accuracy contract.
  *
  * Mechanics: the udaf-wrapped Aggregator is a typed imperative
  * aggregate with a real merge, so it runs as a plain streaming
  * windowed aggregation — micro-batches build partial sketches, the
  * state store keeps the merged buffer (serialized via the buffer
  * encoder), and the window emits its final sketch when the watermark
  * passes its end (append mode). Same shape as q325: the sketch's
  * partial-mergeability IS the streaming story; no custom state
  * function.
  */
object StreamQuantile {

  def windowedSketchQuantile(events: DataFrame,
      delay: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", delay)
      .select(col("ts"), col("event_type"), col("value"))
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(graft.operators.QuantileSketch.sketch(col("value")).as("sk"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("sk"))
}
