package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed APPROXIMATE distinct counts — the seventeenth
  * stateful family (SURVEY §2 q325), and the state-bound counterpoint
  * to q70's exact chain: q70 keeps one dedup tombstone PER DISTINCT
  * KEY per open window (state ∝ cardinality — correct, but at 100 TB a
  * hot window with 10⁹ distinct users holds 10⁹ tombstones), while
  * this family holds ONE mergeable HLL sketch buffer per (window,
  * type) group — state ∝ |open windows × types|, CONSTANT in
  * cardinality, the only shape that survives unbounded key spaces.
  *
  * Mechanics: `hll_sketch_agg` is a partial-mergeable aggregate, so it
  * runs as a plain streaming windowed aggregation — micro-batches
  * build partial sketches, the state store keeps the merged buffer,
  * and the window emits its estimate when the watermark passes its
  * end (append mode). No custom state function is needed — the
  * mergeability of the sketch IS the streaming story.
  */
object StreamSketch {

  def windowedSketchDistinct(events: DataFrame,
      delay: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", delay)
      .select(col("ts"), col("user_id"), col("event_type"))
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"),
        hll_sketch_estimate(col("sk")).as("n_est"))
}
