package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming aggregation builders (SURVEY §2 q38).
  *
  * The same logical plan serves batch and stream — pass a batch
  * DataFrame and it aggregates; pass a readStream DataFrame and it
  * becomes a stateful windowed aggregation. q38 runs the complete-mode
  * variant; `withWatermark` is the production (append-mode, bounded
  * state) configuration for an unbounded source such as Kafka.
  */
object StreamAgg {

  /** Tumbling 1-hour window counts + value sums per event type. */
  def hourlyTypeAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Exact.sumExact(col("value")).as("sum_value"))
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("n_events"), col("sum_value"))

  /** Watermarked variant: bounds state for append-mode output on an
    * unbounded source. Late events beyond `delay` are dropped — the
    * correct trade at 100 TB/day where state must not grow without
    * bound.
    */
  def hourlyTypeAggWatermarked(events: DataFrame, delay: String = "2 hours"): DataFrame =
    hourlyTypeAgg(events.withWatermark("ts", delay))

  /** Replay a parquet file/dir as a micro-batched stream with an
    * explicit schema (file stream sources cannot infer).
    */
  def parquetStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    val dir = {
      val f = new java.io.File(path)
      if (f.isDirectory) path
      else {
        import java.nio.file.{Files, Paths}
        val d = Files.createTempDirectory("graft_stream")
        Files.createSymbolicLink(d.resolve(f.getName), Paths.get(path))
        d.toFile.deleteOnExit()
        d.toString
      }
    }
    // Schema-adaptive ts normalization — the upstream file has shipped
    // as both TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS)/NTZ.
    graft.Tables.normalizeTs(spark.readStream.schema(schema).parquet(dir))
  }
}
