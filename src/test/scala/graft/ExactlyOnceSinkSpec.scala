package graft

import graft.streaming.{ExactlyOnceSink, StreamAgg}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ExactlyOnceSinkSpec extends SparkSpec {

  test("streamed parquet sink holds exactly the input; redelivery adds nothing") {
    val out = Files.createTempDirectory("eos_out").toString + "/t"
    val stream = StreamAgg.parquetStream(spark, s"$sfDir/events.parquet")
      .select("event_id", "user_id", "event_type")
    val q = stream.writeStream
      .foreachBatch(ExactlyOnceSink.parquetBatchWriter(out))
      .option("checkpointLocation",
        Files.createTempDirectory("eos_ckpt").toString)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val ev = Tables(spark, sfDir).events
    val written = spark.read.parquet(out)
    assert(written.count() == ev.count())
    assert(written.select("event_id").distinct().count() == ev.count(),
      "no duplicate events after streaming write")

    // simulate at-least-once redelivery: re-write every batch id with
    // the same data — content must be unchanged, not doubled
    // partition-column values read back as the narrowest inferred type
    val batchIds = written.select(col("_batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0))
    val sums0 = written.agg(sum("event_id"), count(lit(1))).head
    batchIds.foreach { b =>
      val replay = spark.read.parquet(out)
        .filter(col("_batch_id") === b)
        .drop("_batch_id")
      ExactlyOnceSink.writeBatch(replay, b, out)
    }
    val after = spark.read.parquet(out)
    val sums1 = after.agg(sum("event_id"), count(lit(1))).head
    assert(sums1 == sums0, "redelivered batches must overwrite, not append")
    assert(after.select("event_id").distinct().count() == ev.count())
  }

  test("q124 incremental view equals the batch aggregate after a multi-batch replay") {
    import graft.functions.Exact
    val got = graft.queries.SessionOps.q124StreamIncrView(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val expected = Tables(spark, sfDir).events
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), Exact.sumExact(col("value")).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == expected && got.nonEmpty,
      "folded partials must equal the batch aggregation exactly")
  }
}
