package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gate for the events-table physical encoding (VERDICT r3 item 3).
  *
  * The driver's `events.ts` has shipped as parquet TIMESTAMP(NANOS)
  * (read as a nanos long under nanosAsLong) and later as
  * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). `Tables.events` must
  * normalize EITHER encoding to a session-TZ timestamp whose
  * unix_micros matches the file's epoch value — that parity is what
  * keeps Spark results aligned with the DuckDB oracle's epoch_us.
  */
class EventsSchemaSpec extends SparkSpec {

  // 2024-03-01T12:34:56.789Z in epoch micros
  private val epochUs = 1709296496789000L

  private def writeAndRead(writer: String => Unit): (DataTypeRef, Long, Long) = {
    val dir = Files.createTempDirectory("events-schema").toFile
    dir.deleteOnExit()
    val sub = new java.io.File(dir, "events.parquet").getAbsolutePath
    writer(sub)
    val ev = Tables(spark, dir.getAbsolutePath).events
    val tsType = ev.schema("ts").dataType
    val rows = ev.count()
    val micros = ev.select(unix_micros(col("ts"))).head().getLong(0)
    (DataTypeRef(tsType), rows, micros)
  }

  private case class DataTypeRef(dt: DataType)

  test("nanos-as-long fixture normalizes to timestamp with matching epoch micros") {
    val (tsType, rows, micros) = writeAndRead { path =>
      import spark.implicits._
      Seq((1L, epochUs * 1000L + 999L)) // trailing nanos must truncate
        .toDF("user_id", "ts")
        .write.mode("overwrite").parquet(path)
    }
    assert(tsType.dt === TimestampType)
    assert(rows === 1L)
    assert(micros === epochUs)
  }

  test("timestamp-micros (NTZ) fixture passes through with matching epoch micros") {
    val (tsType, rows, micros) = writeAndRead { path =>
      import spark.implicits._
      Seq((1L, epochUs))
        .toDF("user_id", "us")
        .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
        .select("user_id", "ts")
        .write.mode("overwrite").parquet(path)
    }
    assert(tsType.dt === TimestampType)
    assert(rows === 1L)
    assert(micros === epochUs)
  }

  test("session-TZ timestamp fixture passes through unchanged") {
    val (tsType, rows, micros) = writeAndRead { path =>
      import spark.implicits._
      Seq((1L, epochUs))
        .toDF("user_id", "us")
        .withColumn("ts", timestamp_micros(col("us")))
        .select("user_id", "ts")
        .write.mode("overwrite").parquet(path)
    }
    assert(tsType.dt === TimestampType)
    assert(rows === 1L)
    assert(micros === epochUs)
  }

  test("integer/float width drift conforms to the canonical schema") {
    val dir = Files.createTempDirectory("events-drift").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "events.parquet").getAbsolutePath
    import spark.implicits._
    // user_id int32, value float32 — plausible upstream regenerations
    Seq((1, 2L, 0.5f, "click", """{"k": 3}"""))
      .toDF("user_id", "event_id", "value", "event_type", "props")
      .withColumn("ts", timestamp_micros(lit(epochUs)))
      .write.mode("overwrite").parquet(path)
    val ev = Tables(spark, dir.getAbsolutePath).events
    assert(ev.schema("user_id").dataType === LongType)
    assert(ev.schema("value").dataType === DoubleType)
    val row = ev.select("user_id", "value").head()
    assert(row.getLong(0) === 1L && math.abs(row.getDouble(1) - 0.5) < 1e-12)
  }

  test("conform is a strict no-op on already-canonical files") {
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    val conformed = Tables.conform(raw,
      "doc_id" -> org.apache.spark.sql.types.LongType,
      "text" -> org.apache.spark.sql.types.StringType)
    assert(conformed eq raw,
      "matching schema must return the untouched scan (no cast nodes)")
  }

  test("driver test data reads as non-null timestamps") {
    val ev = Tables(spark, sfDir).events
    assert(ev.schema("ts").dataType === TimestampType)
    val nonNull = ev.filter(col("ts").isNotNull).count()
    assert(nonNull > 0L)
    assert(ev.count() === nonNull)
  }
}
