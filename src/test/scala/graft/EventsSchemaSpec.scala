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

  test("driver test data reads as non-null timestamps") {
    val ev = Tables(spark, sfDir).events
    assert(ev.schema("ts").dataType === TimestampType)
    val nonNull = ev.filter(col("ts").isNotNull).count()
    assert(nonNull > 0L)
    assert(ev.count() === nonNull)
  }
}
