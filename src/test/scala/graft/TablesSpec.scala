package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Unit-robust events ingestion (the round-6 regression class): the
  * fixture's `ts` has shipped as both parquet TIMESTAMP(MICROS) and
  * TIMESTAMP(NANOS)/raw-INT64-nanos across generations. Tables.events must
  * probe the footer and pick the right path — and REFUSE anything else —
  * because a wrong-unit read is silent (LongType assertion over an
  * INT64-backed timestamp succeeds) and compresses every event time 1000×.
  */
class TablesSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("tables_spec").toString

  test("shipped fixture reads as µs TimestampType with sane epoch range") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    val (lo, hi) = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .as[(Int, Int)](org.apache.spark.sql.Encoders.product[(Int, Int)])
      .head()
    // the ns-misread bug collapsed 2024 timestamps to 1970-01-20; a µs
    // misread of an ns file would inflate them past year 50000
    assert(lo >= 2000 && hi <= 2100, s"event years [$lo,$hi] out of range")
  }

  test("raw INT64 nanos fixture reads through the legacy div-1000 path") {
    val dir = tmpDir()
    // same logical instants as a µs file would carry, stored as ns longs
    val micros = Seq(1704067200000000L, 1704067201500000L, 1704070800123456L)
    val rows = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us * 1000L, i.toLong % 2, "view", 1.0, "{}")
    }
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    val gotMicros = got.select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).sorted
    assert(gotMicros.toSeq == micros.sorted)
  }

  test("unrecognized ts type is refused loudly, not silently mis-read") {
    val dir = tmpDir()
    import spark.implicits._
    Seq((1L, 1.5, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("refusing to guess"))
  }

  test("events fixture without a ts column is refused") {
    val dir = tmpDir()
    import spark.implicits._
    Seq((1L, "view")).toDF("event_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("no `ts` column"))
  }
}
