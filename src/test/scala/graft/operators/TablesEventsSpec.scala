package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The driver has regenerated events.parquet with different physical
  * encodings of `ts` across fixture generations: TIMESTAMP(NANOS)
  * (which Spark reads as LongType under the legacy `nanosAsLong` conf
  * that [[Tables.events]] sets) and timestamp[us] with
  * isAdjustedToUTC=false (which Spark reads natively as TIMESTAMP_NTZ).
  * Round 8 shipped a loader hard-wired to the nanos generation and lost
  * all 20 events-reading queries when the fixture flipped — this spec
  * pins the schema-dispatch so BOTH generations keep loading, plus the
  * current real fixture.
  */
class TablesEventsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Two encodings of the same instant: 2024-03-01 12:34:56.789012 UTC. */
  private val micros = 1709296496789012L

  test("events loader handles nanos-as-long and timestamp[us] generations identically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-events-gen").toFile
    dir.deleteOnExit()

    // generation A: int64 nanos (what TIMESTAMP(NANOS) surfaces as under
    // the nanosAsLong conf the loader sets)
    val nanosDir = s"${dir.getAbsolutePath}/nanos"
    Seq((1L, micros * 1000L, "click"))
      .toDF("event_id", "ts", "event_type")
      .write.parquet(s"$nanosDir/events.parquet")

    // generation B: timestamp[us], isAdjustedToUTC=false (TIMESTAMP_NTZ)
    // — the current driver fixture's encoding
    val ntzDir = s"${dir.getAbsolutePath}/ntz"
    Seq((1L, micros, "click"))
      .toDF("event_id", "us", "event_type")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("event_type"))
      .write.parquet(s"$ntzDir/events.parquet")

    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, ntzDir)
    // both land on TimestampType (session tz is UTC, so NTZ→LTZ is
    // wall-clock identity) with the same instant
    assert(a.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(b.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val ta = a.select(unix_micros(col("ts"))).as[Long].head()
    val tb = b.select(unix_micros(col("ts"))).as[Long].head()
    assert(ta == micros && tb == micros)
  }

  test("events loader reads the real driver fixture with a timestamp ts") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }
}
