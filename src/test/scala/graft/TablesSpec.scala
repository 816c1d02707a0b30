package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the schema-adaptive `Tables.events` loader (VERDICT r7 #1).
  *
  * The driver has shipped `events.ts` in two layouts across rounds:
  * parquet TIMESTAMP(NANOS) (read as epoch-nanos long under
  * `nanosAsLong=true`) and parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * (read as TIMESTAMP_NTZ). The loader must normalize BOTH to a
  * `TimestampType` column with identical instant values, so a future
  * regeneration in either layout cannot break the 22 events consumers
  * again. The nanos branch is covered by a committed fixture
  * (src/test/resources/fixtures/events_nanos) holding the first 50 rows of
  * the live events table re-encoded as TIMESTAMP(NANOS).
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val nanosDir = {
    val url = getClass.getResource("/fixtures/events_nanos")
    assert(url != null, "events_nanos fixture missing from test resources")
    url.getPath
  }

  test("live testdata layout loads as TimestampType") {
    val df = Tables.events(spark, TestSpark.sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("legacy nanos-as-long fixture loads as TimestampType") {
    // raw read must see the legacy long layout, else the fixture is stale
    val raw = spark.read.parquet(s"$nanosDir/events.parquet")
    assert(raw.schema("ts").dataType === LongType,
      s"fixture no longer nanos-as-long: ${raw.schema("ts").dataType}")
    val df = Tables.events(spark, nanosDir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() === 50)
  }

  test("both layouts yield identical instants for the same rows") {
    val fromNanos = Tables.events(spark, nanosDir)
      .select(col("event_id"), Q.tstr(col("ts")).as("t"))
    val fromLive = Tables.events(spark, TestSpark.sf)
      .join(fromNanos.select("event_id"), Seq("event_id"), "left_semi")
      .select(col("event_id"), Q.tstr(col("ts")).as("t"))
    val diff = fromNanos.except(fromLive).count() +
      fromLive.except(fromNanos).count()
    assert(diff === 0, "nanos and live layouts disagree on instants")
  }
}
