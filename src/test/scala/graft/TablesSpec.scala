package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Tables.events ts-normalization branches. Local driver testdata is
  * TIMESTAMP(NANOS) (the LongType branch — exercised by every events
  * query), so the TIMESTAMP_NTZ branch gets its own fixture here: a
  * parquet written with a TimestampNTZ column must come back as
  * session-tz TIMESTAMP with the microsecond value preserved
  * bit-for-bit (the session is pinned to UTC in Sessions).
  */
class TablesSpec extends SparkSuite {

  test("TIMESTAMP_NTZ events parquet reads back as TIMESTAMP, microseconds intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ntz_events").toString
    val ts = LocalDateTime.of(1997, 3, 14, 1, 59, 26, 535897000)
    Seq((1L, "click", ts), (2L, "view", ts.plusSeconds(7)))
      .toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // the fixture really is NTZ on disk (inferTimestampNTZ default)
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      TimestampNTZType)

    val events = Tables.events(spark, dir)
    assert(events.schema("ts").dataType == TimestampType)
    val micros = events.orderBy("user_id")
      .selectExpr("unix_micros(ts)").as[Long].collect()
    val expected = ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 535897L
    assert(micros.sameElements(Array(expected, expected + 7000000L)))
  }
}
