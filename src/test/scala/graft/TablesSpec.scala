package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Guards on the events.ts physical-type dispatch (round-9 ADVICE 1+2):
  * the INT64 arm must verify the parquet footer says TIMESTAMP(NANOS)
  * before dividing by 1000, and the TIMESTAMP_NTZ arm must refuse non-UTC
  * sessions instead of silently shifting instants.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("plain INT64 ts (no logical type) fails loudly instead of a silent div-1000 (r9 ADVICE-1)") {
    val base = Files.createTempDirectory("tblint64").toString
    // a generation that shipped epoch MILLIS as raw INT64: reads as
    // LongType exactly like nanosAsLong'd NANOS, but dividing by 1000
    // would yield 1970-adjacent garbage with no error
    Seq((1L, 1704067200000L), (2L, 1704067260000L))
      .toDF("event_id", "ts")
      .write.parquet(s"$base/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, base).count())
    assert(e.getMessage.contains("NANOS"), s"guard must name the expected unit: ${e.getMessage}")
  }

  test("TIMESTAMP_NTZ ts refuses a non-UTC session instead of shifting instants (r9 ADVICE-2)") {
    val base = Files.createTempDirectory("tblntz").toString
    Seq(1L, 2L).toDF("event_id")
      .withColumn("ts", to_timestamp_ntz(lit("2024-01-01 10:00:00")))
      .write.parquet(s"$base/events.parquet")
    val tzKey = "spark.sql.session.timeZone"
    val orig = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException](Tables.events(spark, base).count())
      assert(e.getMessage.contains("UTC"), s"guard must name the required zone: ${e.getMessage}")
    } finally spark.conf.set(tzKey, orig)
    // under UTC the same table loads, as microsecond TimestampType
    val ok = Tables.events(spark, base)
    assert(ok.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ok.count() == 2)
  }
}
