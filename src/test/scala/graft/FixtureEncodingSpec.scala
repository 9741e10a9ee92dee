package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The driver regenerates the fixture parquet between rounds and has
  * already shipped `events.ts` in two encodings (INT64 TIMESTAMP(NANOS),
  * then µs-without-timezone/TIMESTAMP_NTZ). [[Tables.events]] must
  * normalize every variant to plain TIMESTAMP with identical epoch
  * values, or every epoch-computing query breaks on the next
  * regeneration. This spec writes the same instants in each encoding
  * Spark can produce and pins the loader's output equal across them. */
class FixtureEncodingSpec extends SparkSpec {
  import spark.implicits._

  private val instants = Seq(
    "2024-01-01 00:00:00.000001",
    "2024-06-15 12:34:56.789012",
    "2030-12-31 23:59:59.999999")

  private def writeAndLoad(dir: String, writeAs: String): Seq[(Long, Long)] = {
    val df = instants.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("event_id", "s")
    val out = writeAs match {
      case "ltz" => df.select(col("event_id"), to_timestamp(col("s")).as("ts"))
      case "ntz" => df.select(col("event_id"),
        to_timestamp(col("s")).cast("timestamp_ntz").as("ts"))
    }
    out.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType == TimestampType,
      s"$writeAs: loader must yield plain TIMESTAMP, " +
        s"got ${loaded.schema("ts").dataType}")
    loaded.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  test("Tables.events yields identical epochs for tz-aware and ntz parquet") {
    val d1 = Files.createTempDirectory("enc_ltz").toString
    val d2 = Files.createTempDirectory("enc_ntz").toString
    try {
      val ltz = writeAndLoad(d1, "ltz")
      val ntz = writeAndLoad(d2, "ntz")
      assert(ltz == ntz, s"ltz=$ltz ntz=$ntz")
      // and the absolute values are the UTC wall-clock interpretation
      // (session timezone is pinned UTC in SparkSpec/Verify/Bench)
      assert(ltz.head._2 == 1704067200000001L, s"got ${ltz.head._2}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d1))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d2))
    }
  }

  test("the long-nanos legacy path truncates to µs with exact arithmetic") {
    // Spark cannot WRITE TIMESTAMP(NANOS) parquet, so pin the conversion
    // arithmetic the loader applies after the legacy long read: ns DIV
    // 1000, exact at magnitudes beyond 2^53 where double math drifts
    val d = Files.createTempDirectory("enc_nanos").toString
    try {
      // 2024-01-01T00:00:00.000001234 in ns-since-epoch — beyond 2^53
      val ns = 1704067200000001234L
      Seq((0L, ns)).toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      val loaded = Tables.events(spark, d)
      assert(loaded.schema("ts").dataType == TimestampType)
      val micros = loaded.select(unix_micros(col("ts")))
        .collect().head.getLong(0)
      assert(micros == 1704067200000001L, s"got $micros")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }
}
