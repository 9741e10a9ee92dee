package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, by
  * design, at any 100 TB-scale location: nothing below hard-codes paths,
  * partition counts, or collects to the driver.
  */
object Tables {
  /** Resolved-relation cache: `spark.read.parquet` lists files and reads
    * footers on the driver every call, and a bench/verify run resolves the
    * same nine tables hundreds of times. DataFrames are immutable plan
    * handles, so reuse per (session, dir, name) is safe and cuts that
    * fixed driver latency from every query. (Sessions are map keys only
    * for the handful of suites that open several — entries are tiny.) */
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    tableCache.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` arrives in whatever timestamp encoding the generator used
    * this round, so normalize every variant to Spark's native TIMESTAMP:
    *  - INT64 TIMESTAMP(NANOS): Spark 4 refuses to read it as a timestamp,
    *    so read nanos as long (legacy conf) and truncate to µs with exact
    *    integer arithmetic — ns-since-epoch (~1.7e18) exceeds 2^53, so
    *    `DIV`, never double math;
    *  - µs without timezone (TIMESTAMP_NTZ): cast to TIMESTAMP. The session
    *    timezone is pinned to UTC everywhere (Verify/Bench/specs), so the
    *    naive wall clock is interpreted as the same UTC instant DuckDB's
    *    `epoch_us(CAST(ts AS TIMESTAMP))` oracle sees;
    *  - tz-aware µs: already TIMESTAMP, the cast is a no-op.
    * Downstream operators can then rely on TIMESTAMP-only functions
    * (`unix_micros`, `to_utc_timestamp`) regardless of the round's parquet.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  private val lastRegistered =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  /** Register every table as a temp view so `spark.sql` queries can share
    * one SQL text with their DuckDB oracle verbatim. Idempotent per
    * (session, dir): re-registering ten views per query invocation is pure
    * driver overhead, so repeat calls for the same dir are no-ops (a dir
    * switch within a session re-registers everything). */
  def registerAll(s: SparkSession, d: String): Unit =
    if (!lastRegistered.get(s).contains(d)) {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
        .foreach(n => table(s, d, n).createOrReplaceTempView(n))
      events(s, d).createOrReplaceTempView("events")
      lastRegistered(s) = d
    }
}
