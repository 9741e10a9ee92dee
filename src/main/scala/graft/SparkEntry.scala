package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator from SURVEY.md §2.2 is declared in a [[QueryPack]] that
  * co-locates the Spark plan with its DuckDB oracle SQL; this object only
  * aggregates the packs.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Scans,
    Joins,
    Aggregates,
    Windows,
    SetOps,
    Scalars,
    Cdc,
    TextOps,
    Similarity,
    Multimodal,
    Subqueries,
    Tpch,
    TrainPrep,
    Events,
    Corpus,
    Bucketing,
    Retrieval
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_cdc_snapshot: latest state per user from the events changelog — the
    * most CDC-faithful relational op (SURVEY.md §7 M0).
    */
  def entry(spark: SparkSession): DataFrame =
    Cdc.qCdcSnapshot.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
