package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named query: the Spark-side builder plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB 1.0.0 over the same parquet tables.
  *
  * Determinism discipline (SURVEY.md §2.2): every oracle-matched query ends
  * in a total ORDER BY over its output columns; double aggregates go through
  * exact DECIMAL arithmetic and are cast back to double only at the end, so
  * Spark and DuckDB produce bit-identical doubles regardless of partial-agg
  * ordering.
  */
final case class Q(
    name: String,
    oracle: Option[String]
)(val build: (SparkSession, String) => DataFrame)

trait QueryPack {
  def all: Seq[Q]

  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Shared helpers for exact, engine-agnostic arithmetic. */
object QHelp {
  /** Exact 2-decimal fixed-point view of a money/quantity double.
    *
    * The generated data carries exactly 2 decimal digits, so
    * double -> DECIMAL(12,2) is lossless, and DECIMAL(12,2) products stay
    * within DuckDB's 38-digit multiply limit ((12,2)x(12,2)x(12,2) fits).
    * Summing decimals is exact in both engines; the final cast back to
    * double is then deterministic.
    *
    * CAVEAT (found by the r9 full-surface sf1 audit): the final
    * decimal->double cast is deterministic only while the SCALED integer
    * (value x 10^scale) fits in 2^53. Past that, DuckDB's cast
    * double-rounds (int128->double, then /10^scale in float arithmetic)
    * while Spark's `Decimal.toDouble` (BigDecimal) is correctly rounded —
    * a 1-ulp oracle mismatch. Scale 2 breaks above ~9e13, scale 4 above
    * ~9e11, scale 6 (a triple product) above ~9e9 — q_agg_group's
    * sum_charge crossed that at sf1 (2.8e10). Fix: route the exact
    * decimal through a string, `CAST(CAST(s AS VARCHAR(64)) AS DOUBLE)`
    * — decimal->string is exact and string->double is correctly rounded
    * in BOTH engines, restoring bit-equality at any magnitude. The
    * length matters: Spark's parser rejects bare VARCHAR (the sqlQ
    * queries run the same SQL through `spark.sql` AND DuckDB), and 64
    * chars can never truncate a DECIMAL(38,6) rendering.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** SQL-side twin of [[dec]]. */
  def decSql(e: String): String = s"CAST($e AS DECIMAL(12,2))"

  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
  def dsumSql(e: String): String = s"CAST(CAST(SUM(${decSql(e)}) AS VARCHAR(64)) AS DOUBLE)"
}
