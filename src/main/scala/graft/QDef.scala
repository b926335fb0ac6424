package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** A declared query: a Spark implementation plus (when SQL-expressible) an
  * equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §2 legend / FIXTURES.md): every query has a
  * total ORDER BY; float aggregates are computed on DECIMAL-cast inputs (exact
  * in both engines) or rounded via `CAST(... AS DECIMAL(38,4))`; timestamps
  * cross the dialect boundary as DATE or epoch-millis BIGINT — the reference
  * itself stores timestamps as epoch-millis longs
  * (reference: HiveKuduBridgeUtils.java:192-196).
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  /** Round a float aggregate for cross-engine comparison. */
  def dec4(c: Column): Column = c.cast(DecimalType(38, 4))
  /** Exact decimal representation of 2-decimal money/quantity columns: sums of
    * these are exact (no float accumulation-order nondeterminism) in both
    * Spark and DuckDB.
    */
  def d182(c: Column): Column = c.cast(DecimalType(18, 2))

  /** TPC-H revenue term computed entirely in DECIMAL: rounding the double
    * product differs between engines at half-cent ties, so both factors are
    * cast to decimal BEFORE multiplying. Same text is valid Spark SQL and
    * DuckDB SQL.
    */
  val revenueExpr: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
}
