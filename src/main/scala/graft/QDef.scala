package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

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
    oracle: Option[String],
    /** Bench-only variant: same read semantics as `fn` minus one-time setup
      * (table builds, fixture ingest) that must not ride inside the timed
      * lambda. Verify/correctness ALWAYS uses `fn`; Bench prefers this when
      * present. (Round-8 verdict item 3: s16 spent 14-21 s/sample rebuilding
      * a 150k-row table around a sub-second pruned read.)
      */
    benchFn: Option[(SparkSession, String) => DataFrame] = None)

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

  /** Driver-gate output adapter (round-1 verdict root cause): the driver
    * hashes Spark-side DECIMAL cells as `str(Decimal)` ('25.0000') but
    * oracle-side decimals as float64 `repr` ('25.0'), so provably-equal
    * values hash-mismatch whenever the declared scale prints trailing zeros.
    * Decimal math stays internal (exact, shuffle-order-independent); only the
    * FINAL representation is cast to DOUBLE — and Verify wraps the paired
    * oracle SQL with the same casts — so identical decimals become identical
    * doubles with identical reprs on both sides.
    *
    * Nested decimals (array/map/struct element) can't be auto-cast and are
    * rejected loudly: cast elements to DOUBLE inside the query instead.
    */
  def castDecimalOutputs(df: DataFrame): DataFrame = {
    def holdsDecimal(t: DataType): Boolean = t match {
      case _: DecimalType   => true
      case ArrayType(e, _)  => holdsDecimal(e)
      case MapType(k, v, _) => holdsDecimal(k) || holdsDecimal(v)
      case s: StructType    => s.fields.exists(f => holdsDecimal(f.dataType))
      case _                => false
    }
    val fields = df.schema.fields
    fields.foreach { f =>
      require(f.dataType.isInstanceOf[DecimalType] || !holdsDecimal(f.dataType),
        s"output column '${f.name}': DECIMAL nested in ${f.dataType.simpleString} " +
          "defeats the driver-hash adapter — cast elements to DOUBLE in the query")
    }
    if (!fields.exists(_.dataType.isInstanceOf[DecimalType])) df
    else df.select(fields.map { f =>
      if (f.dataType.isInstanceOf[DecimalType]) col(f.name).cast("double").as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }
}
