package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism kit (SURVEY.md §2.0) — every declared query must
  * hash-match its DuckDB oracle, so floating point and ordering are
  * handled the same way on both sides:
  *
  *  - Large double sums are order-dependent in IEEE arithmetic and
  *    Spark's partial/final aggregation sums in a different order than
  *    DuckDB. `dsum` sums exact DECIMAL(18,4) values instead (both
  *    engines do exact decimal addition) and converts the exact result
  *    back to double — bit-identical across engines.
  *  - Every floating output is still `round(_, 4)` as a second belt.
  *  - Every query ends in a total ORDER BY over a candidate key.
  *
  * Oracle-side mirror of `dsum`:
  *   CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
  */
object Stable {

  /** round to 4 decimal places — the standard float output discipline */
  def r4(c: Column): Column = round(c, 4)

  /** output discipline for timestamp columns: cast to TIMESTAMP_NTZ at
    * the query's final select. The session TZ is pinned UTC, so the
    * wall-clock value is unchanged — but Spark then writes parquet with
    * `isAdjustedToUTC=false`, matching the tz-naive timestamps every
    * ANSI engine (the DuckDB oracle included) produces. Without this,
    * a raw TimestampType output column fails any schema-strict compare
    * (round-1 post-mortem: 13 queries red on exactly this). */
  def ntz(c: Column): Column = c.cast("timestamp_ntz")

  /** order-independent sum of a double column: exact decimal sum, then
    * back to double. Oracle: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** order-independent average built from dsum/count.
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** the DuckDB-side mirror of [[dsum]], for building oracle SQL —
    * one definition instead of the fragment hand-copied per module */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"
}
