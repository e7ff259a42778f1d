package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers (SURVEY.md §1.4 / §2 global rules).
  *
  * Every aggregated double is rounded then cast to DECIMAL so that the
  * last-ulp summation-order drift between Spark's parallel partial aggregates
  * and DuckDB's aggregation never reaches the hashed output. `events.ts` is
  * parquet timestamp[ns] (Spark truncates to µs, DuckDB keeps ns) so any
  * ts-derived output is truncated to whole seconds on both engines.
  */
object Norm {
  /** Money/measure doubles: 2 decimal places. */
  def money(c: Column): Column = round(c, 2).cast(DecimalType(18, 2))
  /** Similarity scores / stats: 4 decimal places. */
  def d4(c: Column): Column = round(c, 4).cast(DecimalType(18, 4))
  /** tf-idf-style small magnitudes: 6 decimal places. */
  def d6(c: Column): Column = round(c, 6).cast(DecimalType(18, 6))
  /** Event-time columns: truncate to whole seconds (ns vs µs parity). */
  def tsec(c: Column): Column = date_trunc("second", c)

  // DuckDB-side twins for the oracle SQL strings.
  def moneySql(e: String): String = s"CAST(ROUND($e, 2) AS DECIMAL(18,2))"
  def d4Sql(e: String): String    = s"CAST(ROUND($e, 4) AS DECIMAL(18,4))"
  def d6Sql(e: String): String    = s"CAST(ROUND($e, 6) AS DECIMAL(18,6))"
}
