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
/** Residual-risk notes (probed empirically against DuckDB 1.0.0):
  *   - Exactly binary-representable decimal ties (0.125, 0.375) round
  *     identically in both engines (HALF_UP away from zero).
  *   - NON-representable decimal ties can diverge: round(0.565, 2) is 0.57
  *     in Spark (shortest-repr BigDecimal) but 0.56 in DuckDB (binary-value
  *     based). Small-denominator rationals (ratios of small counts) land on
  *     such ties easily — those outputs use integer basis points
  *     (`x * 10000 div y`) instead of d4 (see LlmPipeline/LlmExtras).
  *   - Large-denominator averages (sums over 10k+ rows) tie with negligible
  *     probability; verified green at sf0.01 AND sf0.1 on the fixed test
  *     data, so d2/d4 remain in force there.
  */
object Norm {
  /** Money/measure doubles: 2 decimal places. */
  def money(c: Column): Column = round(c, 2).cast(DecimalType(18, 2))
  /** Exact money SUM: each element is cast to DECIMAL(28,10) (deterministic
    * per-element rounding), then summed in exact decimal arithmetic — the
    * result is independent of shuffle arrival order on the Spark side and
    * bit-stable across runs, unlike sum(double). Use for every groupBy/global
    * money sum; window sums run over sorted frames and don't need it. */
  def moneySum(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 10))), 2).cast(DecimalType(18, 2))
  /** Similarity scores / stats: 4 decimal places. */
  def d4(c: Column): Column = round(c, 4).cast(DecimalType(18, 4))
  /** tf-idf-style small magnitudes: 6 decimal places. */
  def d6(c: Column): Column = round(c, 6).cast(DecimalType(18, 6))
  /** Event-time columns: truncate to whole seconds (ns vs µs parity). */
  def tsec(c: Column): Column = date_trunc("second", c)

  // DuckDB-side twins for the oracle SQL strings.
  def moneySql(e: String): String = s"CAST(ROUND($e, 2) AS DECIMAL(18,2))"
  def moneySumSql(e: String): String =
    s"CAST(ROUND(sum(CAST(($e) AS DECIMAL(28,10))), 2) AS DECIMAL(18,2))"
  def d4Sql(e: String): String    = s"CAST(ROUND($e, 4) AS DECIMAL(18,4))"
  def d6Sql(e: String): String    = s"CAST(ROUND($e, 6) AS DECIMAL(18,6))"
}
