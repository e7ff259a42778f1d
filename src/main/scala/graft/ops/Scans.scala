package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY.md §2.A — scans / sources / sinks.
  *
  * Scale notes: `scan_projection` exists to prove parquet column pruning
  * (ReadSchema in the physical plan carries only the 3 selected columns) and
  * `scan_predicate_pushdown` to prove row-group-level filter pushdown
  * (PushedFilters on the shipdate predicate) — the two properties that decide
  * whether a 100 TB scan reads 100 TB or only the bytes it needs.
  */
object Scans {
  val ops: Map[String, Q] = Map(
    "scan_full" -> ((s, d) => region(s, d).orderBy("r_regionkey")),

    "scan_projection" -> ((s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)),

    "scan_predicate_pushdown" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz"))
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
        .agg(count(lit(1)).as("n"))
        .orderBy("ship_month")),
  )

  val oracle: Map[String, String] = Map(
    "scan_full" -> "SELECT * FROM region ORDER BY r_regionkey",
    "scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""",
    "scan_predicate_pushdown" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month, count(*) AS n
         FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",
  )
}
