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
  private def tmpDir(d: String, fmt: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_$fmt${Math.abs(d.hashCode)}"

  val ops: Map[String, Q] = Map(
    // CSV sink + source: documents metadata written to CSV with header and
    // read back with an explicit schema; the oracle queries the original
    // parquet directly, so a hash match proves the roundtrip is lossless.
    "scan_csv_roundtrip" -> ((s, d) => {
      val path = tmpDir(d, "csv")
      documents(s, d).select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("doc_id LONG, lang STRING, n_chars LONG").csv(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"))
        .orderBy("lang")
    }),

    // JSON-lines sink + source, same oracle-equivalence trick.
    "scan_json_roundtrip" -> ((s, d) => {
      val path = tmpDir(d, "json")
      events(s, d).select("event_id", "user_id", "event_type")
        .write.mode("overwrite").json(path)
      s.read.schema("event_id LONG, user_id LONG, event_type STRING").json(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
        .orderBy("event_type")
    }),
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
    "scan_csv_roundtrip" ->
      """SELECT lang, count(*) AS n, sum(n_chars) AS total_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "scan_json_roundtrip" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
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
