package graft.ops

import org.apache.spark.sql.functions._
import graft.Norm._
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

    // ORC sink + source (the other first-class columnar format).
    "scan_orc_roundtrip" -> ((s, d) => {
      val path = tmpDir(d, "orc")
      supplier(s, d).write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), moneySum(col("s_acctbal")).as("total_bal"))
        .orderBy("s_nationkey")
    }),

    // Plain-text sink + source: one line per document, read back and
    // token-counted. A text sink is line-delimited by definition, so embedded
    // newlines are normalized to spaces BEFORE the write (and the oracle
    // tokenizes the same normalization) — without this, a single multi-line
    // document would silently split into several rows on read-back.
    "scan_text_roundtrip" -> ((s, d) => {
      val path = tmpDir(d, "txt")
      documents(s, d).select(regexp_replace(col("text"), "[\\r\\n]", " ").as("text"))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .select(explode(split(col("value"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
    }),

    // Hive-style partitioned layout: written partitioned by event_type, read
    // back with a partition predicate — the scan must prune to one directory
    // (asserted in ScaleSuite) and still agree with the unpartitioned oracle.
    "scan_partitioned_roundtrip" -> ((s, d) => {
      val path = tmpDir(d, "part")
      events(s, d).select("event_id", "user_id", "event_type")
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
      s.read.parquet(path)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
        .orderBy("event_type")
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
    // Codec-conversion roundtrip (the Hadoop "recompress the dataset"
    // utility): parquet re-written under zstd, read back and aggregated.
    // Compression is storage-layout only, so the oracle queries the
    // original snappy parquet — a hash match proves losslessness.
    "scan_zstd_roundtrip" -> ((s, d) => {
      val path = tmpDir(d, "zstd")
      orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").option("compression", "zstd").parquet(path)
      s.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    }),

    // Small-files compaction (the classic HDFS hygiene job): the events
    // table is first exploded into many small files (one per user bucket),
    // then compacted to 4 with a single repartition, and the compacted copy
    // is aggregated. The file-count collapse is asserted in ScaleSuite; the
    // oracle proves the data survived both rewrites byte-for-byte.
    "sink_compacted" -> ((s, d) => {
      val small = tmpDir(d, "smallfiles")
      val packed = tmpDir(d, "compacted")
      val ev = events(s, d).select("event_id", "user_id", "event_type", "value")
      ev.repartition(64, col("user_id")).write.mode("overwrite").parquet(small)
      s.read.parquet(small).repartition(4).write.mode("overwrite").parquet(packed)
      s.read.parquet(packed)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
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
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "scan_zstd_roundtrip" ->
      s"""SELECT o_orderstatus, count(*) AS n, ${moneySumSql("o_totalprice")} AS total
          FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "sink_compacted" ->
      s"""SELECT event_type, count(*) AS n, ${moneySumSql("value")} AS total_value
          FROM events GROUP BY event_type ORDER BY event_type""",
    "scan_json_roundtrip" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    "scan_orc_roundtrip" ->
      s"""SELECT s_nationkey, count(*) AS n, ${moneySumSql("s_acctbal")} AS total_bal
          FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",
    "scan_text_roundtrip" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(regexp_replace(text, '[\r\n]', ' ', 'g'), ' ')) AS token
               FROM documents)
         GROUP BY token ORDER BY n DESC, token LIMIT 20""",
    "scan_partitioned_roundtrip" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
         FROM events WHERE event_type IN ('click', 'purchase')
         GROUP BY event_type ORDER BY event_type""",
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
