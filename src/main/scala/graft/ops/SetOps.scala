package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Norm._
import graft.Tables._

/** SURVEY.md §2.G — set operations + deduplication.
  *
  * Operands: custkeys of BUILDING-segment customers (A) vs custkeys that
  * appear in orders (B, distinct).
  *
  * Scale notes: Catalyst rewrites `intersect`→left-semi and `except`→
  * left-anti (one shuffle each, no materialized intermediate); `distinct` is
  * a hash aggregate with map-side partial dedup, so the shuffle carries
  * already-deduped keys. `dedup_keep_first` is the deterministic alternative
  * to `dropDuplicates` — `row_number()=1` over an explicit total order, one
  * shuffle on the dedup key.
  */
object SetOps {
  private def a(s: org.apache.spark.sql.SparkSession, d: String) =
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
  private def b(s: org.apache.spark.sql.SparkSession, d: String) =
    orders(s, d).select(col("o_custkey").as("custkey")).distinct()

  private val aSql = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val bSql = "SELECT DISTINCT o_custkey AS custkey FROM orders"

  val ops: Map[String, Q] = Map(
    "set_union_all" -> ((s, d) => a(s, d).unionAll(b(s, d)).orderBy("custkey")),
    "set_union_distinct" -> ((s, d) => a(s, d).union(b(s, d)).distinct().orderBy("custkey")),
    "set_intersect" -> ((s, d) => a(s, d).intersect(b(s, d)).orderBy("custkey")),
    "set_except" -> ((s, d) => a(s, d).except(b(s, d)).orderBy("custkey")),
    "set_intersect_all" -> ((s, d) => a(s, d).intersectAll(b(s, d)).orderBy("custkey")),
    // EXCEPT ALL needs a true multiset on the left to mean anything: event
    // user_ids (with duplicates) minus the distinct ordering customers —
    // multiplicity-aware anti-difference.
    "set_except_all" -> ((s, d) =>
      events(s, d).select(col("user_id").as("custkey"))
        .exceptAll(b(s, d)).orderBy("custkey")),

    // Schema-aligning union (unionByName + allowMissingColumns): two
    // generations of a feed whose columns differ in ORDER and PRESENCE —
    // positional unionAll would mis-bind or reject; by-name union aligns on
    // column name and nulls the missing ones. The append-only schema-growth
    // reality (scan_schema_evolution's source-side twin).
    "set_union_byname" -> ((s, d) => {
      val gen1 = supplier(s, d).filter(col("s_suppkey") % 2 === 0)
        .select(col("s_nationkey"), col("s_suppkey")) // reversed column order
      val gen2 = supplier(s, d).filter(col("s_suppkey") % 2 === 1)
        .select(col("s_suppkey"), col("s_nationkey"),
          money(col("s_acctbal")).as("bal_cents")) // extra column
      gen1.unionByName(gen2, allowMissingColumns = true)
        .select("s_suppkey", "s_nationkey", "bal_cents")
        .orderBy("s_suppkey")
    }),

    "dedup_distinct" -> ((s, d) =>
      events(s, d)
        .select("event_type", "user_id")
        .distinct()
        .orderBy("event_type", "user_id")),

    "dedup_keep_first" -> ((s, d) =>
      events(s, d)
        .select(col("user_id"), col("event_id"), tsec(col("ts")).as("ts_s"), col("event_type"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts_s", "event_id")))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy("user_id")),
  )

  val oracle: Map[String, String] = Map(
    "set_union_all" -> s"($aSql) UNION ALL ($bSql) ORDER BY custkey",
    "set_union_distinct" -> s"($aSql) UNION ($bSql) ORDER BY custkey",
    "set_intersect" -> s"($aSql) INTERSECT ($bSql) ORDER BY custkey",
    "set_except" -> s"($aSql) EXCEPT ($bSql) ORDER BY custkey",
    "set_intersect_all" -> s"($aSql) INTERSECT ALL ($bSql) ORDER BY custkey",
    "set_except_all" ->
      s"(SELECT user_id AS custkey FROM events) EXCEPT ALL ($bSql) ORDER BY custkey",
    // DuckDB's UNION ALL BY NAME is the same by-name alignment.
    "set_union_byname" ->
      s"""SELECT s_suppkey, s_nationkey, bal_cents FROM (
            (SELECT s_nationkey, s_suppkey FROM supplier WHERE s_suppkey % 2 = 0)
            UNION ALL BY NAME
            (SELECT s_suppkey, s_nationkey, ${moneySql("s_acctbal")} AS bal_cents
             FROM supplier WHERE s_suppkey % 2 = 1))
          ORDER BY s_suppkey""",
    "dedup_distinct" ->
      "SELECT DISTINCT event_type, user_id FROM events ORDER BY event_type, user_id",
    "dedup_keep_first" ->
      """SELECT user_id, event_id, ts_s, event_type FROM (
           SELECT user_id, event_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY CAST(date_trunc('second', ts) AS TIMESTAMP), event_id) AS rn
           FROM events)
         WHERE rn = 1 ORDER BY user_id""",
  )
}
