package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY.md §2.F — sorts / limits / top-k.
  *
  * Scale notes: a global `orderBy` range-partitions (sampled bounds) before
  * sorting — no single-node sort. `orderBy(...).limit(k)` collapses to
  * TakeOrderedAndProject (per-partition top-k, then k-way merge of k-sized
  * heaps), which is the only safe "global top" at 100 TB. NULL position is
  * always explicit: Spark defaults NULLS FIRST on ASC, DuckDB NULLS LAST.
  */
object Sorts {
  val ops: Map[String, Q] = Map(
    "sort_multicol" -> ((s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(200)),

    "sort_nulls_ordering" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", lit(null).cast("double"))
            .otherwise(col("o_totalprice")).as("x"))
        .orderBy(col("x").asc_nulls_first, col("o_orderkey").asc)
        .limit(100)),

    "limit_offset" -> ((s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100).limit(50)),

    "topk_global" -> ((s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // Two-level top-k per FEW-GROUP key: a plain window partitioned by
    // `source` (~20 values) would sort 1/20 of the corpus per task (the
    // hazard the plan sweep rejects). Instead: salt to (source, salt)
    // sub-groups, per-sub-group top-3 (bounded partitions), then the true
    // per-source top-3 from the 16×3 candidates — correct because every
    // per-source top-3 row is necessarily a per-(source, salt) top-3 row.
    // Final global merge is a TakeOrdered over 60 candidates.
    "topk_per_group_merge" -> ((s, d) => {
      val docs = documents(s, d).select("source", "doc_id", "n_chars")
        .withColumn("salt", pmod(col("doc_id"), lit(16)))
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy("source", "salt").orderBy(col("n_chars").desc, col("doc_id"))
      val cand = docs.withColumn("rk1", row_number().over(w1)).filter(col("rk1") <= 3)
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
      cand.withColumn("rk", row_number().over(w2)).filter(col("rk") <= 3)
        .orderBy(col("n_chars").desc, col("doc_id")).limit(10)
        .select("source", "doc_id", "n_chars", "rk")
    }),

    // Deterministic PORTABLE pseudo-random sample: LIMIT without ORDER BY
    // is nondeterministic on any engine; ordering by md5(key) gives the
    // same "random" 20 rows on every engine, run, and partitioning — the
    // reproducible-sample idiom a data-quality spot check ships with.
    // Collapses to TakeOrdered (per-partition top-k, k-way merge).
    "sort_hash_sample" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), md5(col("o_orderkey").cast("string")).as("h"))
        .orderBy("h").limit(20)),
  )

  val oracle: Map[String, String] = Map(
    "sort_multicol" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC LIMIT 200""",
    "sort_nulls_ordering" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS x
         FROM orders ORDER BY x ASC NULLS FIRST, o_orderkey ASC LIMIT 100""",
    "limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "topk_per_group_merge" ->
      """SELECT source, doc_id, n_chars, rk FROM (
           SELECT source, doc_id, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS rk
           FROM documents)
         WHERE rk <= 3
         ORDER BY n_chars DESC, doc_id LIMIT 10""",
    "sort_hash_sample" ->
      """SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS h
         FROM orders ORDER BY h LIMIT 20""",
  )
}
