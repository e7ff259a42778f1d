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
  )
}
