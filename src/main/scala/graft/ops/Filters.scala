package graft.ops

import org.apache.spark.sql.functions._
import graft.Norm._
import graft.Tables._

/** SURVEY.md §2.B — projection / filter / predicates. */
object Filters {
  val ops: Map[String, Q] = Map(
    "proj_arithmetic" -> ((s, d) =>
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          money(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("charge"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "charge")
        .limit(100)),

    // TPC-H Q6 shape: tight conjunctive filter fully pushable to the scan.
    "filter_conjunctive" -> ((s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") <  lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))),

    "filter_in_like" -> ((s, d) =>
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("c_name").like("Customer#00000012%"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy("o_orderpriority")),

    // Three-valued logic: NULLIF makes a nullable column, then bucket by the
    // truth value of (x > 0.05) — NULL / true / false tally.
    "filter_null_semantics" -> ((s, d) =>
      lineitem(s, d)
        .select(nullif(col("l_discount"), lit(0.0)).as("x"))
        .select(
          when(col("x").isNull, "null")
            .when(col("x") > 0.05, "true")
            .otherwise("false").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),
  )

  val oracle: Map[String, String] = Map(
    "proj_arithmetic" ->
      s"""SELECT l_orderkey, l_linenumber,
          ${moneySql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
          ${moneySql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS charge
          FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charge LIMIT 100""",
    "filter_conjunctive" ->
      s"""SELECT ${moneySumSql("l_extendedprice * l_discount")} AS revenue, count(*) AS n
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
            AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "filter_in_like" ->
      s"""SELECT o_orderpriority, count(*) AS n, ${moneySumSql("o_totalprice")} AS total
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND c_name LIKE 'Customer#00000012%'
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "filter_null_semantics" ->
      """SELECT CASE WHEN x IS NULL THEN 'null' WHEN x > 0.05 THEN 'true' ELSE 'false' END AS bucket,
                count(*) AS n
         FROM (SELECT NULLIF(l_discount, 0.0) AS x FROM lineitem)
         GROUP BY 1 ORDER BY 1""",
  )
}
