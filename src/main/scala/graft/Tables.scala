package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated parquet tables at
  * `<sfDir>/<table>.parquet` (TESTDATA.md:13-15; schemas in FIXTURES.md).
  * One parquet file per table; Spark reads the footer schema directly, so no
  * inference step is needed.
  *
  * Scale note: each loader is a plain parquet scan, so on a real cluster the
  * same code picks up splittable multi-file datasets, partition pruning, and
  * vectorized reads for free — nothing here assumes single-file inputs.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** `events.ts` is parquet `timestamp[ns]` (isAdjustedToUTC=false), which
    * Spark 4 refuses to read as a timestamp. Read it as raw nanos
    * (`nanosAsLong`) and convert to TIMESTAMP_NTZ at µs precision with
    * integral arithmetic (`div`, not `/` — double division would lose
    * precision at ~1.7e18 ns). DuckDB reads the same column at full ns, so
    * every declared query still passes ts-derived output through
    * `date_trunc('second', …)` on both sides (SURVEY §1.4).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn(
      "ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
