package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale techniques that don't fit a single SURVEY §2 op key but are part of
  * the 100 TB design surface: skew-salted joins, partitioned layout writers,
  * and bucketed (shuffle-free) join layouts. Exercised by `ScaleSuite`.
  */
object Scale {
  /** Equi-join with the large side salted to defeat key skew.
    *
    * Each large-side row gets a deterministic, row-content-derived salt in
    * [0, buckets); the small side is replicated `buckets` times. A hot key's
    * rows then spread over `buckets` reducers instead of one. Semantics are
    * identical to `large.join(small, keyL === keyS)` — every large row meets
    * exactly the one replica carrying its salt.
    *
    * (AQE's skew-join split handles sort-merge skew automatically; explicit
    * salting remains necessary for skewed *aggregations* and for joins that
    * AQE can't split, so the technique is kept first-class and tested.)
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame,
                     keyL: String, keyS: String, buckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(buckets)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(keyL) === replicatedSmall(keyS) &&
        saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }

  /** Write `df` as a directory tree partitioned by `partCols` — the layout
    * that turns a 100 TB scan plus a partition predicate into a directory
    * listing. Reads back with `spark.read.parquet(path)`. */
  def writePartitioned(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Persist `df` bucketed by `key` so equi-joins and aggregations on `key`
    * between co-bucketed tables plan with zero Exchange.
    *
    * The default in-memory catalog forgets tables across JVMs while their
    * warehouse directories persist, and CTAS refuses a pre-existing
    * location — so drop both the catalog entry and any orphaned directory
    * before writing. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    val loc = new java.io.File(wh, table.toLowerCase)
    if (loc.exists) rm(loc)
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }
}
