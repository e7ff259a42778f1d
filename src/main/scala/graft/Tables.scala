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
  import org.apache.spark.sql.types._

  /** Fail-fast schema validation (SURVEY §1.2): expected column names and the
    * dtype sets each may legitimately arrive as across data generations. A
    * drift outside this contract raises ONE loud error naming
    * table/column/got/expected — instead of surfacing later as dozens of
    * per-query analysis exceptions (the r5 incident mode). Only columns the
    * engine depends on are pinned; extra columns are allowed (additive drift
    * is not an error).
    */
  private val expected: Map[String, Map[String, Set[Class[_]]]] = {
    val ts: Set[Class[_]] =
      Set(classOf[LongType], classOf[TimestampNTZType], classOf[TimestampType])
    val i = Set[Class[_]](classOf[IntegerType], classOf[LongType])
    val d = Set[Class[_]](classOf[DoubleType], classOf[DecimalType])
    val s = Set[Class[_]](classOf[StringType])
    // Date-like columns currently ship as timestamp[us]; accept DATE too in
    // case a future generation tightens them.
    val dl = ts + classOf[DateType]
    val vec = Set[Class[_]](classOf[ArrayType])
    Map(
      "region"   -> Map("r_regionkey" -> i, "r_name" -> s),
      "nation"   -> Map("n_nationkey" -> i, "n_name" -> s, "n_regionkey" -> i),
      "customer" -> Map("c_custkey" -> i, "c_name" -> s, "c_nationkey" -> i,
                        "c_acctbal" -> d, "c_mktsegment" -> s),
      "supplier" -> Map("s_suppkey" -> i, "s_name" -> s, "s_nationkey" -> i,
                        "s_acctbal" -> d),
      "part"     -> Map("p_partkey" -> i, "p_name" -> s, "p_brand" -> s,
                        "p_type" -> s, "p_size" -> i, "p_retailprice" -> d),
      "orders"   -> Map("o_orderkey" -> i, "o_custkey" -> i,
                        "o_orderstatus" -> s, "o_totalprice" -> d,
                        "o_orderdate" -> dl, "o_orderpriority" -> s),
      "lineitem" -> Map("l_orderkey" -> i, "l_partkey" -> i, "l_suppkey" -> i,
                        "l_linenumber" -> i, "l_quantity" -> d,
                        "l_extendedprice" -> d, "l_discount" -> d,
                        "l_tax" -> d, "l_returnflag" -> s,
                        "l_linestatus" -> s, "l_shipdate" -> dl),
      "events"     -> Map("event_id" -> i, "ts" -> ts, "user_id" -> i,
                          "event_type" -> s, "value" -> d, "props" -> s),
      "documents"  -> Map("doc_id" -> i, "text" -> s, "lang" -> s,
                          "source" -> s, "n_chars" -> i),
      "embeddings" -> Map("vec_id" -> i, "embedding" -> vec, "label" -> i)
    )
  }

  private def validate(name: String, df: DataFrame): DataFrame = {
    expected.get(name).foreach { cols =>
      val have = df.schema.map(f => f.name -> f.dataType).toMap
      cols.foreach { case (col, okTypes) =>
        have.get(col) match {
          case None =>
            throw new IllegalStateException(
              s"[Tables] schema drift: table '$name' is missing column '$col'" +
              s" (have: ${df.schema.fieldNames.mkString(", ")})")
          case Some(got) if !okTypes.exists(_.isInstance(got)) =>
            throw new IllegalStateException(
              s"[Tables] schema drift: table '$name' column '$col' read as " +
              s"$got, expected one of ${okTypes.map(_.getSimpleName).mkString("/")}")
          case _ => ()
        }
      }
    }
    df
  }

  // spark.sql.legacy.parquet.nanosAsLong (future-ns-regeneration guard) is
  // pinned at SparkSession build in the three entrypoints (Bench, Verify,
  // TestSpark) alongside the timeZone pin — NOT mutated here per read: a
  // conf.set inside a getter is a global side effect racing Verify's
  // 4-thread pool (r6 advice #4).
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    validate(name, spark.read.parquet(s"$dir/$name.parquet"))

  /** (bytes, fileCount) of a table's parquet path — one filesystem METADATA
    * stat, cached per (dir, table) for the process (stat-cache = metadata,
    * not query results; the inputs are immutable fixture trees). */
  private val contentCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]
  private def contentStat(s: SparkSession, d: String, name: String): (Long, Long) =
    contentCache.computeIfAbsent(s"$d/$name.parquet", p => {
      val path = new org.apache.hadoop.fs.Path(p)
      val cs = path.getFileSystem(s.sparkContext.hadoopConfiguration).getContentSummary(path)
      (cs.getLength, cs.getFileCount)
    })

  /** Round-13 scan-parallelism rebalance (opt guide §2.5 "input skew: one
    * huge unsplittable file … repartition immediately after the read").
    *
    * The driver fixtures ship each table as ONE parquet file with ONE row
    * group, and parquet splits cannot cross row groups — so stage 1 of
    * every op (decode + the per-row projection/tokenize/partial-agg work)
    * runs as a SINGLE task regardless of core count: the dominant cost of
    * the heavy sf0.1 ops and the reason their times barely move between
    * local[8] and local[32]. A deterministic hash repartition on the
    * table's unique key right after the scan spreads that per-row work
    * across cores. Hash-on-unique-key, not round-robin: placement is
    * deterministic under task retries (no sortBeforeRepartition pre-sort,
    * no SPARK-38388 class risk) and the key is unique so the spread is
    * even (guide §2.5: high-distinct key).
    *
    * OPT-IN PER OPERATOR (`par = true` on the loader), never blanket: the
    * exchange costs a flat ~0.1–0.3 s (AQE stage barrier + one corpus
    * shuffle write from the single scan task), so it pays only where the
    * post-scan stage-1 work it parallelizes is larger than that — measured
    * per op in the r13 A/B (winners up to −1.6 s, cheap-op losers −0.1 to
    * −0.5 s; OPTIMIZATION_r13.md "Scan rebalance").
    *
    * Scale-adaptive gate, derived from input size (never a constant tuned
    * for one tier):
    *  - fileCount >= cores/2 → no-op (real multi-file datasets — the sf10+
    *    tiles, any production table — already scan with >= cores tasks);
    *  - bytes > cap (default 256 MiB, SPARK_GRAFT_REBALANCE_CAP_MB) →
    *    no-op (big single files from any real writer carry many row groups
    *    and split natively; shuffling a corpus to fix decode parallelism
    *    would invert the cost at scale);
    *  - bytes < 64 KiB → no-op (region/nation-sized frames: the exchange
    *    costs more than the serial work it spreads).
    * SPARK_GRAFT_REBALANCE=0 disables outright (A/B lever; the default ON
    * path is what the driver benches). */
  private val rebalanceOn = !sys.env.get("SPARK_GRAFT_REBALANCE").contains("0")
  // Malformed env values fail HERE with the variable named, not as an
  // ExceptionInInitializerError at first Tables access (r13 advice).
  private def envLong(name: String, dflt: Long): Long =
    sys.env.get(name).map { v =>
      try v.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$name must be a long, got '$v'")
      }
    }.getOrElse(dflt)
  private val rebalanceCapBytes = envLong("SPARK_GRAFT_REBALANCE_CAP_MB", 256L) << 20
  // Floor override (r13 advice): sf0.01 documents.parquet sits just under
  // the 64 KiB floor, so the DuckDB parity leg never exercised the
  // rebalanced documents plans — lowering the floor for one parity run
  // closes that oracle-coverage gap without changing bench behavior.
  private val rebalanceFloorBytes = envLong("SPARK_GRAFT_REBALANCE_FLOOR_KB", 64L) << 10
  private def rebalance(s: SparkSession, d: String, name: String,
                        df: DataFrame, keys: Seq[String]): DataFrame = {
    if (!rebalanceOn) return df
    val cores = s.sparkContext.defaultParallelism
    val (bytes, files) = contentStat(s, d, name)
    if (files >= cores / 2 || bytes > rebalanceCapBytes || bytes < rebalanceFloorBytes) df
    else df.repartition(cores, keys.map(col): _*)
  }

  /** Parquet size of `<dir>/<table>.parquet` in bytes — a filesystem
    * METADATA stat (no scan), the same primitive as
    * `LlmExtras.docsBytes` but for any table. Used by the broadcast-hint
    * size gates: an SF-growing dimension (supplier, part, customer at
    * TPC-H ratios) may only carry an explicit `broadcast()` hint when its
    * on-disk footprint is measured under the gate's cap, because an
    * UNCONDITIONAL hint converts over-budget corpora from slow-but-correct
    * shuffle joins into hard driver failures (maxResultSize / the 8 GB
    * broadcast cap) — the r10 node-frame and r12 gram-frame findings. */
  /** Gated repartition by CALLER-chosen keys (r14): same scale-adaptive
    * gate as the loader rebalance, but the caller picks the keys of the
    * NEXT operator (e.g. a histogram's group columns) so ONE narrow
    * exchange both spreads the single-row-group scan's CPU-dense stage-1
    * AND satisfies the downstream aggregation's required distribution —
    * where the unique-key rebalance would pay a wide exchange plus the
    * aggregation's own ENSURE_REQUIREMENTS exchange. Apply AFTER the
    * narrow projection. Where the gate no-ops (multi-file tiles,
    * production tables) the plain plan keeps its map-side partial
    * aggregation before the one exchange — the right shape at scale. */
  def spreadBy(s: SparkSession, d: String, name: String, df: DataFrame,
               keys: Seq[String]): DataFrame = rebalance(s, d, name, df, keys)

  def tableBytes(s: SparkSession, d: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).getContentSummary(p).getLength
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String, par: Boolean = false): DataFrame = {
    val df = t(s, d, "orders")
    if (par) rebalance(s, d, "orders", df, Seq("o_orderkey")) else df
  }
  def lineitem(s: SparkSession, d: String, par: Boolean = false): DataFrame = {
    val df = t(s, d, "lineitem")
    if (par) rebalance(s, d, "lineitem", df, Seq("l_orderkey", "l_linenumber")) else df
  }
  /** `events.ts` has shipped as parquet `timestamp[ns]` (which Spark 4 only
    * reads via `nanosAsLong`) in some data generations and `timestamp[us]`
    * (read natively as TIMESTAMP_NTZ when isAdjustedToUTC=false) in others.
    * Branch on the concrete read dtype so the loader survives either
    * generation — the r5 regression was exactly this assumption going stale:
    *  - LongType         → raw nanos; integral `div 1000` to µs (not `/` —
    *                       double division loses precision at ~1.7e18 ns).
    *  - TimestampNTZType → already the canonical type; pass through.
    *  - TimestampType    → isAdjustedToUTC=true data; cast to NTZ. The cast
    *                       reads the instant in the session time zone, so
    *                       every entrypoint (Verify, Bench, tests) pins
    *                       spark.sql.session.timeZone=UTC to keep it
    *                       deterministic and DuckDB-consistent.
    * All ts-derived query output still goes through `date_trunc('second',…)`
    * on both Spark and DuckDB sides (SURVEY §1.4), so sub-second precision
    * differences between generations never reach the hash compare.
    */
  def events(s: SparkSession, d: String, par: Boolean = false): DataFrame = {
    val raw0 = t(s, d, "events")
    val raw = if (par) rebalance(s, d, "events", raw0, Seq("event_id")) else raw0
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn(
          "ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case org.apache.spark.sql.types.TimestampNTZType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, d: String, par: Boolean = false): DataFrame = {
    val df = t(s, d, "documents")
    if (par) rebalance(s, d, "documents", df, Seq("doc_id")) else df
  }
  def embeddings(s: SparkSession, d: String, par: Boolean = false): DataFrame = {
    val df = t(s, d, "embeddings")
    if (par) rebalance(s, d, "embeddings", df, Seq("vec_id")) else df
  }
}
