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

  /** The shared MERGE-INTO changelog contract for BOTH row-level
    * strategies (one definition, so a one-sided edit cannot silently
    * break the cross-strategy parity): a GraftMemCatalog target built
    * from customer, merged with a one-row-per-key changelog (the MERGE
    * cardinality contract) — DELETE keys ≡0 (mod 13), UPDATE +100.00
    * for the remaining ≡0 (mod 10), INSERT fresh NEGATIVE keys (−k−1,
    * disjoint at every SF) for ≡0 (mod 100) — then a census off the
    * post-MERGE table. `delta=false` leaves the table on the GROUP-BASED
    * ReplaceData path (copy-on-write: scan the group, rewrite survivors
    * + updates + inserts, replace atomically); `delta=true` creates the
    * table with rowlevel=delta, planning the same statement as
    * WriteDelta (merge-on-read: per-row changelog keyed by the _rowpos
    * row id — only CHANGED rows cross the write boundary, the right
    * trade at 100 TB when the touched fraction is small, where group
    * replacement pays for every row the group holds). Identical census
    * + one shared oracle make the two ops' parity the cross-check that
    * ReplaceData and WriteDelta agree; plan shapes and row-level
    * DELETE/UPDATE semantics are pinned in Round12Suite. Scale: the
    * rewrite shuffles once on the join key; strategy docs in
    * MemSink.scala. */
  private def v2MergeOp(delta: Boolean): Q = (s0, d) => {
    val s = s0.newSession()
    s.conf.set("spark.sql.catalog.graftmem", "graft.sources.GraftMemCatalog")
    val mode = if (delta) "delta" else "group"
    val t = s"merge_${mode}_tgt_${Math.abs(d.hashCode)}"
    val w = customer(s, d)
      .select(col("c_custkey").as("k"), money(col("c_acctbal")).as("bal"))
      .writeTo(s"graftmem.$t")
    (if (delta) w.tableProperty("rowlevel", "delta") else w).createOrReplace()
    customer(s, d)
      .filter(col("c_custkey") % 13 === 0 || col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("k"),
        when(col("c_custkey") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
        (money(col("c_acctbal")) + 10000L).as("bal"))
      .unionAll(customer(s, d).filter(col("c_custkey") % 100 === 0)
        .select((-col("c_custkey") - 1L).as("k"), lit("I").as("op"),
          lit(0L).as("bal")))
      .createOrReplaceTempView(s"graft_merge_${mode}_src")
    s.sql(s"""MERGE INTO graftmem.$t t USING graft_merge_${mode}_src s ON t.k = s.k
              WHEN MATCHED AND s.op = 'D' THEN DELETE
              WHEN MATCHED THEN UPDATE SET bal = s.bal
              WHEN NOT MATCHED THEN INSERT (k, bal) VALUES (s.k, s.bal)""")
    s.table(s"graftmem.$t")
      .agg(count(lit(1)).as("n_rows"), sum("bal").as("bal_cents_sum"),
        sum(when(col("k") < 0, 1L).otherwise(0L)).as("n_inserted"),
        min("k").as("min_k"), max("k").as("max_k"))
  }

  /** One oracle for both strategies: the declarative merge emulation —
    * survivors (non-deleted) with the update applied, plus the inserted
    * negative keys. */
  private def v2MergeOracle: String =
    s"""WITH base AS (SELECT c_custkey AS k, ${moneySql("c_acctbal")} AS bal FROM customer),
             merged AS (
               SELECT k, CASE WHEN k % 10 = 0 THEN bal + 10000 ELSE bal END AS bal
               FROM base WHERE k % 13 <> 0
               UNION ALL
               SELECT -k - 1 AS k, 0 AS bal FROM base WHERE k % 100 = 0)
        SELECT count(*) AS n_rows, CAST(sum(bal) AS BIGINT) AS bal_cents_sum,
               CAST(sum(CASE WHEN k < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
               min(k) AS min_k, max(k) AS max_k
        FROM merged"""

  val ops: Map[String, Q] = Map(
    // Custom DataSource V2 connector (closes the r9 "last ladder rung"):
    // graft.sources.GraftRangeSource is a TableProvider with REAL filter
    // and projection pushdown — the id predicates below are CONSUMED by
    // the source (they narrow the generated span before any row exists;
    // the DSV2 analog of partition pruning), the tag predicate stays a
    // Spark-side residual, and column pruning drops `id` from the read
    // schema entirely (the group-by needs only bucket/val/tag). Both
    // properties are plan-asserted in Round10Suite against the scan
    // node's description. The oracle re-derives the same deterministic
    // relation from DuckDB's range() — a hash match proves the pushdown
    // changed WHERE the work happens, not WHAT is computed.
    "scan_dsv2_pushdown" -> ((s, _) =>
      s.read.format("graft.sources.GraftRangeSource")
        .option("rows", 100000L).option("slices", 8)
        .load()
        .filter(col("id") >= 20000L && col("id") < 70000L && col("tag") =!= "c")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("val").as("sum_val"))
        .orderBy("bucket")),

    // The VECTORIZED twin (r10 verdict #2): columnar=true flips the same
    // connector to a ColumnarBatch-emitting reader
    // (OnHeapColumnVector fills, 4096-row batches, one ColumnarToRow
    // transition feeding whole-stage codegen) — the parquet-vectorized-
    // reader shape for a custom source. Pushdown is unchanged: the id
    // span still narrows generation, the tag test stays residual, and
    // column pruning still holds. Row-vs-columnar hash identity and the
    // columnar plan shape are asserted in Round11Suite; this key's oracle
    // proves the vectorized path against DuckDB directly.
    "scan_dsv2_columnar" -> ((s, _) =>
      s.read.format("graft.sources.GraftRangeSource")
        .option("rows", 100000L).option("slices", 8).option("columnar", true)
        .load()
        .filter(col("id") >= 10000L && col("id") < 90000L && col("tag") =!= "e")
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), sum("val").as("sum_val"), max("bucket").as("max_bucket"))
        .orderBy("tag")),

    // Aggregate pushdown through the same connector (r11): GROUP BY +
    // COUNT/SUM/MIN/MAX are handed to the source via
    // SupportsPushDownAggregates and run INSIDE the readers as a
    // per-partition partial aggregate — supportCompletePushDown stays
    // false, so Spark's merge aggregate sits on top and exactness never
    // depends on how the span splits. What crosses the source boundary is
    // one row per (partition, group): ≤ 8·100 rows here instead of 60 000
    // — at a 100 TB source, the scan→agg edge carries groups, not rows,
    // which is map-side combine pushed BELOW the scan. Only offered when
    // every filter was consumed (Spark's rule requires zero residuals),
    // so the id span narrows first and the in-source grouping runs on the
    // already-pruned generation. Plan-asserted in Round11Suite
    // (PushedAggregation/PushedGroupBy on the scan node + a merge-only
    // aggregate above it); the oracle recomputes the same aggregate from
    // DuckDB's range() — value identity proves pushdown moved the work,
    // not the answer.
    "scan_dsv2_agg_pushdown" -> ((s, _) =>
      s.read.format("graft.sources.GraftRangeSource")
        .option("rows", 100000L).option("slices", 8)
        .load()
        .filter(col("id") >= 20000L && col("id") < 80000L)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("val").as("sum_val"),
          min("val").as("min_val"), max("tag").as("max_tag"))
        .orderBy("bucket")),

    // LIMIT/OFFSET pushdown (r11): SupportsPushDownLimit/Offset narrow the
    // generated span arithmetically — generation order IS id order, so
    // OFFSET o skips [lo, lo+o) and the pushed limit caps the high end;
    // rows outside are never generated (at a real source: never read).
    // The pushdown stays PARTIAL (isPartiallyPushed=true), so Spark keeps
    // its GlobalLimit — and the parameters here make that re-check a
    // no-op BY CONSTRUCTION: after OFFSET 55000 only 5 000 of the 60 000
    // filtered ids remain, fewer than LIMIT 20000, so "any 20 000 of
    // 5 000 rows" is the whole set and the result is order-independent.
    // (A limit smaller than the remaining span would let GlobalLimit pick
    // an arbitrary subset — fine for LIMIT semantics, useless for a
    // hash-compared oracle.) Round11Suite asserts PushedLimit/PushedOffset
    // on the scan node and unit-tests the exact span arithmetic.
    "scan_dsv2_limit_pushdown" -> ((s, _) =>
      s.read.format("graft.sources.GraftRangeSource")
        .option("rows", 100000L).option("slices", 8)
        .load()
        .filter(col("id") >= 20000L && col("id") < 80000L)
        .offset(55000).limit(20000)
        .agg(count(lit(1)).as("n"), sum("id").as("sum_id"),
          min("id").as("min_id"), max("id").as("max_id"),
          sum("val").as("sum_val"))),

    // ORDER BY id LIMIT n pushdown (r11): SupportsPushDownTopN turns the
    // top-1000-by-id-desc into span arithmetic ([hi−n, hi) — the last n
    // ids ARE the top n), so the scan generates 1 000 rows, not 60 000,
    // and the plan's TakeOrderedAndProject re-sorts only that candidate
    // set (partial pushdown: cross-partition order is Spark's to
    // re-establish, the data-volume win is already banked). The id
    // ordering has no ties (id is the key), so the top-k set is unique
    // and the oracle is exact. Round11Suite asserts PushedTopN + the
    // narrowed span on the scan node.
    "scan_dsv2_topn_pushdown" -> ((s, _) =>
      s.read.format("graft.sources.GraftRangeSource")
        .option("rows", 100000L).option("slices", 8)
        .load()
        .filter(col("id") >= 20000L && col("id") < 80000L)
        .orderBy(col("id").desc).limit(1000)
        .agg(count(lit(1)).as("n"), min("id").as("min_id"),
          max("id").as("max_id"), sum("val").as("sum_val"))),

    // Runtime filtering — dynamic partition pruning for a V2 source
    // (r11): with partitionBy=bucket the table lays out one InputPartition
    // per bucket value and advertises `bucket` through
    // SupportsRuntimeV2Filtering. Joining against the dimension's 20
    // filtered buckets makes Spark inject a DynamicPruningSubquery
    // (reusing the dim's broadcast); at execution BatchScanExec hands the
    // bucket set to Scan.filter(...) and partition planning drops 80 of
    // the 100 bucket partitions BEFORE any task launches — the fact side
    // reads 20% of itself, decided at runtime by the dim filter, exactly
    // how partition-directory DPP behaves on a 100 TB parquet fact.
    // Round11Suite asserts the dynamicpruningexpression on the scan node
    // and the recorded 20/100 partition survival; the oracle is the plain
    // join in DuckDB (pruning is an optimization, never a semantic).
    "scan_dsv2_runtime_filter" -> ((s, _) => {
      val fact = s.read.format("graft.sources.GraftRangeSource")
        .option("rows", 200000L).option("partitionBy", "bucket")
        .load()
      val dim = s.read.format("graft.sources.GraftRangeSource")
        .option("rows", 100L).option("slices", 1)
        .load()
        .filter(col("tag") === "b")
        .select(col("bucket").as("d_bucket"), col("val").as("d_val"))
      fact.join(dim, col("bucket") === col("d_bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("val").as("sum_val"),
          max("d_val").as("dim_val"))
        .orderBy("bucket")
    }),

    // Metadata columns (r11): `_slice` is the input-partition ordinal
    // that generated the row, exposed via SupportsMetadataColumns — the
    // V2 twin of parquet's _metadata.file provenance columns. Hidden
    // from SELECT * (asserted in Round11Suite), resolvable by name;
    // when asked for, Spark adds it to the PRUNED read schema and the
    // readers emit it like any field — zero cost unless requested. The
    // slice boundaries are the deterministic lo + n·i/slices splits, so
    // with a divisible span (60000/5) the oracle re-derives the ordinal
    // as (id−20000)//12000 — provenance reproduced arithmetically by an
    // engine that has never seen the partitioning. At 100 TB this is
    // the lineage channel: skew diagnosis and bad-shard tracing without
    // a reshuffle or a synthetic key column.
    "scan_dsv2_metadata_cols" -> ((s, _) =>
      s.read.format("graft.sources.GraftRangeSource")
        .option("rows", 100000L).option("slices", 5)
        .load()
        .filter(col("id") >= 20000L && col("id") < 80000L)
        .select(col("_slice"), col("bucket"), col("val"))
        .groupBy("_slice")
        .agg(count(lit(1)).as("n"), sum("val").as("sum_val"),
          min("bucket").as("min_bucket"), max("bucket").as("max_bucket"))
        .orderBy("_slice")),

    // DSv2 WRITE path (r11) — the write side of the connector ladder:
    // graft.sources.GraftMemCatalog is a TableCatalog plugin (registered
    // per isolated session); writeTo(...).createOrReplace() drives
    // createTable with the query schema (the catalog route fixes the
    // classic TableProvider problem — a bare save() can't tell a fresh
    // sink its schema) and then the FULL V2 write protocol: WriteBuilder
    // → BatchWrite → per-task DataWriter staging rows privately →
    // WriterCommitMessage → ONE driver-side commit publishing all
    // partitions atomically (abort publishes nothing) — the
    // staged-then-manifest shape every transactional 100 TB sink
    // follows. Since r12 the staging is literal: each task STREAMS its
    // rows to a file on the shared filesystem and the commit message is
    // an O(1) manifest (partition, path, count) — honest at any row
    // count (Round12Suite pushes a corpus-sized frame through and
    // bounds the message bytes). The declared op writes the 25-row
    // nation dim (fixed cardinality at every SF). Read-back
    // goes through the catalog's loadTable + a pruning scan, so the
    // round trip exercises both protocol directions; the oracle computes
    // the same aggregate straight from the parquet tables — parity
    // proves the write/read cycle is lossless.
    "sink_dsv2_write" -> ((s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.catalog.graftmem", "graft.sources.GraftMemCatalog")
      val t = s"nation_enriched_${Math.abs(d.hashCode)}"
      nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .writeTo(s"graftmem.$t").createOrReplace()
      s.table(s"graftmem.$t")
        .groupBy("r_name")
        .agg(count(lit(1)).as("n"), min("n_name").as("first_nation"),
          max("n_name").as("last_nation"))
        .orderBy("r_name")
    }),

    // Write-side distribution + ordering through the V2 protocol (r13 —
    // the layout rung of the DSv2 ladder): the table DECLARES
    // `write.distribution=event_type` / `write.ordering=cents` and its
    // Write implements RequiresDistributionAndOrdering, so SPARK plans
    // the clustering exchange + per-partition sort below the write —
    // exactly how a production table format gets clustered, sorted data
    // files without a hand-written repartition in every pipeline (at
    // 100 TB the layout IS the table contract: one writer per key group,
    // runs sorted for min/max skipping). requiredNumPartitions stays 0
    // so AQE sizes the exchange — a pinned count would recreate the
    // fixed-partition spill knee (SCALE_TUNING r13). Round13Suite
    // asserts the layout empirically from the per-task write audit
    // (every partition sorted; cluster keys disjoint across partitions);
    // the oracle proves the re-distributed write is lossless.
    "sink_v2_distribution" -> ((s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.catalog.graftmem", "graft.sources.GraftMemCatalog")
      val t = s"evd_${Math.abs(d.hashCode)}"
      s.sql(s"DROP TABLE IF EXISTS graftmem.$t")
      events(s, d)
        .select(col("event_id"), col("event_type"), money(col("value")).as("cents"))
        .writeTo(s"graftmem.$t")
        .tableProperty("write.distribution", "event_type")
        .tableProperty("write.ordering", "cents")
        .createOrReplace()
      s.table(s"graftmem.$t")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
          min("cents").as("min_cents"), max("cents").as("max_cents"))
        .orderBy("event_type")
    }),

    // Row-level operations through the V2 catalog (r12) — both MERGE
    // strategies share one builder + one oracle (see v2MergeOp): the
    // group-based ReplaceData rewrite and its delta-based WriteDelta
    // twin.
    "sink_v2_merge" -> (v2MergeOp(delta = false)),
    "sink_v2_merge_delta" -> (v2MergeOp(delta = true)),

    // CBO statistics integration (closes the r7 "missing" #4): ANALYZE-grade
    // stats are fed to the optimizer through the supported channel — a
    // managed catalog copy + ANALYZE TABLE COMPUTE STATISTICS FOR COLUMNS —
    // and the declared result reads the CATALOG's stored stats back, so the
    // oracle (the same facts computed directly from the data) proves the
    // numbers the cost-based optimizer plans with are the TRUE table
    // properties. ndv comes from HLL++, which is exact at dimension
    // cardinality (25/5 distinct); min/max/nullCount/rowCount are exact by
    // construction. The resulting stats-driven PLAN change (a filtered
    // analyzed dim turning broadcastable under spark.sql.cbo.enabled) is
    // plan-asserted in Round8Suite. The stats read is catalog METADATA —
    // bounded like win_percent's bucket totals, not a data collect.
    "scan_cbo_stats" -> ((s, d) => {
      val sp = s; import sp.implicits._
      val tbl = s"graft_cbo_nation_${Math.abs(d.hashCode)}"
      // idempotence across FRESH in-memory catalogs: a previous JVM's
      // managed-table directory survives in spark-warehouse while the new
      // catalog has no entry for it, and CREATE then fails on the non-empty
      // location — drop the catalog entry AND the orphan directory first
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      nation(s, d).write.mode("overwrite").format("parquet").saveAsTable(tbl)
      s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")
      val meta = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl))
      val st = meta.stats.get
      val nk = st.colStats("n_nationkey")
      val rk = st.colStats("n_regionkey")
      Seq((st.rowCount.get.toLong,
        nk.min.get.toLong, nk.max.get.toLong,
        nk.distinctCount.get.toLong, nk.nullCount.get.toLong,
        rk.distinctCount.get.toLong))
        .toDF("row_count", "nk_min", "nk_max", "nk_ndv", "nk_nulls", "rk_ndv")
    }),
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

    // Quoted-newline CSV roundtrip: every doc's text gets ALL spaces
    // replaced by REAL newlines, is written as quoted CSV, and must come
    // back intact through `multiLine=true` — the mode real-world CSV dumps
    // (addresses, free-text columns) force on an ingest pipeline. The
    // census proves no record split mid-field: per lang, doc count, docs
    // whose text still CONTAINS the newline, and the exact total text
    // length (newline included). 100 TB trade documented here: multiLine
    // disables record splitting, so each FILE becomes one task's unit —
    // keep multiline dumps in many moderate files (the writer side's
    // repartition) or convert to parquet at the edge; the default
    // line-split reader cannot parse them correctly at any parallelism.
    "scan_csv_multiline" -> ((s, d) => {
      val path = tmpDir(d, "csvml")
      documents(s, d)
        .select(col("doc_id"), col("lang"),
          regexp_replace(col("text"), " ", "\n").as("text"))
        .repartition(4)
        .write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true").csv(path)
      s.read.option("header", "true").option("multiLine", "true")
        .schema("doc_id LONG, lang STRING, text STRING").csv(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("text").contains("\n"), 1L).otherwise(0L)).as("n_multiline"),
          sum(length(col("text"))).as("total_len"))
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
    // PERMISSIVE JSON with corrupt-record capture: a JSONL sink where a
    // deterministic subset of lines (event_id ≡ 0 mod 7) is written
    // truncated mid-object; the read uses PERMISSIVE mode with
    // _corrupt_record, so bad lines land in quarantine instead of killing
    // the job — the poison-line posture a 100 TB semi-structured ingest
    // ships with (scan_csv_malformed's JSON sibling). The census proves
    // exactly the planted lines quarantined and every healthy line parsed.
    "scan_json_corrupt_records" -> ((s, d) => {
      val path = tmpDir(d, "jsoncorrupt")
      events(s, d).select("event_id", "user_id", "event_type")
        .select(when(col("event_id") % 7 === 0,
            concat(lit("{\"event_id\": "), col("event_id"), lit(", \"user_id\": TRUNC")))
          .otherwise(to_json(struct(col("event_id"), col("user_id"), col("event_type"))))
          .as("value"))
        .write.mode("overwrite").text(path)
      s.read
        .schema("event_id LONG, user_id LONG, event_type STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .select(col("event_type"), col("_corrupt_record").isNotNull.as("bad"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("bad").cast("long")).as("n_corrupt"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    // NESTED parquet roundtrip: orders denormalized into one row per
    // customer carrying an array<struct> of its orders (the document-style
    // layout a serving store reads in one seek), written as physical
    // nested parquet (repeated group), read back, re-flattened, and
    // censused against the flat original via the oracle — proving the
    // nested encoding is lossless. The per-customer array is bounded by
    // orders-per-customer (dim-bounded, ~10), so the collect_list buffer
    // is NOT the unbounded-group hazard; sort_array makes the array
    // content deterministic.
    "sink_nested_parquet" -> ((s, d) => {
      val path = tmpDir(d, "nestedsink")
      orders(s, d)
        .select(col("o_custkey"),
          struct(col("o_orderkey"), money(col("o_totalprice")).as("cents")).as("o"))
        .groupBy("o_custkey")
        .agg(sort_array(collect_list(col("o"))).as("orders"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(col("o_custkey"), explode(col("orders")).as("o"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct("o_custkey").as("n_custs"),
          sum("o.cents").as("total_cents"),
          min("o.o_orderkey").as("min_okey"), max("o.o_orderkey").as("max_okey"))
    }),

    // Parquet DECIMAL logical-type roundtrip: money written as
    // DECIMAL(18,4) fixed-point (the lossless way a financial 100 TB table
    // stores amounts — no binary-double drift), read back, and re-scaled
    // to integer d4 units. The oracle computes the same d4 integers from
    // the ORIGINAL parquet, so a hash match proves the decimal physical
    // encoding roundtrips exactly. (Output stays BIGINT — the engine-wide
    // no-DECIMAL-in-results rule is about hashing, not storage.)
    "sink_decimal_roundtrip" -> ((s, d) => {
      val path = tmpDir(d, "decsink")
      orders(s, d)
        .select(col("o_orderkey"),
          expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(28,10)), 4) AS DECIMAL(18,4))").as("dec"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(expr("CAST(dec * 10000 AS BIGINT)").as("d4c"))
        .agg(count(lit(1)).as("n"), sum("d4c").as("sum_d4"),
          min("d4c").as("min_d4"), max("d4c").as("max_d4"))
    }),

    // Parquet bloom-filter sink: write orders with a column-level bloom
    // filter on o_custkey (parquet.bloom.filter.enabled#col — the writer
    // option a 100 TB point-lookup table ships with so equality probes can
    // skip row groups by bloom test alone, beyond min/max pruning), then
    // probe two keys back. The declared result is the probe aggregate; the
    // oracle reads the ORIGINAL parquet, so a hash match proves the
    // bloom-written file is lossless and the probe path returns exactly
    // the base-table rows.
    "sink_parquet_bloom" -> ((s, d) => {
      val path = tmpDir(d, "bloomsink")
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), money(col("o_totalprice")).as("cents"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_custkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_custkey", "200000")
        // at fixture scale the key column would dictionary-encode fully and
        // parquet then OMITS the bloom filter (the dictionary is already an
        // exact membership test); disable dictionary for the key column so
        // the written file carries the bloom filter a 100 TB key column
        // (dictionary-infeasible) would carry — asserted in Round7Suite
        .option("parquet.enable.dictionary#o_custkey", "false")
        .parquet(path)
      s.read.parquet(path)
        .filter(col("o_custkey").isin(42, 77))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
        .orderBy("o_custkey")
    }),

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

    // Dynamic partition overwrite (INSERT OVERWRITE's partition-scoped
    // form): seed all 5 event-type partitions, then overwrite ONLY the
    // 'click' partition with doubled values under
    // partitionOverwriteMode=dynamic. The readback aggregate proves the
    // semantics — static mode would have DELETED the other four partitions
    // and the oracle (which keeps them) would hash-mismatch. At 100 TB this
    // is how a daily re-statement touches one day, not the table.
    "sink_dynamic_overwrite" -> ((s, d) => {
      val dir = tmpDir(d, "dynover")
      val ev = events(s, d)
        .select(col("event_id"), col("event_type"), money(col("value")).as("cents"))
      ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try ev.filter(col("event_type") === "click")
        .withColumn("cents", col("cents") * 2)
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      finally s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      s.read.parquet(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
        .orderBy("event_type")
    }),

    // Schema evolution across file generations: gen-1 files lack the column
    // gen-2 adds; `mergeSchema` unifies the footers and gen-1 rows read NULL
    // for the new column. At scale this is the append-only ingestion reality
    // (old partitions never rewritten when the schema grows a field).
    "scan_schema_evolution" -> ((s, d) => {
      val path = tmpDir(d, "evo")
      supplier(s, d).filter(col("s_suppkey") % 2 === 0)
        .select("s_suppkey", "s_nationkey")
        .write.mode("overwrite").parquet(s"$path/gen1")
      supplier(s, d).filter(col("s_suppkey") % 2 === 1)
        .select(col("s_suppkey"), col("s_nationkey"),
          money(col("s_acctbal")).as("bal_cents"))
        .write.mode("overwrite").parquet(s"$path/gen2")
      s.read.option("mergeSchema", "true").parquet(s"$path/gen1", s"$path/gen2")
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(when(col("bal_cents").isNull, 1L).otherwise(0L)).as("n_legacy"),
          sum(coalesce(col("bal_cents"), lit(0L))).as("bal_cents_sum"))
        .orderBy("s_nationkey")
    }),

    // MERGE-style dimension refresh without a table format: base ⟗ updates
    // full-outer on the key, COALESCE(update, base) per column — the batch
    // form of MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT.
    // The merged dimension is written to a parquet sink and the summary is
    // read OFF THE SINK, so the oracle also proves the write survived. The
    // updates side derives deterministically from customer: +100.00 to every
    // key ≡0 (mod 10), plus fresh keys for the ≡0 (mod 100) slice — fresh
    // keys are NEGATIVE (−k−1) so they are disjoint from the natural
    // keyspace at EVERY scale (a "+1e6" offset would collide with real
    // custkeys once the table passes 1M rows and silently double-count).
    "sink_upsert" -> ((s, d) => {
      val path = tmpDir(d, "upsert")
      val b = customer(s, d)
        .select(col("c_custkey").as("b_k"), money(col("c_acctbal")).as("b_bal"))
      val u = customer(s, d).filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey").as("u_k"),
          (money(col("c_acctbal")) + 10000L).as("u_bal"))
        .unionAll(customer(s, d).filter(col("c_custkey") % 100 === 0)
          .select((-col("c_custkey") - 1L).as("u_k"), lit(0L).as("u_bal")))
      b.join(u, col("b_k") === col("u_k"), "full_outer")
        .select(coalesce(col("u_k"), col("b_k")).as("c_custkey"),
          coalesce(col("u_bal"), col("b_bal")).as("bal_cents"),
          when(col("b_k").isNull, "inserted")
            .when(col("u_k").isNull, "kept")
            .otherwise("updated").as("action"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .groupBy("action")
        .agg(count(lit(1)).as("n"), sum("bal_cents").as("bal_cents_sum"))
        .orderBy("action")
    }),

    // CDC changelog apply — the incremental-table shape between plain
    // upsert (sink_upsert) and a real ACID MERGE: an ORDERED changelog of
    // I/U/D events collapses to final state by last-writer-wins per key
    // (row_number over (key, seq desc) — key is high-cardinality, so
    // per-group state shrinks as data grows), deletes drop, and the state
    // is written to a parquet sink and censused OFF the sink so the oracle
    // also proves the write survived. The changelog derives
    // deterministically from customer: insert-all, +5.00 to keys ≡0 (mod
    // 7), delete keys ≡0 (mod 13). At 100 TB this is exactly the hourly
    // compaction job of a CDC ingest (changelog-sized shuffle, one window
    // pass, partitioned write).
    "sink_cdc_apply" -> ((s, d) => {
      val path = tmpDir(d, "cdc")
      val base = customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          money(col("c_acctbal")).as("bal"))
      val log = base
        .select(col("k"), col("nk"), col("bal"), lit("I").as("op"), lit(1L).as("seq"))
        .unionAll(base.filter(col("k") % 7 === 0)
          .select(col("k"), col("nk"), (col("bal") + 500L).as("bal"),
            lit("U").as("op"), lit(2L).as("seq")))
        .unionAll(base.filter(col("k") % 13 === 0)
          .select(col("k"), col("nk"), lit(0L).as("bal"),
            lit("D").as("op"), lit(3L).as("seq")))
      log
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")
            .orderBy(col("seq").desc)))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select("k", "nk", "bal", "op")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .groupBy("nk")
        .agg(count(lit(1)).as("n_rows"), sum("bal").as("bal_cents"),
          sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updated"))
        .orderBy("nk")
    }),

    // Dynamic partition pruning: the fact copy is partitioned by
    // event_type and joined to a dim whose qualifying keys exist only at
    // RUNTIME (top-2 types by count — an aggregate + rank, nothing static
    // pruning could fold), so the fact scan must receive a
    // dynamicpruningexpression partition filter from the dim's broadcast —
    // at 100 TB this is the difference between scanning 2/5 of the
    // partitions and all of them. Plan-audited in PlanAuditSuite.
    "scan_dynamic_pruning" -> ((s, d) => {
      val path = tmpDir(d, "dpp")
      val ev = events(s, d).select("event_id", "user_id", "event_type", "value")
      ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
      val dim = ev.groupBy(col("event_type").as("et")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("et"))))
        .filter(col("rn") <= 2).select("et")
      s.read.parquet(path)
        .join(dim, col("event_type") === col("et"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
        .orderBy("event_type")
    }),

    // Nested-schema JSON ingestion: order documents carrying an ARRAY OF
    // STRUCTS (the event-payload / API-export shape) written as JSON lines,
    // read back with an explicit nested schema, and exploded to relational
    // rows. Items are sort_array'd before the write and money-ized so the
    // nested payload is deterministic; the oracle flattens the same rows
    // straight from parquet — a hash match proves the nested roundtrip
    // (schema'd array-of-struct parse + explode) is lossless.
    "scan_json_nested" -> ((s, d) => {
      val path = tmpDir(d, "jnest")
      lineitem(s, d).filter(col("l_orderkey") % 100 === 0)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("ln"),
          money(col("l_quantity")).as("qty_c")))).as("items"))
        .write.mode("overwrite").json(path)
      s.read
        .schema("l_orderkey LONG, items ARRAY<STRUCT<ln: INT, qty_c: LONG>>")
        .json(path)
        .select(col("l_orderkey"), explode(col("items")).as("it"))
        .select(col("l_orderkey"), col("it.ln").as("ln"), col("it.qty_c").as("qty_c"))
        // (l_orderkey, ln) is NOT unique in the fixture — qty_c completes
        // the total order
        .orderBy("l_orderkey", "ln", "qty_c")
    }),

    // Sort-clustered sink layout (the data-skipping rewrite): lineitem is
    // range-repartitioned + sorted within partitions on l_shipdate before
    // the write, so each output file covers a disjoint shipdate range and a
    // later date-filtered scan can drop whole files on row-group min/max
    // stats alone — at 100 TB this layout, not the filter, decides how many
    // bytes a time-ranged query reads. File-range disjointness is asserted
    // in Round6Suite via _metadata; the oracle proves the rewrite lossless.
    "sink_sorted_layout" -> ((s, d) => {
      val path = tmpDir(d, "sorted")
      lineitem(s, d).select("l_orderkey", "l_shipdate", "l_quantity")
        .repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp_ntz"))
        .groupBy(date_trunc("year", col("l_shipdate")).cast("date").as("ship_year"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("qty_sum"))
        .orderBy("ship_year")
    }),

    // Z-ORDER clustered sink layout (the 2-D data-skipping rewrite —
    // sink_sorted_layout's multi-dimensional sibling, what Delta/Iceberg
    // OPTIMIZE ZORDER does): orders are written sorted by the Morton
    // interleave of an 8-bit customer bucket and an 8-bit order-day
    // bucket, so every output file bounds BOTH dimensions — a 1-D sort
    // bounds only its sort key, and a 2-D box query (customer range ×
    // date range) then touches every file. Bit interleave is pure integer
    // arithmetic (8 unrolled (bit·4ᵇ) terms — engine-portable, no UDF);
    // the query side runs a 32×32 box over the z-ordered files and emits
    // a per-8×8-tile census (count, price mass, z min/max), which pins the
    // morton math, the box filter, AND write-roundtrip losslessness. The
    // quantitative pruning claim (z-order touches ~¼ of the files a 1-D
    // layout must read for a y-narrow box) is footer-asserted in
    // Round9Suite via _metadata. At 100 TB the layout decides the bytes
    // read; z-order is the right default when TWO filter dims matter.
    "sink_zorder_layout" -> ((s, d) => {
      val path = tmpDir(d, "zorder")
      def morton(di: String) = (0 until 8).map { b =>
        s"((xb $di ${1L << b}) % 2) * ${1L << (2 * b)} + ((yb $di ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
      }.mkString(" + ")
      orders(s, d)
        .select(col("o_orderkey"), money(col("o_totalprice")).as("price_c"),
          (col("o_custkey") % 256).as("xb"),
          expr("datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') % 256").as("yb"))
        .withColumn("z", expr(morton("div")))
        .repartitionByRange(8, col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .filter(col("xb").between(64, 95) && col("yb").between(128, 159))
        .groupBy(expr("xb div 8").as("x_t"), expr("yb div 8").as("y_t"))
        .agg(count(lit(1)).as("n"), sum("price_c").as("price_sum"),
          min("z").as("z_min"), max("z").as("z_max"))
        .orderBy("x_t", "y_t")
    }),

    // Malformed-record tolerance at the CSV source (the 100 TB ingestion
    // reality: one bad line must cost one row, not the stage). Every 50th
    // event line is written corrupted (a non-numeric value field); the
    // PERMISSIVE read routes those lines into the columnNameOfCorruptRecord
    // column and parses the rest normally. The oracle derives the same
    // good/bad split from the clean parquet — checking both the quarantine
    // count and that no good row was lost or mangled.
    "scan_csv_malformed" -> ((s, d) => {
      val path = tmpDir(d, "dirty")
      events(s, d).select(
        when(col("event_id") % 50 === 0,
          concat(col("event_id"), lit(","), col("user_id"), lit(",oops")))
          .otherwise(concat(col("event_id"), lit(","), col("user_id"), lit(","), col("value")))
          .as("line"))
        .write.mode("overwrite").text(path)
      s.read
        .schema("event_id LONG, user_id LONG, value DOUBLE, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .agg(
          sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_quarantined"),
          moneySum(when(col("_corrupt").isNull, col("value"))).as("good_cents"))
    }),

    // Whole-file binary ingestion (spark.read.format("binaryFile") — the
    // entry point a multimodal pipeline uses to lift raw image/audio blobs
    // into a DataFrame before any decode UDF): 25 docs written out as one
    // .bin file each, read back as (path, content) rows, keyed by parsing
    // the id out of the filename. Output pins octet length and md5 of the
    // BYTES, so the oracle (same hashes off the source strings — UTF-8 on
    // both sides) proves the filesystem roundtrip bit-exact. The path
    // column itself never leaves (env-specific). Scale: binaryFile splits
    // per file; at 100 TB the parallelism unit is the blob, which is
    // exactly right for per-file decode stages.
    "scan_binary_files" -> ((s, d) => {
      val dir = tmpDir(d, "bin")
      new java.io.File(dir).mkdirs()
      documents(s, d).filter(col("doc_id") < 25).select("doc_id", "text")
        .collect().foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"doc_${r.getLong(0)}.bin"),
            r.getString(1).getBytes("UTF-8"))
        }
      s.read.format("binaryFile").load(dir)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy("doc_id")
    }),

    // Corrupt-FILE resilience (the file-level sibling of scan_csv_malformed's
    // row-level quarantine): at 100 TB a handful of unreadable files is a
    // when, not an if — the scan must skip them, not kill the job. Two good
    // parquet files (nation split by key parity) share a directory with one
    // garbage "part"; the read passes ignoreCorruptFiles as a per-read
    // OPTION (no session-wide conf mutation — the flag would otherwise
    // apply lazily at execution time to every concurrent query) plus an
    // explicit schema so planning never opens the bad footer. The oracle
    // aggregates the whole source table: a hash match proves the good files
    // survived completely and only the garbage was dropped.
    "scan_ignore_corrupt_files" -> ((s, d) => {
      val path = tmpDir(d, "corruptfile")
      nation(s, d).filter(col("n_nationkey") % 2 === 0)
        .write.mode("overwrite").parquet(path)
      nation(s, d).filter(col("n_nationkey") % 2 === 1)
        .write.mode("append").parquet(path)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path, "part-junk-not-parquet.parquet"),
        Array.fill[Byte](512)(0x5A))
      s.read
        .option("ignoreCorruptFiles", "true")
        .schema(nation(s, d).schema)
        .parquet(path)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), sum(col("n_nationkey").cast("long")).as("key_sum"))
        .orderBy("n_regionkey")
    }),

    // File-provenance metadata columns (_metadata — the lineage surface a
    // 100 TB pipeline uses to trace any row back to its source file and to
    // build per-file audit/quarantine reports without a manifest join).
    // Customer rows are written hive-partitioned by bucket, read back with
    // the hidden _metadata struct, and the bucket is recovered FROM THE
    // FILE PATH (regexp over _metadata.file_path) rather than from data —
    // the oracle groups the source by the same bucket expression, so a hash
    // match proves path-derived provenance agrees with the data itself.
    // (Per-file stats keyed on the actual file NAME would be
    // nondeterministic — part-file UUIDs — so the partition-value route is
    // the one that stays reproducible.) Map-side only + one partial-agg.
    "scan_metadata_cols" -> ((s, d) => {
      val path = tmpDir(d, "meta")
      customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"), (col("c_custkey") % 4).as("bucket"))
        .write.partitionBy("bucket").mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(col("c_custkey"), col("c_acctbal"),
          regexp_extract(col("_metadata.file_path"), "bucket=(\\d+)", 1)
            .cast("long").as("from_path"))
        .groupBy("from_path")
        .agg(count(lit(1)).as("n"), min("c_custkey").as("min_key"),
          max("c_custkey").as("max_key"), moneySum(col("c_acctbal")).as("bal_cents"))
        .orderBy("from_path")
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

    // Nested-directory lake layout WITHOUT hive partition naming (the
    // "directories are just directories" corpus a crawler or legacy job
    // leaves behind): docs written under <root>/<lang>/b<bucket>/, then
    // read back two ways — (a) a path GLOB <root>/*/b1 that selects one
    // bucket across every language at LISTING time (the whole subtree
    // never enters the file index, the coarsest possible pruning), and
    // (b) recursiveFileLookup=true over the root, which walks arbitrary
    // nesting with NO partition inference (the option exists precisely
    // because non-hive layouts otherwise fail the inference step). The
    // two-row report pins both paths' row counts + content sums; lang
    // survives as a data column because the layout carries it in-file,
    // not in dir names. Scale: glob/listing cost is proportional to the
    // selected subtree only.
    "scan_recursive_glob" -> ((s, d) => {
      val root = tmpDir(d, "nested")
      val base = documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("doc_id") % 3).as("bucket"))
      // Overlapped fixture writes (r13, opt guide §2.6): the 15 per-dir
      // writes are independent single-file jobs that the driver previously
      // submitted SEQUENTIALLY — 15 × job latency was this op's dominant
      // cost. Spark's scheduler runs concurrent jobs fine; submit them from
      // a bounded pool and let tasks back-fill idle cores. Each job owns
      // its private target dir, so there is no commit-protocol overlap.
      locally {
        import scala.concurrent.{Await, Future, ExecutionContext}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val writes = for (lang <- Seq("de", "en", "es", "fr", "zh"); b <- 0 to 2) yield Future {
          base.filter(col("lang") === lang && col("bucket") === b)
            .select("doc_id", "lang", "n_chars")
            .coalesce(1).write.mode("overwrite").parquet(s"$root/$lang/b$b")
        }
        try Await.result(Future.sequence(writes), Duration.Inf)
        finally pool.shutdown()
      }
      val glob = s.read.parquet(s"$root/*/b1")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .select(lit("glob_bucket1").as("mode"), col("n_docs"), col("total_chars"))
      val recur = s.read.option("recursiveFileLookup", "true").parquet(root)
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .select(lit("recursive_all").as("mode"), col("n_docs"), col("total_chars"))
      glob.unionByName(recur).orderBy("mode")
    }),
  )

  val oracle: Map[String, String] = Map(
    // The generated relation re-derived from range(): same id domain,
    // same exact-integer column math as GraftRangeTable.fieldValue.
    "scan_dsv2_pushdown" ->
      """WITH t AS (SELECT range AS id, range % 100 AS bucket,
                           (range * range) % 1000003 AS val,
                           ['a','b','c','d','e'][CAST(range % 5 AS INT) + 1] AS tag
                    FROM range(100000))
         SELECT bucket, count(*) AS n, CAST(sum(val) AS BIGINT) AS sum_val
         FROM t WHERE id >= 20000 AND id < 70000 AND tag <> 'c'
         GROUP BY bucket ORDER BY bucket""",

    "scan_dsv2_columnar" ->
      """WITH t AS (SELECT range AS id, range % 100 AS bucket,
                           (range * range) % 1000003 AS val,
                           ['a','b','c','d','e'][CAST(range % 5 AS INT) + 1] AS tag
                    FROM range(100000))
         SELECT tag, count(*) AS n, CAST(sum(val) AS BIGINT) AS sum_val,
                max(bucket) AS max_bucket
         FROM t WHERE id >= 10000 AND id < 90000 AND tag <> 'e'
         GROUP BY tag ORDER BY tag""",

    "scan_dsv2_agg_pushdown" ->
      """WITH t AS (SELECT range AS id, range % 100 AS bucket,
                           (range * range) % 1000003 AS val,
                           ['a','b','c','d','e'][CAST(range % 5 AS INT) + 1] AS tag
                    FROM range(100000))
         SELECT bucket, count(*) AS n, CAST(sum(val) AS BIGINT) AS sum_val,
                min(val) AS min_val, max(tag) AS max_tag
         FROM t WHERE id >= 20000 AND id < 80000
         GROUP BY bucket ORDER BY bucket""",

    // OFFSET/LIMIT ride the id order — the contractual generation order
    // the pushed span arithmetic preserves on the Spark side.
    "scan_dsv2_limit_pushdown" ->
      """WITH t AS (SELECT range AS id, (range * range) % 1000003 AS val
                    FROM range(100000)),
              page AS (SELECT id, val FROM t
                       WHERE id >= 20000 AND id < 80000
                       ORDER BY id LIMIT 20000 OFFSET 55000)
         SELECT count(*) AS n, CAST(sum(id) AS BIGINT) AS sum_id,
                min(id) AS min_id, max(id) AS max_id,
                CAST(sum(val) AS BIGINT) AS sum_val
         FROM page""",

    "scan_dsv2_topn_pushdown" ->
      """WITH t AS (SELECT range AS id, (range * range) % 1000003 AS val
                    FROM range(100000)),
              topk AS (SELECT id, val FROM t
                       WHERE id >= 20000 AND id < 80000
                       ORDER BY id DESC LIMIT 1000)
         SELECT count(*) AS n, min(id) AS min_id, max(id) AS max_id,
                CAST(sum(val) AS BIGINT) AS sum_val
         FROM topk""",

    // The plain join — runtime partition pruning is an optimization the
    // oracle must be blind to.
    "scan_dsv2_runtime_filter" ->
      """WITH fact AS (SELECT range % 100 AS bucket,
                              (range * range) % 1000003 AS val
                       FROM range(200000)),
              dim AS (SELECT range % 100 AS d_bucket,
                             (range * range) % 1000003 AS d_val
                      FROM range(100)
                      WHERE ['a','b','c','d','e'][CAST(range % 5 AS INT) + 1] = 'b')
         SELECT bucket, count(*) AS n, CAST(sum(val) AS BIGINT) AS sum_val,
                max(d_val) AS dim_val
         FROM fact JOIN dim ON bucket = d_bucket
         GROUP BY bucket ORDER BY bucket""",

    // The slice ordinal re-derived arithmetically: contiguous slicing of
    // the filtered span [20000, 80000) into 5 equal 12000-id slices.
    "scan_dsv2_metadata_cols" ->
      """WITH t AS (SELECT range AS id, range % 100 AS bucket,
                           (range * range) % 1000003 AS val
                    FROM range(100000))
         SELECT (id - 20000) // 12000 AS _slice, count(*) AS n,
                CAST(sum(val) AS BIGINT) AS sum_val,
                min(bucket) AS min_bucket, max(bucket) AS max_bucket
         FROM t WHERE id >= 20000 AND id < 80000
         GROUP BY 1 ORDER BY 1""",

    // The write/read round trip is lossless, so the oracle is the same
    // aggregate computed straight from the parquet tables.
    "sink_dsv2_write" ->
      """SELECT r_name, count(*) AS n, min(n_name) AS first_nation,
                max(n_name) AS last_nation
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    // The distribution/ordering write is semantically a lossless
    // round-trip — the layout itself is asserted by the suite's write
    // audit; the oracle proves no row was lost, duplicated, or mangled
    // by the engine-planned exchange + sort below the write.
    "sink_v2_distribution" ->
      s"""SELECT event_type, count(*) AS n,
                 CAST(sum(${graft.Norm.moneySql("value")}) AS BIGINT) AS sum_cents,
                 CAST(min(${graft.Norm.moneySql("value")}) AS BIGINT) AS min_cents,
                 CAST(max(${graft.Norm.moneySql("value")}) AS BIGINT) AS max_cents
          FROM events GROUP BY event_type ORDER BY event_type""",

    "sink_cdc_apply" -> {
      val bal = graft.Norm.moneySql("c_acctbal")
      s"""WITH log AS (
            SELECT c_custkey AS k, c_nationkey AS nk, $bal AS bal,
                   'I' AS op, 1 AS seq FROM customer
            UNION ALL
            SELECT c_custkey, c_nationkey, $bal + 500, 'U', 2
            FROM customer WHERE c_custkey % 7 = 0
            UNION ALL
            SELECT c_custkey, c_nationkey, 0, 'D', 3
            FROM customer WHERE c_custkey % 13 = 0),
          last AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
                   FROM log)
          SELECT nk, count(*) AS n_rows, CAST(sum(bal) AS BIGINT) AS bal_cents,
                 CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
          FROM last WHERE rn = 1 AND op <> 'D'
          GROUP BY nk ORDER BY nk"""
    },
    "scan_cbo_stats" ->
      """SELECT count(*) AS row_count,
                CAST(min(n_nationkey) AS BIGINT) AS nk_min,
                CAST(max(n_nationkey) AS BIGINT) AS nk_max,
                count(DISTINCT n_nationkey) AS nk_ndv,
                CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nk_nulls,
                count(DISTINCT n_regionkey) AS rk_ndv
         FROM nation""",
    "scan_csv_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    // The oracle states the SEMANTICS from the parquet source: space →
    // newline is length-preserving, so an intact multiLine roundtrip must
    // reproduce the original total length and every spaced doc must still
    // contain its (replaced) separator.
    "scan_csv_multiline" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(CASE WHEN contains(text, ' ') THEN 1 ELSE 0 END) AS BIGINT) AS n_multiline,
                CAST(sum(length(text)) AS BIGINT) AS total_len
         FROM documents GROUP BY lang ORDER BY lang""",
    "scan_recursive_glob" ->
      """SELECT * FROM (
           SELECT 'glob_bucket1' AS mode, count(*) AS n_docs,
                  CAST(sum(n_chars) AS BIGINT) AS total_chars
           FROM documents WHERE doc_id % 3 = 1
           UNION ALL
           SELECT 'recursive_all', count(*), CAST(sum(n_chars) AS BIGINT)
           FROM documents)
         ORDER BY mode""",
    "scan_zstd_roundtrip" ->
      s"""SELECT o_orderstatus, count(*) AS n, ${moneySumSql("o_totalprice")} AS total
          FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "sink_compacted" ->
      s"""SELECT event_type, count(*) AS n, ${moneySumSql("value")} AS total_value
          FROM events GROUP BY event_type ORDER BY event_type""",
    "scan_json_corrupt_records" ->
      """SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS event_type,
                count(*) AS n,
                CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
         FROM events GROUP BY 1 ORDER BY event_type ASC NULLS FIRST""",
    "sink_nested_parquet" ->
      s"""SELECT count(*) AS n_orders, count(DISTINCT o_custkey) AS n_custs,
                 CAST(sum(${graft.Norm.moneySql("o_totalprice")}) AS BIGINT) AS total_cents,
                 min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey
          FROM orders""",
    "sink_decimal_roundtrip" ->
      s"""SELECT count(*) AS n,
                 CAST(sum(${graft.Norm.d4Sql("o_totalprice")}) AS BIGINT) AS sum_d4,
                 min(${graft.Norm.d4Sql("o_totalprice")}) AS min_d4,
                 max(${graft.Norm.d4Sql("o_totalprice")}) AS max_d4
          FROM orders""",
    "sink_parquet_bloom" ->
      s"""SELECT o_custkey, count(*) AS n,
                 CAST(sum(${graft.Norm.moneySql("o_totalprice")}) AS BIGINT) AS total_cents
          FROM orders WHERE o_custkey IN (42, 77)
          GROUP BY o_custkey ORDER BY o_custkey""",
    // Untouched partitions keep original cents; the overwritten one doubles.
    "sink_dynamic_overwrite" ->
      s"""SELECT event_type, count(*) AS n,
                 CAST(sum(CASE WHEN event_type = 'click' THEN cents * 2 ELSE cents END)
                      AS BIGINT) AS total_cents
          FROM (SELECT event_type, ${moneySql("value")} AS cents FROM events)
          GROUP BY event_type ORDER BY event_type""",
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
    "scan_schema_evolution" ->
      s"""WITH m AS (
            SELECT s_suppkey, s_nationkey, CAST(NULL AS BIGINT) AS bal_cents
            FROM supplier WHERE s_suppkey % 2 = 0
            UNION ALL
            SELECT s_suppkey, s_nationkey, ${moneySql("s_acctbal")} AS bal_cents
            FROM supplier WHERE s_suppkey % 2 = 1)
          SELECT s_nationkey, count(*) AS n,
                 CAST(sum(CASE WHEN bal_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
                 CAST(sum(COALESCE(bal_cents, 0)) AS BIGINT) AS bal_cents_sum
          FROM m GROUP BY 1 ORDER BY 1""",
    // The MERGE emulated declaratively: survivors (non-deleted) with the
    // update applied, plus the inserted negative keys — parity against
    // the post-MERGE table census proves the planned ReplaceData rewrite.
    // One shared emulation for both strategies (see v2MergeOracle): the
    // WriteDelta twin must land on the identical final state as the
    // ReplaceData one.
    "sink_v2_merge" -> v2MergeOracle,
    "sink_v2_merge_delta" -> v2MergeOracle,
    "sink_upsert" ->
      s"""WITH base AS (SELECT c_custkey AS b_k, ${moneySql("c_acctbal")} AS b_bal FROM customer),
               upd AS (SELECT c_custkey AS u_k, ${moneySql("c_acctbal")} + 10000 AS u_bal
                       FROM customer WHERE c_custkey % 10 = 0
                       UNION ALL
                       SELECT -c_custkey - 1 AS u_k, 0 AS u_bal
                       FROM customer WHERE c_custkey % 100 = 0),
               m AS (SELECT COALESCE(u_bal, b_bal) AS bal_cents,
                            CASE WHEN b_k IS NULL THEN 'inserted'
                                 WHEN u_k IS NULL THEN 'kept'
                                 ELSE 'updated' END AS action
                     FROM base FULL OUTER JOIN upd ON b_k = u_k)
          SELECT action, count(*) AS n, CAST(sum(bal_cents) AS BIGINT) AS bal_cents_sum
          FROM m GROUP BY 1 ORDER BY 1""",
    "scan_dynamic_pruning" ->
      s"""WITH dim AS (SELECT event_type FROM (
                         SELECT event_type,
                                row_number() OVER (ORDER BY count(*) DESC, event_type) AS rn
                         FROM events GROUP BY event_type) WHERE rn <= 2)
          SELECT e.event_type, count(*) AS n, ${moneySumSql("value")} AS total_value
          FROM events e JOIN dim ON e.event_type = dim.event_type
          GROUP BY 1 ORDER BY 1""",
    "scan_json_nested" ->
      s"""SELECT l_orderkey, l_linenumber AS ln, ${moneySql("l_quantity")} AS qty_c
          FROM lineitem WHERE l_orderkey % 100 = 0
          ORDER BY l_orderkey, ln, qty_c""",
    "sink_sorted_layout" ->
      s"""SELECT CAST(date_trunc('year', l_shipdate) AS DATE) AS ship_year,
          count(*) AS n, ${moneySumSql("l_quantity")} AS qty_sum
          FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'
          GROUP BY 1 ORDER BY 1""",
    // Same unrolled morton interleave with // for div; the write roundtrip
    // is an identity for the oracle.
    "sink_zorder_layout" -> {
      val mortonSql = (0 until 8).map { b =>
        s"((xb // ${1L << b}) % 2) * ${1L << (2 * b)} + ((yb // ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
      }.mkString(" + ")
      s"""WITH b AS (SELECT o_orderkey, ${moneySql("o_totalprice")} AS price_c,
                            o_custkey % 256 AS xb,
                            date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 256 AS yb
                     FROM orders),
              z AS (SELECT *, $mortonSql AS z FROM b)
         SELECT xb // 8 AS x_t, yb // 8 AS y_t, count(*) AS n,
                CAST(sum(price_c) AS BIGINT) AS price_sum,
                CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max
         FROM z WHERE xb BETWEEN 64 AND 95 AND yb BETWEEN 128 AND 159
         GROUP BY 1, 2 ORDER BY 1, 2"""
    },
    "scan_csv_malformed" ->
      s"""SELECT CAST(sum(CASE WHEN event_id % 50 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
          CAST(sum(CASE WHEN event_id % 50 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
          ${moneySumSql("CASE WHEN event_id % 50 <> 0 THEN value END")} AS good_cents
          FROM events""",
    "scan_ignore_corrupt_files" ->
      """SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    // strlen is DuckDB's BYTE count (octet_length only binds to BLOB); md5
    // of the string hashes the same UTF-8 bytes Spark hashed off disk.
    "scan_binary_files" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
                md5(text) AS content_md5
         FROM documents WHERE doc_id < 25 ORDER BY doc_id""",
    "scan_metadata_cols" ->
      s"""SELECT c_custkey % 4 AS from_path, count(*) AS n,
                 min(c_custkey) AS min_key, max(c_custkey) AS max_key,
                 ${moneySumSql("c_acctbal")} AS bal_cents
          FROM customer GROUP BY 1 ORDER BY 1""",
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
