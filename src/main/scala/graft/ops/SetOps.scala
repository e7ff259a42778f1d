package graft.ops

import org.apache.spark.sql.DataFrame
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
    // Join-cardinality estimation by deterministic KEY-hash sampling — the
    // "estimate before you run" probe a 100 TB join plan wants when CBO
    // ndv stats can't see key correlation. Sampling the JOIN KEY (not
    // rows) keeps the estimate unbiased for FK joins: a key survives iff
    // its md5 bucket ≡ 0 (mod 16), ALL rows of a surviving key survive on
    // BOTH sides, so every join row survives with probability exactly
    // 1/16 and E[16·sampled] = |join|. The declared frame carries the
    // exact count too (the oracle's ground truth) plus the |error| in bp;
    // at scale you run only the sampled leg — 1/16th of each scan,
    // same-shaped shuffle. Deterministic: membership is a pure function
    // of the key (llm_sample_stratified rule), no rand() anywhere.
    "util_join_cardinality_est" -> ((s, d) => {
      def smp(c: String) = expr(
        s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 8), 16, 10) AS BIGINT) % 16 = 0")
      val oAll = orders(s, d).select(col("o_orderkey"))
      val lAll = lineitem(s, d).select(col("l_orderkey"))
      val exact = oAll.join(lAll, col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n_exact"))
      val sampled = oAll.filter(smp("o_orderkey"))
        .join(lAll.filter(smp("l_orderkey")), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n_sampled"))
      exact.crossJoin(broadcast(sampled))
        .select(col("n_exact"), col("n_sampled"),
          (col("n_sampled") * 16).as("n_est"),
          expr("10000 * abs(n_sampled * 16 - n_exact) div n_exact").as("err_abs_bp"))
    }),

    // Z-order layout key (the multi-dimensional clustering a 100 TB table
    // pins its file layout to, so range predicates on EITHER dimension
    // prune files): 16+16-bit interleave of (dollar bucket, day index) in
    // pure integer bit arithmetic — Spark shiftleft/shiftright/& and
    // DuckDB <</>>/& compute the identical BIGINT. Declared output is the
    // z-range occupancy report (1024-key z-buckets with count + extrema —
    // what a layout audit reads to size files); the z-key projection
    // itself is the reusable sink-sort key. Map-only + one
    // partial-aggregatable bucket groupBy.
    "util_zorder_key" -> ((s, d) => {
      val interleave = (0 until 16).map(i =>
        s"shiftleft(shiftright(x, $i) & 1, ${2 * i}) + shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})")
        .mkString(" + ")
      events(s, d)
        .select(graft.Norm.money(col("value")).as("cents"),
          expr("""CAST(datediff(CAST(date_trunc('day', date_trunc('second', ts)) AS DATE),
                                DATE'2024-01-01') AS BIGINT)""").as("y"))
        .select(expr("cents div 100").as("x"), col("y"))
        .select(expr(s"CAST($interleave AS BIGINT)").as("z"))
        .groupBy(expr("z div 1024").as("z_bucket"))
        .agg(count(lit(1)).as("n"), min("z").as("z_min"), max("z").as("z_max"))
        .orderBy("z_bucket")
    }),

    "set_union_all" -> ((s, d) => a(s, d).unionAll(b(s, d)).orderBy("custkey")),
    "set_union_distinct" -> ((s, d) => a(s, d).union(b(s, d)).distinct().orderBy("custkey")),
    "set_intersect" -> ((s, d) => a(s, d).intersect(b(s, d)).orderBy("custkey")),
    "set_except" -> ((s, d) => a(s, d).except(b(s, d)).orderBy("custkey")),
    // Symmetric difference — the one classical set op the A∖B family above
    // doesn't cover: members of exactly one side, tagged with WHICH side so
    // the output is actionable (the reconciliation-report shape). Two
    // anti joins on the same key partitioning; both sides here are
    // dim-sized, and at scale each anti join broadcasts its smaller side.
    "set_symmetric_diff" -> ((s, d) =>
      a(s, d).distinct().join(b(s, d), Seq("custkey"), "left_anti")
        .withColumn("side", lit("a_only"))
        .unionAll(
          b(s, d).join(a(s, d).distinct(), Seq("custkey"), "left_anti")
            .withColumn("side", lit("b_only")))
        .orderBy("custkey")),
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

    // Snapshot diff (the SCD/audit utility: what changed between two loads):
    // new = old minus the %97 slice (removed), +100.00 on the %13 slice
    // (changed), plus negative-keyed fresh rows (added — disjoint from the
    // natural keyspace at every sf, like sink_upsert). Full-outer on the
    // key + value compare classifies every row in ONE key-partitioned
    // shuffle; values compare as integer cents.
    "util_table_diff" -> ((s, d) => {
      val o = customer(s, d)
        .select(col("c_custkey").as("k"), money(col("c_acctbal")).as("v"))
      val n = customer(s, d).filter(col("c_custkey") % 97 =!= 0)
        .select(col("c_custkey").as("k"),
          (money(col("c_acctbal")) +
            when(col("c_custkey") % 13 === 0, 10000L).otherwise(0L)).as("v"))
        .unionAll(customer(s, d).filter(col("c_custkey") % 89 === 0)
          .select((-col("c_custkey") - 1L).as("k"), lit(0L).as("v")))
      o.as("o").join(n.as("n"), col("o.k") === col("n.k"), "full_outer")
        .select(
          when(col("o.k").isNull, "added")
            .when(col("n.k").isNull, "removed")
            .when(col("o.v") =!= col("n.v"), "changed")
            .otherwise("same").as("status"),
          coalesce(col("o.k"), col("n.k")).as("k"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), min("k").as("min_key"), max("k").as("max_key"))
        .orderBy("status")
    }),

    // Order-independent whole-table content checksum (the ETL validation
    // utility: did the copy/convert preserve every row?): each row folds to
    // a canonical '|'-joined string (doubles as integer cents — raw double
    // repr differs across engines), md5's leading 12 hex chars become an
    // integer, and SUM + XOR over them are order-free. Any lost, duplicated,
    // or mutated row moves the checksum; the whole thing is one
    // partial-aggregatable pass.
    // The SUM accumulates in DECIMAL(38,0) (DuckDB: HUGEINT) and narrows
    // through mod 2^61−1: a BIGINT sum of 2^48-sized hashes overflows
    // ANSI-fatally past ~2^15 rows — sf0.1's 150k rows already tripped it.
    // The Mersenne-prime mod keeps the checksum BIGINT at ANY row count.
    // Partition-key uniformity audit: Shannon entropy + max bucket share
    // for candidate partition keys (custkey mod 1024 vs order day) — the
    // report that decides which key a 100 TB table hash-partitions on
    // BEFORE the first skewed shuffle. Entropy terms (n/T)·ln(T/n) floor
    // to micro-nats per bucket before the sum (order-immune, CAST AS
    // DOUBLE rule); max share is one integral divide. Per candidate: one
    // partial-aggregatable bucket count, one metadata-sized rollup.
    "util_key_entropy" -> ((s, d) => {
      val cands = orders(s, d).select(
          expr("'custkey_mod1024'").as("key_name"),
          expr("CAST(o_custkey % 1024 AS BIGINT)").as("bucket"))
        .unionByName(orders(s, d).select(
          expr("'order_day'").as("key_name"),
          expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') AS BIGINT)")
            .as("bucket")))
      val counts = cands.groupBy("key_name", "bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val tot = counts.groupBy("key_name")
        .agg(sum("n").as("t"), count(lit(1)).as("n_buckets"))
      counts.join(broadcast(tot), Seq("key_name"))
        .withColumn("term", expr(
          "CAST(floor(1000000 * ((CAST(n AS DOUBLE) / t) * ln(CAST(t AS DOUBLE) / n))) AS BIGINT)"))
        .withColumn("share_bp", expr("10000 * n div t"))
        .groupBy("key_name")
        .agg(max("n_buckets").as("n_buckets"), max("t").as("total"),
          sum("term").as("entropy_micro_sum"), max("share_bp").as("max_share_bp"))
        .orderBy("key_name")
    }),

    // Equi-height histogram of order totals — the ANALYZE-TABLE statistic
    // a cost-based optimizer stores (8 boundaries at k/8 quantiles + exact
    // per-bucket occupancy). All 8 boundaries resolve in ONE multi-cut
    // bucketed-percentile pass; the occupancy re-pass assigns each row its
    // bucket as 1 + Σ(v > b_k) — a broadcast of 1 row of boundaries and a
    // pure integer comparison chain, then an 8-group partial agg.
    "util_stats_histogram" -> ((s, d) => {
      // r14: bucket occupancy depends only on the value, so it derives
      // from the SAME value-collapsed histogram the boundaries ride —
      // n = Σw per bucket, lo/hi unchanged — and the corpus-sized vals
      // checkpoint + occupancy re-pass disappear (guide §2.3; one corpus
      // scan, plan diff in plans/r14).
      // r14 second sitting: gated spread by the histogram key (agg_iqr note).
      val hist = graft.Tables.spreadBy(s, d, "orders",
          orders(s, d).select(lit(1L).as("g"), money(col("o_totalprice")).as("cents")),
          Seq("g", "cents"))
        .groupBy("g", "cents").agg(count(lit(1)).as("w"))
        .localCheckpoint(false)
      val bounds = Shared.bucketedPdiscMulti(hist, "g", "cents", "w",
        (1 to 8).map(k => (k, 8, s"b$k"))).drop("g")
      hist.drop("g").crossJoin(broadcast(bounds))
        .withColumn("bucket", expr(
          "1 + " + (1 to 7).map(k => s"CAST(cents > b$k AS BIGINT)").mkString(" + ")))
        .groupBy("bucket")
        .agg(sum("w").as("n"), min("cents").as("lo"), max("cents").as("hi"))
        .orderBy("bucket")
    }),

    // File-layout plan per source — the sizing pass a 100 TB writer runs
    // before choosing file counts: docs, total payload chars, extrema, and
    // the file count at a 1 MiB-of-chars target via pure integer ceiling
    // division. One partial-aggregatable groupBy over (source); the
    // declared result is the plan a compaction job would execute
    // (sink_compacted is the executed sibling).
    "util_file_plan" -> ((s, d) =>
      documents(s, d)
        .select(col("source"), col("n_chars").cast("long").as("nc"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nc").as("total_chars"),
          min("nc").as("min_chars"), max("nc").as("max_chars"))
        .withColumn("files_1mib", expr("(total_chars + 1048575) div 1048576"))
        .withColumn("avg_chars", expr("total_chars div n_docs"))
        .orderBy("source")),

    // Power-of-two magnitude histogram of order totals — the size-class
    // census a storage planner runs before choosing bucket/file-size
    // boundaries. The log2 bucket is PURE INTEGER on both engines:
    // length(bin(cents)) − 1 = floor(log2(cents)) via the binary-string
    // length, so no libm call can disagree at a power-of-two boundary.
    // One partial-aggregatable ~20-group groupBy; nothing corpus-sized.
    "util_log2_histogram" -> ((s, d) =>
      orders(s, d)
        .select(money(col("o_totalprice")).as("cents"))
        .select(col("cents"), (length(expr("bin(cents)")) - 1).cast("long").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("cents").as("min_cents"),
          max("cents").as("max_cents"))
        .orderBy("bucket")),

    "util_checksum" -> ((s, d) =>
      orders(s, d)
        .select(expr(
          "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, o_orderpriority)").as("base"),
          money(col("o_totalprice")).as("cents"))
        .select(expr(
          "CAST(conv(substring(md5(concat_ws('|', base, cents)), 1, 12), 16, 10) AS BIGINT)").as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT)")
            .as("checksum_sum"),
          bit_xor(col("h")).as("checksum_xor"))),

    // Pipeline instrumentation via the Observation API (CollectMetrics):
    // the metrics ride the SAME action that materializes the data — no
    // second scan, which is the whole point at 100 TB (row counts and
    // control totals from a pass you were already paying for). The op
    // returns the observed metrics row itself so the oracle can pin the
    // values the listener would have received.
    "util_observe_metrics" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation()
      val df = orders(s, d).observe(obs,
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("rev_cents"),
        max(col("o_orderkey")).as("max_key"))
      df.foreach(_ => ()) // one materializing action; metrics ride along
      val m = obs.get
      import s.implicits._
      Seq((m("n_orders").asInstanceOf[Long], m("rev_cents").asInstanceOf[Long],
        m("max_key").asInstanceOf[Long])).toDF("n_orders", "rev_cents", "max_key")
    }),

    // Cache/reuse surface (persist + InMemoryRelation): one projection is
    // materialized to the in-memory columnar cache, then TWO downstream
    // aggregations read InMemoryTableScan instead of rescanning the source
    // — the interactive-exploration contract (scan the 100 TB once, slice
    // repeatedly). The count() forces population inside the op so the
    // returned plan is a pure cache consumer; persisting the same logical
    // plan twice is a no-op (CacheManager dedupes), so re-invocation
    // doesn't leak. Both branches' InMemoryTableScan asserted in
    // Round6Suite. Integer cents per row before caching: the cached
    // columnar batches already hold exact money.
    "util_cache_reuse" -> ((s, d) => {
      val base = orders(s, d)
        .select(col("o_custkey"), col("o_orderstatus"),
          money(col("o_totalprice")).as("cents"))
        .persist()
      // The returned plan must stay a cache consumer, so the op itself can
      // never unpersist; the handle is parked for the entrypoints' teardown
      // (Bench/Verify call CacheReuse.release() after their last action —
      // r6 advice: the retained InMemoryRelation otherwise holds executor
      // memory for the remaining ~270 ops of the session).
      CacheReuse.park(base)
      base.count(): Unit
      val byStatus = base.groupBy("o_orderstatus")
        .agg(sum("cents").as("cents_sum"), count(lit(1)).as("n"))
        .select(lit("by_status").as("dim"), col("o_orderstatus").as("key"),
          col("cents_sum"), col("n"))
      val byBucket = base.groupBy((col("o_custkey") % 10).cast("string").as("key"))
        .agg(sum("cents").as("cents_sum"), count(lit(1)).as("n"))
        .select(lit("by_bucket").as("dim"), col("key"), col("cents_sum"), col("n"))
      byStatus.unionByName(byBucket).orderBy("dim", "key")
    }),

    // Key-skew audit (the diagnosis a pipeline runs BEFORE choosing between
    // a plain, salted, or broadcast join — join_skew_salted's measurement
    // sibling): per-key event counts feed (a) the 5 heaviest keys under the
    // (count desc, key) total order with their corpus share and (b) global
    // skew stats — skew_ratio_bp = 10000·max_n·n_keys div total, i.e.
    // max/mean in basis points (10000 = perfectly uniform). Scale: one
    // partial-aggregatable groupBy is the only corpus-sized stage; top-5 is
    // a TakeOrdered (per-partition heads + driver merge of 5-row heaps, no
    // global sort), and the 1-row stats frame broadcasts onto it. rank is
    // assigned on the post-limit 5-row frame, so the unpartitioned window
    // is free.
    // Salt-factor ADVISOR for the declared fact-join keys — the
    // SCALE_TUNING saltedEquiJoin sizing rule turned into a table the
    // engine computes (the llm_lsh_band_recall pattern applied to skew:
    // read the deployment knob off a measured frame, don't estimate it):
    // per relationship ONE (key) partial agg collapses the fact side and
    // a 1-row agg reads (rows, keys, max multiplicity); the advisories
    // are exact integers — avg_mult_bp = 10000·rows div keys, the skew
    // flag by cross-multiply (max·keys > 4·rows ⇔ max > 4×avg, no
    // division), and salt_factor = max(1, ⌈max_mult/4096⌉) with 4096 the
    // declared target rows-per-reducer-task — exactly the bucket rule
    // Scale.saltedEquiJoin documents. Unlike util_skew_report (a top-N
    // leaderboard) nothing here sorts: the per-key frame collapses
    // map-side and never leaves the executors.
    "util_salt_advisor" -> ((s, d) => {
      def leg(name: String, df: DataFrame, key: String): DataFrame =
        df.groupBy(col(key)).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
            max("c").as("max_mult"))
          .select(lit(name).as("relationship"),
            col("n_rows"), col("n_keys"), col("max_mult"),
            expr("10000 * n_rows div n_keys").as("avg_mult_bp"),
            expr("CASE WHEN max_mult * n_keys > 4 * n_rows THEN 1L ELSE 0L END")
              .as("skewed"),
            expr("greatest(1L, (max_mult + 4095) div 4096)").as("salt_factor"))
      leg("events.user_id", events(s, d), "user_id")
        .unionAll(leg("lineitem.l_orderkey", lineitem(s, d), "l_orderkey"))
        .unionAll(leg("lineitem.l_suppkey", lineitem(s, d), "l_suppkey"))
        .unionAll(leg("orders.o_custkey", orders(s, d), "o_custkey"))
        .orderBy("relationship")
    }),

    "util_skew_report" -> ((s, d) => {
      val per = events(s, d).groupBy("user_id").agg(count(lit(1)).as("n_events"))
      val g = per.agg(count(lit(1)).as("n_keys"), sum("n_events").as("total"),
        max("n_events").as("max_n"))
      per.orderBy(col("n_events").desc, col("user_id")).limit(5)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("n_events").desc, col("user_id")))
            .cast("long"))
        .crossJoin(broadcast(g))
        .select(col("rank"), col("user_id"), col("n_events"),
          expr("10000 * n_events div total").as("share_bp"),
          col("n_keys"), col("max_n"),
          expr("10000 * max_n * n_keys div total").as("skew_ratio_bp"))
        .orderBy("rank")
    }),

    // Data-quality constraint audit (the dq-check stage an ETL pipeline
    // gates a load on): domain, null, range, and referential-integrity
    // checks emitted as one (check, n_checked, n_violations) report. The
    // three row-local checks are differently-filtered aggregates in ONE
    // scan pass (the agg_filter_clause anti-N-passes shape); the FK check
    // is the one that genuinely needs a second input — a left-anti count
    // against the customer keys. A zero-violation row is still a row: the
    // report asserts the check RAN, not merely that nothing failed. Scale:
    // one orders pass + one anti join on the FK key; the stack() over two
    // broadcast 1-row frames is free.
    // Full-row duplicate report — the DQ complement of dedup_distinct
    // (which silently drops): how much exact duplication exists and how
    // bad the worst clone group is. Grouping on every column is one
    // partial-aggregatable shuffle (the row itself is the key); the
    // summary is a metadata-sized global agg. ts is second-truncated so
    // the row identity both engines hash is the same one SURVEY §1.4
    // guarantees comparable.
    "util_dup_rows" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          tsec(col("ts")).as("tss"), col("value"), col("props"))
        .groupBy("event_id", "user_id", "event_type", "tss", "value", "props")
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_distinct_rows"),
          sum("c").as("n_rows"),
          sum(when(col("c") > 1, lit(1L)).otherwise(0L)).as("n_dup_groups"),
          sum(when(col("c") > 1, col("c") - 1).otherwise(0L)).as("n_excess_rows"),
          max("c").as("max_multiplicity"))),

    // Whole-schema referential-integrity audit — the RI sweep a warehouse
    // runs nightly, one report row per FK relationship: child rows, distinct
    // child keys, orphan rows, orphan keys. Each relationship is one
    // left-anti join; every dimension parent broadcasts (region/nation/
    // customer/part/supplier are dims by contract), the one fact→fact edge
    // (lineitem→orders) shuffles on the key like any fact join. The seven
    // 1-row result frames union for free. Complements
    // util_assert_constraints (per-table row checks + ONE FK probe) with
    // the full relationship graph.
    "util_fk_orphans" -> ((s, d) => {
      // parentBytes: None = fact-sized parent, no hint (shuffle anti join);
      // Some(0) = fixed-cardinality dim (region/nation), always hinted;
      // Some(b) = SF-growing dim, hint size-gated through Joins.dimBroadcast
      // (the r13 broadcast-hint doctrine — see PlanAuditSuite's sweep).
      // r14: census and orphan probe fused into ONE pass per relationship —
      // the child collapses to per-key multiplicities FIRST (one
      // partial-aggregatable shuffle, guide §2.3 "aggregate before you
      // shuffle"), then a left OUTER join against the (unique-key) parent
      // marks orphan keys as null-pk rows and all four metrics fall out of
      // one aggregate over the KEY frame: no second child scan, no
      // per-relationship broadcast(orph) mini-job, no countDistinct Expand,
      // and the join probes |keys| rows instead of |rows| (plan diff in
      // plans/r14). Join strategy per parent is unchanged (dim parents
      // broadcast, the fact→fact edge shuffles).
      def rel(name: String, child: DataFrame, ck: String,
              parent: DataFrame, pk: String, parentBytes: Option[Long]): DataFrame = {
        val par = parent.select(col(pk))
        child.select(col(ck)).groupBy(ck).agg(count(lit(1)).as("__rows"))
          .join(parentBytes.fold(par)(b => Joins.dimBroadcast(par, b)),
            col(ck) === col(pk), "left")
          .agg(coalesce(sum("__rows"), lit(0L)).as("n_child"),
            count(lit(1)).as("n_keys"),
            coalesce(sum(when(col(pk).isNull, col("__rows")).otherwise(lit(0L))), lit(0L))
              .as("n_orphan_rows"),
            count(when(col(pk).isNull, lit(1))).as("n_orphan_keys"))
          .select(lit(name).as("relationship"), col("n_child"), col("n_keys"),
            col("n_orphan_rows"), col("n_orphan_keys"))
      }
      rel("customer.c_nationkey->nation", customer(s, d), "c_nationkey",
          nation(s, d), "n_nationkey", Some(0L))
        .unionAll(rel("lineitem.l_orderkey->orders", lineitem(s, d), "l_orderkey",
          orders(s, d), "o_orderkey", None))
        .unionAll(rel("lineitem.l_partkey->part", lineitem(s, d), "l_partkey",
          part(s, d), "p_partkey", Some(tableBytes(s, d, "part"))))
        .unionAll(rel("lineitem.l_suppkey->supplier", lineitem(s, d), "l_suppkey",
          supplier(s, d), "s_suppkey", Some(tableBytes(s, d, "supplier"))))
        .unionAll(rel("nation.n_regionkey->region", nation(s, d), "n_regionkey",
          region(s, d), "r_regionkey", Some(0L)))
        .unionAll(rel("orders.o_custkey->customer", orders(s, d), "o_custkey",
          customer(s, d), "c_custkey", Some(tableBytes(s, d, "customer"))))
        .unionAll(rel("supplier.s_nationkey->nation", supplier(s, d), "s_nationkey",
          nation(s, d), "n_nationkey", Some(0L)))
        .orderBy("relationship")
    }),

    // Order-insensitive table checksums (the migration-validation
    // primitive: after moving 100 TB between clusters/engines/formats,
    // prove content equality WITHOUT sorting either side): every row
    // canonicalizes to a '|'-joined string (integer cents for money — the
    // repr discipline), hashes through md5, and the 60-bit hash prefixes
    // fold with the commutative pair (bit_xor, count) — both
    // partial-aggregatable, so the checksum is ONE map-side-combining scan
    // per table with no shuffle of data rows, and the fold is immune to
    // row order, partitioning, and engine. XOR (not sum) so the fold
    // never overflows and duplicate-row imbalances flip it. Three tables
    // union their 1-row frames for free.
    "util_table_checksum" -> ((s, d) => {
      def ck(name: String, df: DataFrame, canon: String): DataFrame =
        df.select(expr(
            s"CAST(conv(substring(md5($canon), 1, 15), 16, 10) AS BIGINT)").as("h"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("xor_checksum"))
          .select(lit(name).as("tab"), col("n_rows"), col("xor_checksum"))
      ck("nation", nation(s, d),
          "concat_ws('|', n_nationkey, n_name, n_regionkey)")
        .unionAll(ck("orders", orders(s, d, par = true),
          s"concat_ws('|', o_orderkey, o_custkey, ${moneySql("o_totalprice")}, " +
            "CAST(o_orderdate AS DATE), o_orderpriority)"))
        .unionAll(ck("lineitem", lineitem(s, d, par = true),
          s"concat_ws('|', l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT), " +
            s"${moneySql("l_extendedprice")}, l_returnflag)"))
        .orderBy("tab")
    }),

    // Sharded checksum manifest (util_table_checksum's Merkle drill-down:
    // when two 100 TB copies' table checksums DISAGREE, this locates the
    // divergence): every row's 60-bit content hash lands in shard h % 64,
    // and each shard folds its own (count, bit_xor) — compare manifests
    // side-by-side and only ~1/64 of the key space needs re-inspection;
    // recurse on higher hash bits to isolate single rows in log rounds.
    // Sharding by the CONTENT hash (not a partition id) makes the manifest
    // identical across engines, layouts, and file splits. Still ONE
    // map-side-combining scan — the groupBy key has 64 values, so the
    // shuffle carries ≤64 rows per map task; h_min/h_max ride along as
    // free extra discriminators (a swap across shards flips those even if
    // xors collide). Each drill level re-scans only to re-hash (no index),
    // the honest trade vs a sort-based diff that shuffles the full table.
    "util_checksum_shards" -> ((s, d) => {
      lineitem(s, d, par = true)
        .select(expr(
          s"""CAST(conv(substring(md5(concat_ws('|', l_orderkey, l_linenumber,
              CAST(l_quantity AS BIGINT), ${moneySql("l_extendedprice")},
              l_returnflag)), 1, 15), 16, 10) AS BIGINT)""").as("h"))
        .groupBy(expr("h % 64").as("shard"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_checksum"),
          min("h").as("h_min"), max("h").as("h_max"))
        .orderBy("shard")
    }),

    "util_assert_constraints" -> ((s, d) => {
      val rowChecks = orders(s, d).agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_price"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)).as("v_status"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_null"))
      val fk = orders(s, d).select("o_custkey")
        .join(customer(s, d).select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk"))
      rowChecks.crossJoin(broadcast(fk)).selectExpr(
        """stack(4,
             'fk_orders_customer',    n, v_fk,
             'o_custkey_not_null',    n, v_null,
             'o_orderstatus_domain',  n, v_status,
             'o_totalprice_positive', n, v_price)
           AS (check_name, n_checked, n_violations)""")
        .orderBy("check_name")
    }),

    // Table profiler (the discover-before-you-join utility: one report row
    // per column with cardinality and range). All five columns profile in
    // ONE aggregation pass — the multi-distinct Expand plan (agg_multi_
    // distinct's shape) replaces five separate scans; min/max leave as
    // canonical STRINGS (keys/cents rendered from BIGINT — never a raw
    // double string, whose exponent formatting is engine-specific). At
    // 100 TB exact n_distinct is the expensive column; the sketch
    // alternative is agg_approx_distinct/agg_sketch_hll.
    "util_profile_table" -> ((s, d) =>
      orders(s, d, par = true)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), money(col("o_totalprice")).as("cents"))
        .agg(count(lit(1)).as("n"),
          countDistinct("o_orderkey").as("nd_ok"),
          min("o_orderkey").cast("string").as("mn_ok"),
          max("o_orderkey").cast("string").as("mx_ok"),
          countDistinct("o_custkey").as("nd_ck"),
          min("o_custkey").cast("string").as("mn_ck"),
          max("o_custkey").cast("string").as("mx_ck"),
          countDistinct("o_orderstatus").as("nd_st"),
          min("o_orderstatus").as("mn_st"), max("o_orderstatus").as("mx_st"),
          countDistinct("o_orderpriority").as("nd_pr"),
          min("o_orderpriority").as("mn_pr"), max("o_orderpriority").as("mx_pr"),
          countDistinct("cents").as("nd_tp"),
          min("cents").cast("string").as("mn_tp"),
          max("cents").cast("string").as("mx_tp"))
        .selectExpr(
          """stack(5,
               'o_custkey',          n, nd_ck, mn_ck, mx_ck,
               'o_orderkey',         n, nd_ok, mn_ok, mx_ok,
               'o_orderpriority',    n, nd_pr, mn_pr, mx_pr,
               'o_orderstatus',      n, nd_st, mn_st, mx_st,
               'o_totalprice_cents', n, nd_tp, mn_tp, mx_tp)
             AS (column_name, n_rows, n_distinct, min_s, max_s)""")
        .orderBy("column_name")),
  )

  val oracle: Map[String, String] = Map(
    "util_join_cardinality_est" ->
      """WITH ex AS (SELECT count(*) AS n_exact
                     FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
              sm AS (SELECT count(*) AS n_sampled
                     FROM (SELECT o_orderkey FROM orders
                           WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 16 = 0) o
                     JOIN (SELECT l_orderkey FROM lineitem
                           WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT % 16 = 0) l
                       ON o.o_orderkey = l.l_orderkey)
         SELECT n_exact, n_sampled, CAST(n_sampled * 16 AS BIGINT) AS n_est,
                CAST(10000 * abs(n_sampled * 16 - n_exact) // n_exact AS BIGINT) AS err_abs_bp
         FROM ex, sm""",
    "util_zorder_key" -> {
      val interleave = (0 until 16).map(i =>
        s"((((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1}))")
        .mkString(" + ")
      s"""WITH b AS (SELECT ${graft.Norm.moneySql("value")} // 100 AS x,
                            date_diff('day', DATE '2024-01-01',
                                      CAST(date_trunc('day', ts) AS DATE)) AS y
                     FROM events),
              z AS (SELECT CAST($interleave AS BIGINT) AS z FROM b)
         SELECT z // 1024 AS z_bucket, count(*) AS n,
                CAST(min(z) AS BIGINT) AS z_min, CAST(max(z) AS BIGINT) AS z_max
         FROM z GROUP BY 1 ORDER BY 1"""
    },
    "util_key_entropy" ->
      """WITH cands AS (SELECT 'custkey_mod1024' AS key_name,
                               CAST(o_custkey % 1024 AS BIGINT) AS bucket FROM orders
                        UNION ALL
                        SELECT 'order_day' AS key_name,
                               CAST(date_diff('day', DATE '1995-01-01',
                                              CAST(o_orderdate AS DATE)) AS BIGINT) AS bucket
                        FROM orders),
              c AS (SELECT key_name, bucket, count(*) AS n FROM cands GROUP BY 1, 2),
              t AS (SELECT key_name, CAST(sum(n) AS BIGINT) AS t, count(*) AS n_buckets
                    FROM c GROUP BY 1)
         SELECT key_name, max(n_buckets) AS n_buckets, max(t) AS total,
                CAST(sum(CAST(floor(1000000 * ((CAST(n AS DOUBLE) / t) * ln(CAST(t AS DOUBLE) / n))) AS BIGINT)) AS BIGINT) AS entropy_micro_sum,
                max(10000 * n // t) AS max_share_bp
         FROM c JOIN t USING (key_name)
         GROUP BY key_name ORDER BY key_name""",
    "util_stats_histogram" ->
      s"""WITH c AS (SELECT ${graft.Norm.moneySql("o_totalprice")} AS cents FROM orders),
              b AS (SELECT quantile_disc(cents, 0.125) AS b1, quantile_disc(cents, 0.25) AS b2,
                           quantile_disc(cents, 0.375) AS b3, quantile_disc(cents, 0.5) AS b4,
                           quantile_disc(cents, 0.625) AS b5, quantile_disc(cents, 0.75) AS b6,
                           quantile_disc(cents, 0.875) AS b7
                    FROM c)
         SELECT 1 + CAST(cents > b1 AS BIGINT) + CAST(cents > b2 AS BIGINT)
                  + CAST(cents > b3 AS BIGINT) + CAST(cents > b4 AS BIGINT)
                  + CAST(cents > b5 AS BIGINT) + CAST(cents > b6 AS BIGINT)
                  + CAST(cents > b7 AS BIGINT) AS bucket,
                count(*) AS n, min(cents) AS lo, max(cents) AS hi
         FROM c CROSS JOIN b
         GROUP BY bucket ORDER BY bucket""",
    "util_file_plan" ->
      """SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(min(n_chars) AS BIGINT) AS min_chars,
                CAST(max(n_chars) AS BIGINT) AS max_chars,
                (CAST(sum(n_chars) AS BIGINT) + 1048575) // 1048576 AS files_1mib,
                CAST(sum(n_chars) AS BIGINT) // count(*) AS avg_chars
         FROM documents GROUP BY source ORDER BY source""",
    "util_log2_histogram" ->
      s"""WITH c AS (SELECT ${graft.Norm.moneySql("o_totalprice")} AS cents FROM orders)
         SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket, count(*) AS n,
                min(cents) AS min_cents, max(cents) AS max_cents
         FROM c GROUP BY 1 ORDER BY bucket""",
    "set_union_all" -> s"($aSql) UNION ALL ($bSql) ORDER BY custkey",
    "set_union_distinct" -> s"($aSql) UNION ($bSql) ORDER BY custkey",
    "set_intersect" -> s"($aSql) INTERSECT ($bSql) ORDER BY custkey",
    "set_except" -> s"($aSql) EXCEPT ($bSql) ORDER BY custkey",
    "set_symmetric_diff" ->
      s"""SELECT custkey, 'a_only' AS side
          FROM (SELECT DISTINCT custkey FROM ($aSql)) a
          WHERE NOT EXISTS (SELECT 1 FROM ($bSql) b WHERE b.custkey = a.custkey)
          UNION ALL
          SELECT custkey, 'b_only' AS side
          FROM ($bSql) b
          WHERE NOT EXISTS (SELECT 1 FROM ($aSql) a WHERE a.custkey = b.custkey)
          ORDER BY custkey""",
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
    "util_table_diff" ->
      s"""WITH o AS (SELECT c_custkey AS k, ${moneySql("c_acctbal")} AS v FROM customer),
               n AS (SELECT c_custkey AS k,
                            ${moneySql("c_acctbal")} +
                            CASE WHEN c_custkey % 13 = 0 THEN 10000 ELSE 0 END AS v
                     FROM customer WHERE c_custkey % 97 <> 0
                     UNION ALL
                     SELECT -c_custkey - 1 AS k, 0 AS v
                     FROM customer WHERE c_custkey % 89 = 0),
               c AS (SELECT CASE WHEN o.k IS NULL THEN 'added'
                                 WHEN n.k IS NULL THEN 'removed'
                                 WHEN o.v <> n.v THEN 'changed'
                                 ELSE 'same' END AS status,
                            COALESCE(o.k, n.k) AS k
                     FROM o FULL OUTER JOIN n ON o.k = n.k)
          SELECT status, count(*) AS n, min(k) AS min_key, max(k) AS max_key
          FROM c GROUP BY status ORDER BY status""",
    "util_checksum" ->
      s"""SELECT count(*) AS n_rows,
                 CAST(sum(h) % 2305843009213693951 AS BIGINT) AS checksum_sum,
                 bit_xor(h) AS checksum_xor
          FROM (SELECT ('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
                          o_orderstatus, o_orderpriority, ${moneySql("o_totalprice")})), 1, 12))::BIGINT AS h
                FROM orders)""",
    // The metrics are plain aggregates over the observed frame.
    "util_observe_metrics" ->
      s"""SELECT count(*) AS n_orders,
                 ${moneySumSql("o_totalprice")} AS rev_cents,
                 max(o_orderkey) AS max_key
          FROM orders""",
    "util_cache_reuse" ->
      s"""WITH base AS (SELECT o_custkey, o_orderstatus, ${moneySql("o_totalprice")} AS cents
                        FROM orders)
         SELECT * FROM (
           SELECT 'by_status' AS dim, o_orderstatus AS key,
                  CAST(sum(cents) AS BIGINT) AS cents_sum, count(*) AS n
           FROM base GROUP BY o_orderstatus
           UNION ALL
           SELECT 'by_bucket' AS dim, CAST(o_custkey % 10 AS VARCHAR) AS key,
                  CAST(sum(cents) AS BIGINT) AS cents_sum, count(*) AS n
           FROM base GROUP BY o_custkey % 10)
         ORDER BY dim, key""",
    // Same per-leg (key) collapse + 1-row read; events.user_id included
    // (the one genuinely skewed fixture key).
    "util_salt_advisor" ->
      """WITH e AS (SELECT count(*) AS c FROM events GROUP BY user_id),
              lo AS (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey),
              ls AS (SELECT count(*) AS c FROM lineitem GROUP BY l_suppkey),
              oc AS (SELECT count(*) AS c FROM orders GROUP BY o_custkey),
              legs AS (
                SELECT 'events.user_id' AS relationship, CAST(sum(c) AS BIGINT) AS n_rows,
                       count(*) AS n_keys, CAST(max(c) AS BIGINT) AS max_mult FROM e
                UNION ALL
                SELECT 'lineitem.l_orderkey', CAST(sum(c) AS BIGINT), count(*), CAST(max(c) AS BIGINT) FROM lo
                UNION ALL
                SELECT 'lineitem.l_suppkey', CAST(sum(c) AS BIGINT), count(*), CAST(max(c) AS BIGINT) FROM ls
                UNION ALL
                SELECT 'orders.o_custkey', CAST(sum(c) AS BIGINT), count(*), CAST(max(c) AS BIGINT) FROM oc)
         SELECT relationship, n_rows, n_keys, max_mult,
                CAST(10000 * n_rows // n_keys AS BIGINT) AS avg_mult_bp,
                CAST(CASE WHEN max_mult * n_keys > 4 * n_rows THEN 1 ELSE 0 END AS BIGINT) AS skewed,
                CAST(greatest(1, (max_mult + 4095) // 4096) AS BIGINT) AS salt_factor
         FROM legs ORDER BY relationship""",
    "util_skew_report" ->
      """WITH per AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
              g AS (SELECT count(*) AS n_keys, sum(n_events) AS total,
                           max(n_events) AS max_n FROM per),
              top AS (SELECT user_id, n_events,
                             row_number() OVER (ORDER BY n_events DESC, user_id) AS rank
                      FROM per ORDER BY n_events DESC, user_id LIMIT 5)
         SELECT CAST(rank AS BIGINT) AS rank, user_id,
                CAST(n_events AS BIGINT) AS n_events,
                CAST(10000 * n_events // total AS BIGINT) AS share_bp,
                CAST(n_keys AS BIGINT) AS n_keys, CAST(max_n AS BIGINT) AS max_n,
                CAST(10000 * max_n * n_keys // total AS BIGINT) AS skew_ratio_bp
         FROM top, g ORDER BY rank""",
    "util_dup_rows" ->
      """WITH g AS (SELECT event_id, user_id, event_type,
                           date_trunc('second', ts) AS tss, value, props,
                           count(*) AS c
                    FROM events GROUP BY ALL)
         SELECT count(*) AS n_distinct_rows,
                CAST(sum(c) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
                CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS n_excess_rows,
                max(c) AS max_multiplicity
         FROM g""",
    // Identical canonical strings (concat_ws renders ints/dates the same
    // on both engines; the money term is the shared portable SQL), md5 of
    // the same bytes, 60-bit hex prefix via ('0x'||…)::BIGINT, commutative
    // bit_xor fold — so the checksums must match bit-for-bit.
    "util_table_checksum" ->
      s"""WITH nh AS (SELECT ('0x' || substr(md5(concat_ws('|', n_nationkey, n_name, n_regionkey)), 1, 15))::BIGINT AS h
                      FROM nation),
              oh AS (SELECT ('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
                              ${graft.Norm.moneySql("o_totalprice")},
                              CAST(o_orderdate AS DATE), o_orderpriority)), 1, 15))::BIGINT AS h
                     FROM orders),
              lh AS (SELECT ('0x' || substr(md5(concat_ws('|', l_orderkey, l_linenumber,
                              CAST(l_quantity AS BIGINT),
                              ${graft.Norm.moneySql("l_extendedprice")}, l_returnflag)), 1, 15))::BIGINT AS h
                     FROM lineitem)
         SELECT tab, n_rows, xor_checksum FROM (
           SELECT 'nation' AS tab, count(*) AS n_rows,
                  CAST(bit_xor(h) AS BIGINT) AS xor_checksum FROM nh
           UNION ALL
           SELECT 'orders', count(*), CAST(bit_xor(h) AS BIGINT) FROM oh
           UNION ALL
           SELECT 'lineitem', count(*), CAST(bit_xor(h) AS BIGINT) FROM lh)
         ORDER BY tab""",
    // Same canonical string/hash/fold as util_table_checksum's lineitem
    // leg; the shard key is the hash's low 6 bits on both engines (h ≥ 0,
    // so % agrees between Spark and DuckDB).
    "util_checksum_shards" ->
      s"""WITH lh AS (SELECT ('0x' || substr(md5(concat_ws('|', l_orderkey, l_linenumber,
                              CAST(l_quantity AS BIGINT),
                              ${graft.Norm.moneySql("l_extendedprice")}, l_returnflag)), 1, 15))::BIGINT AS h
                      FROM lineitem)
         SELECT h % 64 AS shard, count(*) AS n_rows,
                CAST(bit_xor(h) AS BIGINT) AS xor_checksum,
                min(h) AS h_min, max(h) AS h_max
         FROM lh GROUP BY 1 ORDER BY 1""",
    "util_fk_orphans" ->
      """WITH r AS (
           SELECT 'customer.c_nationkey->nation' AS relationship,
                  (SELECT count(*) FROM customer) AS n_child,
                  (SELECT count(DISTINCT c_nationkey) FROM customer) AS n_keys,
                  (SELECT count(*) FROM customer c
                    WHERE NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.c_nationkey)) AS n_orphan_rows,
                  (SELECT count(DISTINCT c_nationkey) FROM customer c
                    WHERE NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.c_nationkey)) AS n_orphan_keys
           UNION ALL
           SELECT 'lineitem.l_orderkey->orders',
                  (SELECT count(*) FROM lineitem),
                  (SELECT count(DISTINCT l_orderkey) FROM lineitem),
                  (SELECT count(*) FROM lineitem c
                    WHERE NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey)),
                  (SELECT count(DISTINCT l_orderkey) FROM lineitem c
                    WHERE NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey))
           UNION ALL
           SELECT 'lineitem.l_partkey->part',
                  (SELECT count(*) FROM lineitem),
                  (SELECT count(DISTINCT l_partkey) FROM lineitem),
                  (SELECT count(*) FROM lineitem c
                    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.l_partkey)),
                  (SELECT count(DISTINCT l_partkey) FROM lineitem c
                    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.l_partkey))
           UNION ALL
           SELECT 'lineitem.l_suppkey->supplier',
                  (SELECT count(*) FROM lineitem),
                  (SELECT count(DISTINCT l_suppkey) FROM lineitem),
                  (SELECT count(*) FROM lineitem c
                    WHERE NOT EXISTS (SELECT 1 FROM supplier p WHERE p.s_suppkey = c.l_suppkey)),
                  (SELECT count(DISTINCT l_suppkey) FROM lineitem c
                    WHERE NOT EXISTS (SELECT 1 FROM supplier p WHERE p.s_suppkey = c.l_suppkey))
           UNION ALL
           SELECT 'nation.n_regionkey->region',
                  (SELECT count(*) FROM nation),
                  (SELECT count(DISTINCT n_regionkey) FROM nation),
                  (SELECT count(*) FROM nation c
                    WHERE NOT EXISTS (SELECT 1 FROM region p WHERE p.r_regionkey = c.n_regionkey)),
                  (SELECT count(DISTINCT n_regionkey) FROM nation c
                    WHERE NOT EXISTS (SELECT 1 FROM region p WHERE p.r_regionkey = c.n_regionkey))
           UNION ALL
           SELECT 'orders.o_custkey->customer',
                  (SELECT count(*) FROM orders),
                  (SELECT count(DISTINCT o_custkey) FROM orders),
                  (SELECT count(*) FROM orders c
                    WHERE NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey)),
                  (SELECT count(DISTINCT o_custkey) FROM orders c
                    WHERE NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey))
           UNION ALL
           SELECT 'supplier.s_nationkey->nation',
                  (SELECT count(*) FROM supplier),
                  (SELECT count(DISTINCT s_nationkey) FROM supplier),
                  (SELECT count(*) FROM supplier c
                    WHERE NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.s_nationkey)),
                  (SELECT count(DISTINCT s_nationkey) FROM supplier c
                    WHERE NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.s_nationkey)))
         SELECT relationship, CAST(n_child AS BIGINT) AS n_child,
                CAST(n_keys AS BIGINT) AS n_keys,
                CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows,
                CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys
         FROM r ORDER BY relationship""",
    "util_assert_constraints" ->
      """WITH rc AS (SELECT count(*) AS n,
                            CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
                            CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
                            CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null
                     FROM orders),
              fk AS (SELECT count(*) AS v_fk FROM orders
                     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
         SELECT * FROM (
           SELECT 'fk_orders_customer' AS check_name, n AS n_checked, v_fk AS n_violations FROM rc, fk
           UNION ALL SELECT 'o_custkey_not_null', n, v_null FROM rc
           UNION ALL SELECT 'o_orderstatus_domain', n, v_status FROM rc
           UNION ALL SELECT 'o_totalprice_positive', n, v_price FROM rc)
         ORDER BY check_name""",
    "util_profile_table" ->
      s"""WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
                            ${moneySql("o_totalprice")} AS cents
                     FROM orders),
              p AS (SELECT count(*) AS n,
                           count(DISTINCT o_orderkey) AS nd_ok,
                           CAST(min(o_orderkey) AS VARCHAR) AS mn_ok,
                           CAST(max(o_orderkey) AS VARCHAR) AS mx_ok,
                           count(DISTINCT o_custkey) AS nd_ck,
                           CAST(min(o_custkey) AS VARCHAR) AS mn_ck,
                           CAST(max(o_custkey) AS VARCHAR) AS mx_ck,
                           count(DISTINCT o_orderstatus) AS nd_st,
                           min(o_orderstatus) AS mn_st, max(o_orderstatus) AS mx_st,
                           count(DISTINCT o_orderpriority) AS nd_pr,
                           min(o_orderpriority) AS mn_pr, max(o_orderpriority) AS mx_pr,
                           count(DISTINCT cents) AS nd_tp,
                           CAST(min(cents) AS VARCHAR) AS mn_tp,
                           CAST(max(cents) AS VARCHAR) AS mx_tp
                    FROM o)
         SELECT * FROM (
           SELECT 'o_custkey' AS column_name, n AS n_rows, nd_ck AS n_distinct, mn_ck AS min_s, mx_ck AS max_s FROM p
           UNION ALL SELECT 'o_orderkey', n, nd_ok, mn_ok, mx_ok FROM p
           UNION ALL SELECT 'o_orderpriority', n, nd_pr, mn_pr, mx_pr FROM p
           UNION ALL SELECT 'o_orderstatus', n, nd_st, mn_st, mx_st FROM p
           UNION ALL SELECT 'o_totalprice_cents', n, nd_tp, mn_tp, mx_tp FROM p)
         ORDER BY column_name""",
  )
}
