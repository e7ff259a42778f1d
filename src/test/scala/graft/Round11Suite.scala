package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 closures: VERDICT r10 items + ADVICE fixes. */
class Round11Suite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = "/root/testdata/sf0.01"

  test("scan_dsv2_columnar: scan is vectorized, pushdown survives, result == row-mode twin") {
    // r10 verdict #2: the columnar=true option must flip the SAME connector
    // to a ColumnarBatch read path without changing pushdown or results.
    val df = SparkEntry.queries("scan_dsv2_columnar")(s, d)
    val got = df.collect().map(_.toString).toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("mode=columnar"), s"columnar option did not reach the scan:\n$plan")
    // The scan node emits ColumnarBatches, so the plan must carry the
    // ColumnarToRow transition feeding whole-stage codegen.
    assert(plan.contains("ColumnarToRow"), s"no ColumnarToRow over the vectorized scan:\n$plan")
    // Pushdown is mode-independent: id span narrowed, residual tag filter
    // Spark-side, id pruned from the read schema (consumed by the span).
    assert(plan.contains("span=[10000,90000)"), s"id range not pushed in columnar mode:\n$plan")
    assert(plan.contains("NOT (tag"), s"residual tag filter vanished:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema: struct<"))
      .getOrElse(fail(s"no ReadSchema in scan description:\n$plan"))
    assert(!readSchema.matches(".*struct<[^>]*\\bid\\b[^>]*>.*"), s"id survived pruning:\n$readSchema")
    // Row-mode twin: identical query, columnar off — hash-identical rows,
    // and the plan must show the row path (default unchanged).
    val row = s.read.format("graft.sources.GraftRangeSource")
      .option("rows", 100000L).option("slices", 8)
      .load()
      .filter(col("id") >= 10000L && col("id") < 90000L && col("tag") =!= "e")
      .groupBy("tag")
      .agg(count(lit(1)).as("n"), sum("val").as("sum_val"), max("bucket").as("max_bucket"))
      .orderBy("tag")
    val rowGot = row.collect().map(_.toString).toSeq
    assert(row.queryExecution.executedPlan.toString.contains("mode=row"))
    assert(got == rowGot, s"columnar and row reads diverge:\n$got\nvs\n$rowGot")
    assert(got.nonEmpty)
  }

  test("scan_dsv2_agg_pushdown: GROUP BY + COUNT/SUM/MIN/MAX run inside the source; merge agg on top") {
    val df = SparkEntry.queries("scan_dsv2_agg_pushdown")(s, d)
    val got = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // The pushed aggregate must appear on the scan node, and the scan's
    // read schema must be the GROUP-BY + partial-agg columns — the raw
    // id/val rows never cross the source boundary.
    assert(plan.contains("PushedAggregation: [COUNT(*), SUM(val), MIN(val), MAX(tag)]"),
      s"aggregation not pushed to the source:\n$plan")
    assert(plan.contains("PushedGroupBy: [bucket]"), s"group-by not pushed:\n$plan")
    assert(plan.contains("span=[20000,80000)"), s"filters must still narrow the span:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema: struct<"))
      .getOrElse(fail(s"no ReadSchema in scan description:\n$plan"))
    assert(readSchema.contains("struct<bucket,agg_"),
      s"scan must read partial-agg rows, not raw rows:\n$readSchema")
    // Independent Spark-side truth from range() — same arithmetic, no
    // custom source involved (the DuckDB oracle is the cross-engine twin).
    val want = s.range(20000L, 80000L)
      .select((col("id") % 100).as("bucket"),
        ((col("id") * col("id")) % 1000003).as("val"),
        element_at(array(lit("a"), lit("b"), lit("c"), lit("d"), lit("e")),
          (col("id") % 5 + 1).cast("int")).as("tag"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("val").as("sum_val"),
        min("val").as("min_val"), max("tag").as("max_tag"))
      .orderBy("bucket").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq,
      s"pushed aggregate diverges from range() truth:\n${got.take(3).mkString}\nvs\n${want.take(3).mkString}")
  }

  test("dsv2 aggregate pushdown: combo sweep vs range() truth (group keys × functions, incl. global agg)") {
    // Every supported (groupBy, aggs) shape the builder accepts must stay
    // value-identical to a plain range() recomputation — partial rows per
    // partition, merged by Spark, can't depend on the slicing.
    val base = s.read.format("graft.sources.GraftRangeSource")
      .option("rows", 30000L).option("slices", 7)
      .load().filter(col("id") >= 3000L && col("id") < 27000L)
    val truth = s.range(3000L, 27000L)
      .select(col("id"), (col("id") % 100).as("bucket"),
        ((col("id") * col("id")) % 1000003).as("val"),
        element_at(array(lit("a"), lit("b"), lit("c"), lit("d"), lit("e")),
          (col("id") % 5 + 1).cast("int")).as("tag"))
    // avg is the rewrite case: with partial pushdown Spark decomposes it
    // to Sum+Count BEFORE translating, so the source only ever sees the
    // shapes it supports — and the final divide happens Spark-side.
    val aggs = Seq(count(lit(1)).as("c"), sum("id").as("si"), sum("val").as("sv"),
      min("val").as("mnv"), max("val").as("mxv"), min("tag").as("mnt"), max("tag").as("mxt"),
      avg("val").as("av"))
    for (keys <- Seq(Seq("bucket"), Seq("tag"), Seq("bucket", "tag"), Seq.empty)) {
      def run(src: org.apache.spark.sql.DataFrame) = {
        val g = if (keys.isEmpty) src.groupBy() else src.groupBy(keys.map(col): _*)
        val agged = g.agg(aggs.head, aggs.tail: _*)
        (if (keys.isEmpty) agged else agged.orderBy(keys.map(col): _*)).collect().map(_.toString).toSeq
      }
      val df = if (keys.isEmpty) base.groupBy() else base.groupBy(keys.map(col): _*)
      val agged = df.agg(aggs.head, aggs.tail: _*)
      val pushedPlan = agged.queryExecution.executedPlan.toString
      assert(pushedPlan.contains("PushedAggregation:"),
        s"combo $keys did not push:\n$pushedPlan")
      assert(run(base) == run(truth), s"combo $keys diverged from range() truth")
    }
  }

  test("scan_dsv2_limit_pushdown: OFFSET/LIMIT narrow the generated span; exact span arithmetic") {
    val df = SparkEntry.queries("scan_dsv2_limit_pushdown")(s, d)
    val r = df.collect()(0)
    assert(r.getLong(0) == 5000L && r.getLong(2) == 75000L && r.getLong(3) == 79999L,
      s"offset/limit page wrong: $r")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedOffset: 55000"), s"offset not pushed:\n$plan")
    assert(plan.contains("PushedLimit:"), s"limit not pushed:\n$plan")
    assert(plan.contains("span=[75000,80000)"),
      s"span must start past the offset and stop at the filter bound:\n$plan")
    // Unit-level span arithmetic, decoupled from Spark's pushdown rule:
    // offset skips from the low end, limit caps after it (SQL order).
    import scala.jdk.CollectionConverters._
    def freshBuilder() = new graft.sources.GraftRangeSource()
      .getTable(null, Array.empty, Map("rows" -> "100000", "slices" -> "4").asJava)
      .asInstanceOf[graft.sources.GraftRangeTable]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
      .asInstanceOf[graft.sources.GraftRangeScanBuilder]
    val b = freshBuilder()
    b.pushFilters(Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 20000L),
      org.apache.spark.sql.sources.LessThan("id", 80000L)))
    assert(b.pushOffset(1000) && b.pushLimit(500))
    val parts = b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.GraftRangePartition])
    assert(parts.head.start == 21000L && parts.last.end == 21500L,
      s"span arithmetic wrong: ${parts.toSeq}")
  }

  test("scan_dsv2_topn_pushdown: ORDER BY id LIMIT n becomes span arithmetic at the source") {
    val df = SparkEntry.queries("scan_dsv2_topn_pushdown")(s, d)
    val r = df.collect()(0)
    assert(r.getLong(0) == 1000L && r.getLong(1) == 79000L && r.getLong(2) == 79999L,
      s"top-1000-by-id-desc wrong: $r")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [id DESC LIMIT 1000]"), s"topN not pushed:\n$plan")
    assert(plan.contains("span=[79000,80000)"),
      s"the last 1000 ids ARE the top 1000 — span must narrow:\n$plan")
    // Partial pushdown: Spark re-establishes cross-partition order itself.
    assert(plan.contains("TakeOrderedAndProject"), s"global top-N re-check missing:\n$plan")
    // Ascending twin at the unit level: first n of the span.
    import scala.jdk.CollectionConverters._
    val b = new graft.sources.GraftRangeSource()
      .getTable(null, Array.empty, Map("rows" -> "100000", "slices" -> "4").asJava)
      .asInstanceOf[graft.sources.GraftRangeTable]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
      .asInstanceOf[graft.sources.GraftRangeScanBuilder]
    b.pushFilters(Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 20000L)))
    assert(b.pushTopN(Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
      org.apache.spark.sql.connector.expressions.Expressions.column("id"),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)), 250))
    val parts = b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.GraftRangePartition])
    assert(parts.head.start == 20000L && parts.last.end == 20250L,
      s"ascending top-n must take the first n: ${parts.toSeq}")
  }

  test("join_spj_storage_partitioned: the join itself plans with ZERO exchanges (source co-location)") {
    val df = SparkEntry.queries("join_spj_storage_partitioned")(s, d)
    val got = df.collect()
    assert(got.length == 5, s"expected one row per dim_tag: ${got.toSeq}")
    val plan = df.queryExecution.executedPlan.toString
    val finalSec = plan.split("== Initial Plan ==")(0)
    assert(finalSec.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(finalSec.linesIterator.count(_.contains("partitioning=bucket(100)")) == 2,
      s"both scans must report the bucket layout:\n$plan")
    // Everything from the SortMergeJoin line down is its subtree (the
    // leaves of the printed plan) — co-location means NO exchange there.
    // Exchanges above the join (the post-join aggregation) are expected.
    val joinDown = finalSec.linesIterator.dropWhile(!_.contains("SortMergeJoin")).toSeq
    assert(joinDown.nonEmpty && !joinDown.exists(_.contains("Exchange")),
      s"storage-partitioned join must not shuffle or broadcast either side:\n$plan")
  }

  test("scan_dsv2_runtime_filter: DPP-for-V2 drops bucket partitions before any task launches") {
    graft.sources.GraftRangeSource.lastRuntimePrune = None
    val df = SparkEntry.queries("scan_dsv2_runtime_filter")(s, d)
    val got = df.collect()
    assert(got.length == 20, s"dim filter keeps 20 buckets: ${got.length}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no DynamicPruningSubquery was injected on the fact scan:\n$plan")
    // The driver-side hook records the actual partition drop: 20 of 100
    // bucket partitions survive the dim's runtime IN-set.
    assert(graft.sources.GraftRangeSource.lastRuntimePrune.contains((20, 100)),
      s"runtime filter did not prune partitions: ${graft.sources.GraftRangeSource.lastRuntimePrune}")
  }

  test("sink_dsv2_write: staged commit protocol — invisible until commit, atomic publish, truncate, abort") {
    import graft.sources._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val cat = new GraftMemCatalog
    cat.initialize("t11cat", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "proto")
    val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
    if (cat.tableExists(ident)) cat.dropTable(ident)
    cat.createTable(ident, schema, Array.empty,
      java.util.Collections.emptyMap[String, String]())
    def stored = GraftMemStore.rows("t11cat.proto")
    assert(stored.isEmpty)
    // Task-side staging: rows written (and even task-committed) must stay
    // INVISIBLE until the driver's batch commit.
    val bw = new GraftMemBatchWrite("t11cat.proto", schema, truncateFirst = false)
    val w0 = new GraftMemWriterFactory(schema).createWriter(0, 0L)
    val w1 = new GraftMemWriterFactory(schema).createWriter(1, 1L)
    w0.write(new GenericInternalRow(Array[Any](1L, UTF8String.fromString("a"))))
    w1.write(new GenericInternalRow(Array[Any](2L, UTF8String.fromString("b"))))
    val m1 = w1.commit(); val m0 = w0.commit()
    assert(stored.isEmpty, "staged rows leaked into the store before batch commit")
    // Atomic publish, partition order deterministic regardless of message order.
    bw.commit(Array(m1, m0))
    assert(stored.map(_.toSeq).toSeq == Seq(Seq(1L, "a"), Seq(2L, "b")))
    // Abort path publishes nothing — and destroys the staged file, so an
    // aborted message can never be replayed into a later commit (r12
    // file-backed staging: abort is destructive by design).
    val wA = new GraftMemWriterFactory(schema).createWriter(0, 2L)
    wA.write(new GenericInternalRow(Array[Any](9L, UTF8String.fromString("z"))))
    val mA = wA.commit().asInstanceOf[GraftMemStagedCommit]
    new GraftMemBatchWrite("t11cat.proto", schema, truncateFirst = false).abort(Array(mA))
    assert(stored.length == 2, "abort must not publish staged rows")
    assert(!new java.io.File(mA.path).exists(), "abort must delete the staged file")
    // Truncate (the overwrite/createOrReplace path) replaces, append extends.
    val wT = new GraftMemWriterFactory(schema).createWriter(0, 3L)
    wT.write(new GenericInternalRow(Array[Any](9L, UTF8String.fromString("z"))))
    val mT = wT.commit()
    val bwT = new GraftMemBatchWrite("t11cat.proto", schema, truncateFirst = true)
    bwT.commit(Array(mT))
    assert(stored.map(_.toSeq).toSeq == Seq(Seq(9L, "z")))
    // Unsupported codec types are rejected at createTable, not at runtime.
    intercept[IllegalArgumentException] {
      cat.createTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "bad"),
        StructType(Seq(StructField("d", DecimalType(10, 2)))), Array.empty,
        java.util.Collections.emptyMap[String, String]())
    }
    cat.dropTable(ident)

    // End to end through the declared op: catalog write + pruned read-back.
    val df = SparkEntry.queries("sink_dsv2_write")(s, d)
    val got = df.collect()
    assert(got.length == 5, s"one row per region expected: ${got.toSeq}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftMemScan"), s"read-back must go through the V2 scan:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("GraftMemScan"))
      .getOrElse(fail(s"no scan line:\n$plan"))
    assert(!readSchema.contains("n_nationkey"),
      s"unused column must be pruned from the read-back:\n$readSchema")
    // createOrReplace is idempotent — a re-run replaces, never duplicates.
    val again = SparkEntry.queries("sink_dsv2_write")(s, d).collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("catalog_v2_function: scalar dispatches via the MAGIC method; aggregate gets the partial/final split") {
    val df = SparkEntry.queries("catalog_v2_function")(s, d)
    val got = df.collect()
    assert(got.length == 5)
    val plan = df.queryExecution.executedPlan.toString
    // Magic-method dispatch: the plan carries a direct Invoke on the
    // function instance, not a row-boxed produceResult/UDF closure.
    assert(plan.contains("invoke(") && plan.contains("GraftTagFunction"),
      s"scalar function not on the magic Invoke path:\n$plan")
    // The V2 aggregate must distribute like a built-in: partial update
    // per partition, merge on the final side.
    assert(plan.contains("partial_v2aggregator"),
      s"V2 aggregate lost its partial (map-side) phase:\n$plan")
    assert(plan.split("partial_v2aggregator").head.contains("v2aggregator"),
      s"no final merge aggregate above the partial:\n$plan")
    // Independent truth: same arithmetic from range().
    val want = s.range(1000L, 41000L)
      .select(element_at(array(lit("a"), lit("b"), lit("c"), lit("d"), lit("e")),
        (col("id") % 5 + 1).cast("int")).as("tag2"),
        (col("id") % 100).as("bucket"))
      .groupBy("tag2")
      .agg(count(lit(1)).as("n"), sum(col("bucket") * col("bucket")).as("ssq"))
      .orderBy("tag2").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("scan_dsv2_metadata_cols: _slice hidden from star, joins the pruned read schema, equals bucket under the bucket layout") {
    val df = SparkEntry.queries("scan_dsv2_metadata_cols")(s, d)
    val got = df.collect()
    assert(got.length == 5 && got.forall(_.getLong(1) == 12000L),
      s"five 12000-id slices expected: ${got.toSeq}")
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema: struct<"))
      .getOrElse(fail(s"no ReadSchema in scan description:\n$plan"))
    assert(readSchema.contains("_slice"),
      s"requested metadata column must join the pruned read schema:\n$readSchema")
    // Hidden until asked for: SELECT * sees only the declared schema.
    val star = s.read.format("graft.sources.GraftRangeSource")
      .option("rows", 100L).load()
    assert(star.columns.toSeq == Seq("id", "bucket", "val", "tag"),
      s"metadata column leaked into the base schema: ${star.columns.toSeq}")
    // Under partitionBy=bucket the partition ordinal IS the bucket value.
    val mism = s.read.format("graft.sources.GraftRangeSource")
      .option("rows", 1000L).option("partitionBy", "bucket").load()
      .select(col("_slice"), col("bucket"))
      .filter(col("_slice") =!= col("bucket")).count()
    assert(mism == 0L, s"bucket-layout _slice diverged from bucket on $mism rows")
  }

  test("stream_dsv2_sink: epoch commits are exactly-once — a re-delivered epoch is a whole-batch no-op") {
    import graft.sources._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val schema = StructType(Seq(StructField("k", LongType)))
    val key = "t11cat.epochs"
    GraftMemStore.drop(key)
    GraftMemStore.create(key, schema)
    val sw = new GraftMemStreamingWrite(key, schema, queryId = "q1")
    def msg(v: Long) = {
      val w = new GraftMemWriterFactory(schema).createWriter(0, 0L)
      w.write(new GenericInternalRow(Array[Any](v)))
      w.commit()
    }
    sw.commit(0L, Array(msg(10L)))
    sw.commit(1L, Array(msg(20L)))
    assert(GraftMemStore.rows(key).map(_.head).toSeq == Seq(10L, 20L))
    // Crash-replay of epoch 1 (same id, possibly different task output):
    // the committed-epoch ledger must swallow it whole.
    sw.commit(1L, Array(msg(999L)))
    assert(GraftMemStore.rows(key).map(_.head).toSeq == Seq(10L, 20L),
      "re-delivered epoch was applied twice")
    // Abort publishes nothing and does not burn the epoch id.
    sw.abort(2L, Array(msg(30L)))
    assert(GraftMemStore.rows(key).map(_.head).toSeq == Seq(10L, 20L))
    sw.commit(2L, Array(msg(30L)))
    assert(GraftMemStore.rows(key).map(_.head).toSeq == Seq(10L, 20L, 30L),
      "an aborted epoch id must remain committable")
    // A SECOND query appending to the same table restarts epoch ids at 0;
    // the ledger is (query, epoch)-scoped, so its batches must APPLY, not
    // be swallowed as replays of q1's epochs (r11 review finding).
    val sw2 = new GraftMemStreamingWrite(key, schema, queryId = "q2")
    sw2.commit(0L, Array(msg(40L)))
    assert(GraftMemStore.rows(key).map(_.head).toSeq == Seq(10L, 20L, 30L, 40L),
      "a new query's epoch 0 was mistaken for the old query's replay")
    // Complete-output-mode shape: truncate-per-epoch REPLACES contents
    // each epoch (full-state semantics), replay still swallowed.
    val swC = new GraftMemStreamingWrite(key, schema, queryId = "q3",
      truncateEachEpoch = true)
    swC.commit(0L, Array(msg(100L)))
    swC.commit(1L, Array(msg(200L)))
    swC.commit(1L, Array(msg(999L)))
    assert(GraftMemStore.rows(key).map(_.head).toSeq == Seq(200L),
      "complete-mode epoch must replace, and its replay must be a no-op")
    GraftMemStore.drop(key)

    // End to end: the declared op's multi-epoch stream must equal the
    // direct batch census (no epoch lost, none duplicated).
    val got = SparkEntry.queries("stream_dsv2_sink")(s, d).collect()
    val want = Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(Norm.money(col("value"))).as("sum_cents"))
      .orderBy("event_type").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("streaming Complete mode through the V2 sink: each epoch REPLACES the table (truncate reaches StreamingWrite)") {
    // The real-engine twin of the unit-level truncate-per-epoch check: a
    // Complete-output-mode aggregation calls WriteBuilder.truncate()
    // before toStreaming, and every epoch must publish the FULL current
    // state in place of the previous epoch's — append here would
    // duplicate each group once per micro-batch (the r11 review finding).
    val sp = s.newSession(); import sp.implicits._
    implicit val ctx = sp.sqlContext
    sp.conf.set("spark.sql.catalog.graftmem", "graft.sources.GraftMemCatalog")
    sp.sql("DROP TABLE IF EXISTS graftmem.cmp_mode")
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft_cmp_mode_ck"
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(sp.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("v", "g")
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .toTable("graftmem.cmp_mode")
    try {
      mem.addData((1L, "a"), (2L, "a"), (3L, "b"))
      q.processAllAvailable()
      val e1 = sp.table("graftmem.cmp_mode").orderBy("g").collect().map(_.toString).toSeq
      assert(e1 == Seq("[a,2,3]", "[b,1,3]"), s"epoch 1 state wrong: $e1")
      mem.addData((4L, "b"), (5L, "c"))
      q.processAllAvailable()
      // Replaced, not appended: one row per group with TOTAL counts.
      val e2 = sp.table("graftmem.cmp_mode").orderBy("g").collect().map(_.toString).toSeq
      assert(e2 == Seq("[a,2,3]", "[b,2,7]", "[c,1,5]"),
        s"epoch 2 must replace epoch 1's full state, got: $e2")
    } finally q.stop()
    sp.sql("DROP TABLE IF EXISTS graftmem.cmp_mode")
  }

  test("RangeJoin: two consumers of one build side share ONE BroadcastExchange in the final plan") {
    // r10 verdict #3: the exec declares BroadcastDistribution, so exchange
    // reuse must actually engage when the same build side feeds two range
    // joins — one materialized exchange, the second consumer reading it as
    // a reused exchange/stage.
    val bands = s.range(0, 40).select(col("id").as("band_id"),
      (lit(90000L) + col("id") * 250L).as("lo"),
      (lit(90500L) + col("id") * 250L).as("hi"))
    val probeA = Tables.part(s, d).select(Norm.money(col("p_retailprice")).as("cents"))
    val probeB = probeA.withColumn("cents", col("cents") + lit(100L))
    val u = graft.plans.GraftRangeJoin(probeA, bands, "cents", "lo", "hi")
      .select(col("band_id"), col("cents"))
      .unionAll(graft.plans.GraftRangeJoin(probeB, bands, "cents", "lo", "hi")
        .select(col("band_id"), col("cents")))
    assert(u.collect().nonEmpty)
    // Count MATERIALIZED exchanges in the FINAL adaptive plan only: the
    // adaptive toString appends the pre-AQE "Initial Plan" section, and a
    // ReusedExchange line itself names the exchange it points at — both
    // would inflate a naive substring count.
    val plan = u.queryExecution.executedPlan.toString
    val finalSec = plan.split("== Initial Plan ==")(0)
    val materialized = finalSec.linesIterator
      .filter(l => l.contains("BroadcastExchange") && !l.contains("ReusedExchange")).size
    assert(materialized == 1,
      s"expected exactly ONE materialized BroadcastExchange in the final plan, got $materialized:\n$plan")
    assert(finalSec.contains("ReusedExchange"),
      s"second consumer did not reuse the broadcast:\n$plan")
    assert(finalSec.contains("BroadcastRangeJoin"), s"custom exec missing:\n$plan")
    assert(finalSec.contains("isFinalPlan=true") || plan.contains("isFinalPlan=true"))
  }

  test("RangeJoin: reused broadcast with DIFFERENT lo/hi bindings gets per-binding indexes") {
    // r10 ADVICE (medium): with the cache keyed by broadcast id alone, the
    // second consumer of a REUSED exchange binding different lo/hi columns
    // would silently read the first consumer's index (sorted by the wrong
    // column, wrong maxLen). The key now includes the canonicalized bound
    // expressions — both joins below share one broadcast but must each
    // build their own index. Family 2's intervals are DESCENDING in
    // band_id and have a different width, so a cross-served index yields
    // visibly wrong rows.
    val bands = s.range(0, 50).select(col("id").as("band_id"),
      (lit(100L) + col("id") * 10L).as("lo1"),
      (lit(107L) + col("id") * 10L).as("hi1"),
      (lit(1000L) - col("id") * 10L).as("lo2"),
      (lit(1003L) - col("id") * 10L).as("hi2"))
    val probe = s.range(0, 1200).select(col("id").as("k"))
    // Both branches must reference ALL build columns: otherwise column
    // pruning keeps only each join's own lo/hi pair under the exchange,
    // the two exchanges stop being canonically equal, and reuse (the
    // scenario under test) never engages. The chk column pins all four.
    val chk = (col("lo1") + col("hi1") + col("lo2") + col("hi2")).as("chk")
    val j1 = graft.plans.GraftRangeJoin(probe, bands, "k", "lo1", "hi1")
      .select(col("k"), col("band_id"), lit(1L).as("fam"), chk)
    val j2 = graft.plans.GraftRangeJoin(probe, bands, "k", "lo2", "hi2")
      .select(col("k"), col("band_id"), lit(2L).as("fam"), chk)
    val u = j1.unionAll(j2)
    val got = u.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // The scenario only bites when the exchange is actually shared — pin it.
    val plan = u.queryExecution.executedPlan.toString
    val finalSec = plan.split("== Initial Plan ==")(0)
    val materialized = finalSec.linesIterator
      .filter(l => l.contains("BroadcastExchange") && !l.contains("ReusedExchange")).size
    assert(materialized == 1 && finalSec.contains("ReusedExchange"),
      s"build side not shared — test would not exercise the cache key:\n$plan")
    // Brute-force truth from the same frames.
    val want1 = probe.crossJoin(bands)
      .filter(col("k") >= col("lo1") && col("k") < col("hi1"))
      .select(col("k"), col("band_id"), lit(1L).as("fam"))
    val want2 = probe.crossJoin(bands)
      .filter(col("k") >= col("lo2") && col("k") < col("hi2"))
      .select(col("k"), col("band_id"), lit(2L).as("fam"))
    val want = want1.unionAll(want2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"per-binding indexes diverged from nested-loop truth: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.count(_._3 == 1L) > 0 && got.count(_._3 == 2L) > 0)
  }
}
