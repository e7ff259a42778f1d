package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.4 — true Structured Streaming twins of the §2.I batch forms:
  * a MemoryStream drives the same operators and the final output must match
  * the batch computation; one test proves the watermark drops a late row.
  */
class StreamingSuite extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def ts(m: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("streaming tumbling-window counts == batch window counts") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val data = Seq(
      (ts("10:05"), "click", 1.0), (ts("10:15"), "view", 2.0),
      (ts("10:55"), "click", 3.0), (ts("11:05"), "click", 4.0),
      (ts("12:30"), "view", 5.0))
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(data: _*)
    val q = mem.toDF().toDF("ts", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = sp.table("tumbling_out")
      .select(col("w.start"), col("event_type"), col("n"), col("sv"))
      .collect().map(_.toString).sorted.toSeq
    val batch = data.toDF("ts", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("w.start"), col("event_type"), col("n"), col("sv"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("stream-static enrich twin: broadcast dim join in a stream == batch join") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("k", "seg")
    val data = Seq(
      (ts("10:05"), 1L, 10.0), (ts("10:15"), 2L, 20.0),
      (ts("11:05"), 1L, 30.0), (ts("11:10"), 9L, 40.0)) // 9 has no dim row
    def enrich(df: org.apache.spark.sql.DataFrame) = df
      .join(broadcast(dim), col("uid") === col("k"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("seg"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("w.start"), col("seg"), col("n"), col("sv"))
    val mem = MemoryStream[(Timestamp, Long, Double)]
    mem.addData(data: _*)
    val q = enrich(mem.toDF().toDF("ts", "uid", "value"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = sp.table("enrich_out").collect().map(_.toString).sorted.toSeq
    val batch = enrich(data.toDF("ts", "uid", "value"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("watermark drops a row later than watermark - but keeps on-time rows") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = mem.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // Batch 1: two rows in [10:00, 11:00) and one far ahead that pushes the
      // watermark past 11:00 so the first window finalizes and emits.
      mem.addData((ts("10:05"), "click"), (ts("10:20"), "click"), (ts("13:00"), "view"))
      q.processAllAvailable()
      // Batch 2: a LATE row for the already-finalized window — must be dropped.
      mem.addData((ts("10:30"), "click"))
      q.processAllAvailable()
      // Push the watermark far enough to flush everything still open.
      mem.addData((ts("20:00"), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val out = sp.table("wm_out")
      .select(col("w.start").cast("string"), col("event_type"), col("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out.contains(("2024-01-01 10:00:00", "click", 2L)),
      s"late row was not dropped (or window missing): $out")
    assert(!out.contains(("2024-01-01 10:00:00", "click", 3L)))
  }

  test("streaming dropDuplicates == batch earliest-per-key") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val data = Seq((ts("10:00"), 1L), (ts("10:01"), 1L), (ts("10:02"), 2L), (ts("10:03"), 2L))
    val mem = MemoryStream[(Timestamp, Long)]
    mem.addData(data: _*)
    val q = mem.toDF().toDF("ts", "id").dropDuplicates("id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    assert(sp.table("dedup_out").count() == 2)
  }

  test("flatMapGroupsWithState accumulates custom per-key state across microbatches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[Double]) =>
          val total = state.getOption.getOrElse(0.0) + rows.map(_._2).sum
          state.update(total)
          Iterator((uid, total))
      }
      .toDF("uid", "running")
      .writeStream.format("memory").queryName("fmgws_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      mem.addData((1L, 2.0), (2L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val finalPerUid = sp.table("fmgws_out").groupBy("uid")
      .agg(max("running").as("r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(finalPerUid == Map(1L -> 17.0, 2L -> 4.0),
      s"state did not carry across batches: $finalPerUid")
  }

  test("foreachBatch sink: custom per-microbatch writer sees every batch") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("uid", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        seen.put(batchId, batch.count()); ()
      }
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, 1.0), (2L, 2.0)); q.processAllAvailable()
      mem.addData((3L, 3.0)); q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.values.sum == 3, s"foreachBatch missed rows: $seen")
    assert(seen.size() >= 2, "batches were not delivered separately")
  }

  test("stream_upsert_view twin: foreachBatch last-wins merge over disordered batches == batch op") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    // fixture rows for a handful of users, delivered in 3 microbatches that
    // are NOT in event-time order — the upsert must still converge on the
    // event-time-latest row per user, exactly like the declared batch op
    val rows = Tables.events(sp, TestSpark.sf).filter(col("user_id") < 6)
      .select(col("user_id"),
        date_trunc("second", col("ts")).cast("timestamp").as("ts_s"), // match the op's tsec order
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    assert(rows.length > 6)
    val shuffled = rows.sortBy(r => (r._3 * 2654435761L) % 1000003) // deterministic disorder
    val chunks = shuffled.grouped((shuffled.length + 2) / 3).toSeq
    // sink state: user -> (ts, event_id, type, lifetime count)
    val sink = new java.util.concurrent.ConcurrentHashMap[Long, (java.sql.Timestamp, Long, String, Long)]()
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = mem.toDF().toDF("user_id", "ts_s", "event_id", "event_type")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach { r =>
          val (u, t, id, et) = (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3))
          sink.compute(u, (_, cur) =>
            if (cur == null) (t, id, et, 1L)
            else if (t.after(cur._1) || (t.equals(cur._1) && id > cur._2))
              (t, id, et, cur._4 + 1L)
            else (cur._1, cur._2, cur._3, cur._4 + 1L))
        }; ()
      }
      .outputMode(OutputMode.Append()).start()
    try { chunks.foreach { c => mem.addData(c.toSeq: _*); q.processAllAvailable() } }
    finally q.stop()
    val batchOp = SparkEntry.queries("stream_upsert_view")(sp, TestSpark.sf)
      .filter(col("user_id") < 6)
      .select("user_id", "last_type", "n_events").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    import scala.jdk.CollectionConverters._
    val merged = sink.asScala.toSeq.map { case (u, (_, _, et, n)) => (u, et, n) }.sorted
    assert(merged == batchOp, s"foreachBatch upsert diverged:\n$merged\nvs\n$batchOp")
  }

  test("observe(): named metrics are collected during execution") {
    val sp = s
    import org.apache.spark.sql.functions._
    val df = Tables.orders(sp, TestSpark.sf)
      .observe("order_metrics", count(lit(1)).as("n"), sum("o_totalprice").as("total"))
      .filter(col("o_totalprice") > 0)
    df.collect()
    val metrics = df.queryExecution.observedMetrics("order_metrics")
    assert(metrics.getAs[Long]("n") == Tables.orders(sp, TestSpark.sf).count())
    assert(metrics.getAs[Double]("total") > 0)
  }

  test("stream_file_source twin: readStream over the op's drop dir + mid-stream restart == batch op") {
    val d = TestSpark.sf
    // the declared op writes the JSON drop directory AND computes the batch
    // form — the streaming twin must converge to exactly that frame
    val batch = SparkEntry.queries("stream_file_source")(s, d)
    val expected = batch.collect().map(_.toSeq).toSet
    val opDir = s"${System.getProperty("java.io.tmpdir")}/graft_filesrc_op${Math.abs(d.hashCode)}"
    // stage the op's drop files into the watched dir INCREMENTALLY so the
    // restart deterministically has unconsumed work (stop-timing-free)
    val dir = java.nio.file.Files.createTempDirectory("graft_filesrc_stage").toString
    val parts = new java.io.File(opDir).listFiles((_, n) => n.endsWith(".json"))
      .sortBy(_.getName)
    assert(parts.length >= 2, s"need >=2 drop files to split across runs, got ${parts.length}")
    def stage(fs: Array[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(dir, f.getName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val chk = java.nio.file.Files.createTempDirectory("graft_filesrc_chk").toString
    val qname = "filesrc_op_twin"
    def query() = s.readStream
      .schema("event_id LONG, epoch_s LONG, event_type STRING, cents LONG")
      .option("maxFilesPerTrigger", "1") // several triggers, not one gulp
      .json(dir)
      .select(expr("CAST(timestamp_seconds(epoch_s) AS TIMESTAMP_NTZ)").as("ts_s"),
        col("event_type"), col("cents"))
      .groupBy(window(col("ts_s"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_cents"))
      .writeStream.format("memory").queryName(qname)
      .option("checkpointLocation", chk)
      .outputMode(OutputMode.Complete()).start()
    // run 1: only the first file is visible; its batches commit, then stop
    stage(parts.take(1))
    val q1 = query()
    try {
      q1.processAllAvailable()
      assert(s.table(qname).count() > 0, "run 1 committed nothing")
    } finally q1.stop()
    // run 2: the remaining files arrive; a NEW query restarts from the
    // checkpoint and must fold them into the RESTORED state exactly once —
    // Complete mode re-emits the full aggregate
    stage(parts.drop(1))
    val q2 = query()
    try {
      q2.processAllAvailable()
      val got = s.table(qname).collect().map(_.toSeq).toSet
      assert(got == expected,
        s"streamed file-source result diverged from the batch op: " +
          s"+${(got -- expected).take(3)} -${(expected -- got).take(3)}")
    } finally q2.stop()
  }

  test("file-source streaming: readStream discovers files incrementally") {
    import java.nio.file.Files
    val sp = s; import sp.implicits._
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val batch1 = Seq((1L, "click"), (2L, "view")).toDF("event_id", "event_type")
    batch1.write.mode("append").parquet(dir)
    val q = sp.readStream.schema("event_id LONG, event_type STRING").parquet(dir)
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("filesrc_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val c1 = sp.table("filesrc_out").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(c1 == Map("click" -> 1L, "view" -> 1L))
      // drop two more files into the directory — the source must pick them up
      Seq((3L, "click"), (4L, "click")).toDF("event_id", "event_type")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val c2 = sp.table("filesrc_out").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(c2 == Map("click" -> 3L, "view" -> 1L), s"incremental files not picked up: $c2")
    } finally q.stop()
  }

  test("checkpoint restart: windowed-agg state survives stop + new query from same checkpoint") {
    import java.nio.file.Files
    val sp = s; import sp.implicits._
    val in = Files.createTempDirectory("graft_ckpt_in").toString
    val chk = Files.createTempDirectory("graft_ckpt_chk").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    def query() = sp.readStream.schema("ts TIMESTAMP, event_type STRING").parquet(in)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .count()
      .select(col("w.start").as("wstart"), col("event_type"), col("count"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk)
      .outputMode(OutputMode.Append()).start()
    // Run 1: the 11:10 row advances the watermark to 11:00, which closes the
    // 10:00 window (emitted) but leaves the 11:00 window OPEN in state.
    Seq((ts("10:05"), "click"), (ts("10:20"), "click"), (ts("11:10"), "view"))
      .toDF("ts", "event_type").write.mode("append").parquet(in)
    val q1 = query()
    try q1.processAllAvailable() finally q1.stop()
    def outRows() = sp.read.schema("wstart TIMESTAMP, event_type STRING, count LONG")
      .parquet(out).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val afterRun1 = outRows()
    assert(afterRun1 == Set((Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L)),
      s"run 1 should emit only the closed 10:00 window: $afterRun1")
    // Run 2: a NEW query object restarts from the same checkpoint; a 13:00
    // row advances the watermark past 11:00, so the open window's count —
    // restored from checkpointed state, its source batch already committed —
    // finalizes. If state did not survive the restart, the view count would
    // be missing (its input file is in an already-processed batch).
    Seq((ts("13:00"), "view")).toDF("ts", "event_type")
      .write.mode("append").parquet(in)
    val q2 = query()
    try q2.processAllAvailable() finally q2.stop()
    val finalized = outRows()
    assert(finalized == Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 2L),
      (Timestamp.valueOf("2024-01-01 11:00:00"), "view", 1L)),
      s"restored-state finalization diverged: $finalized")
  }

  test("transformWithState: ValueState running count per key (Spark 4 state API)") {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
    class CountProc extends StatefulProcessor[Long, (Long, Double), (Long, Long)] {
      @transient private var st: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                                   tv: TimerValues): Iterator[(Long, Long)] = {
        val c = (if (st.exists()) st.get() else 0L) + rows.size
        st.update(c)
        Iterator((key, c))
      }
    }
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    // transformWithState requires the RocksDB state store provider
    sp.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double)]
      val q = mem.toDS().groupByKey(_._1)
        .transformWithState(new CountProc, TimeMode.None(), OutputMode.Update())
        .toDF("uid", "cnt")
        .writeStream.format("memory").queryName("tws_out")
        .outputMode(OutputMode.Update()).start()
      try {
        mem.addData((1L, 1.0), (1L, 2.0), (2L, 3.0))
        q.processAllAvailable()
        mem.addData((1L, 4.0))
        q.processAllAvailable()
      } finally q.stop()
      val finalCnt = sp.table("tws_out").groupBy("uid").agg(max("cnt").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(finalCnt == Map(1L -> 3L, 2L -> 1L), s"state lost across batches: $finalCnt")
    } finally sp.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming session_window merges across microbatches") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val q = mem.toDF().toDF("ts", "uid")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("uid"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts("10:00"), 7L))
      q.processAllAvailable()
      mem.addData((ts("10:05"), 7L)) // within gap: must merge into one session
      q.processAllAvailable()
      mem.addData((ts("12:00"), 7L)) // advances watermark, closes the session
      q.processAllAvailable()
      mem.addData((ts("15:00"), 8L)) // flush
      q.processAllAvailable()
    } finally q.stop()
    val sessions = sp.table("sess_out")
      .select(col("w.start").cast("string"), col("w.end").cast("string"), col("uid"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(sessions.contains(("2024-01-01 10:00:00", "2024-01-01 10:15:00", 7L, 2L)),
      s"two events 5 min apart did not merge into one session: $sessions")
  }

  test("stream_flatmap_state twin: streaming fold over microbatches == declared batch op") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    // same accumulator + cents conversion as the declared operator
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val q = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[ops.Streaming.FmgsAcc, (Long, Long, Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Long, Timestamp, String, Double)],
         state: GroupState[ops.Streaming.FmgsAcc]) =>
          val sorted = rows.toArray.sortBy(r => (r._3.getTime, r._2))
          val init = state.getOption.getOrElse(ops.Streaming.FmgsAcc(0L, 0L, ""))
          val fin = sorted.foldLeft(init) { (a, r) =>
            ops.Streaming.FmgsAcc(a.n + 1, a.cents + ops.Streaming.cents(r._5), r._4)
          }
          state.update(fin)
          Iterator((uid, fin.n, fin.cents, fin.lastType))
      }
      .toDF("user_id", "n_events", "total_cents", "last_type")
      .writeStream.format("memory").queryName("fmgws_twin_out")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq(
      (7L, 1L, ts("10:00"), "view", 1.115),
      (7L, 2L, ts("10:05"), "click", 2.675),
      (8L, 3L, ts("10:01"), "view", 0.005),
      (7L, 4L, ts("10:10"), "purchase", 10.0),
      (8L, 5L, ts("10:20"), "error", 38.10))
    try {
      mem.addData(rows.take(3): _*) // first microbatch: earlier events
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*) // later events arrive in a second batch
      q.processAllAvailable()
    } finally q.stop()
    // final state per user = row with the max event count
    val streamed = sp.table("fmgws_twin_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed == Set((7L, 3L, 112L + 268L + 1000L, "purchase"),
                           (8L, 2L, 1L + 3810L, "error")),
      s"streaming final states diverged: $streamed")
  }

  test("stream-stream interval join twin: streaming matches == batch, late view dropped") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    // the declared stream_join_interval shape: clicks ⋈ views per user,
    // view within the 10 minutes before the click, both sides watermarked
    val clicks = MemoryStream[(Long, Long, Timestamp)] // (click_id, user_id, ts)
    val views = MemoryStream[(Long, Long, Timestamp)]  // (view_id, user_id, ts)
    val cDf = clicks.toDF().toDF("click_id", "user_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val vDf = views.toDF().toDF("view_id", "v_user", "view_ts")
      .withWatermark("view_ts", "10 minutes")
    val q = cDf.join(vDf,
        col("user_id") === col("v_user") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 10 MINUTES") &&
        col("view_ts") <= col("click_ts"))
      .select("click_id", "user_id", "view_id")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // on-time data: user 1 has two views in the lookback of click 100,
      // user 2's view is outside the window (25 min before the click)
      views.addData((10L, 1L, ts("10:00")), (11L, 1L, ts("10:07")),
        (12L, 2L, ts("10:00")))
      clicks.addData((100L, 1L, ts("10:09")), (200L, 2L, ts("10:25")))
      q.processAllAvailable()
      // advance both watermarks far past 11:00 so the 10:xx state is evicted
      views.addData((90L, 9L, ts("15:00")))
      clicks.addData((900L, 9L, ts("15:00")))
      q.processAllAvailable()
      // a LATE view that would have matched click 100 — must be dropped
      views.addData((13L, 1L, ts("10:08")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == Set((100L, 1L, 10L), (100L, 1L, 11L), (900L, 9L, 90L)),
      s"interval-join output diverged (late view joined, or window bound wrong): $streamed")
  }

  test("left-outer interval join twin: unmatched click emits null-padded ONLY after watermark") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val cDf = clicks.toDF().toDF("click_id", "user_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val vDf = views.toDF().toDF("view_id", "v_user", "view_ts")
      .withWatermark("view_ts", "10 minutes")
    val q = cDf.join(vDf,
        col("user_id") === col("v_user") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 10 MINUTES") &&
        col("view_ts") <= col("click_ts"), "left_outer")
      .select(col("click_id"), col("view_id"))
      .writeStream.format("memory").queryName("ssj_left_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // click 300 has no view in its lookback; click 100 matches view 10
      views.addData((10L, 1L, ts("10:00")))
      clicks.addData((100L, 1L, ts("10:05")), (300L, 2L, ts("10:05")))
      q.processAllAvailable()
      // BEFORE the watermark passes 10:05's join window, 300 must NOT be out
      val early = sp.table("ssj_left_out").collect().map(_.getLong(0)).toSet
      assert(!early.contains(300L),
        s"unmatched click emitted before the watermark closed its window: $early")
      // advance both watermarks far past the window → 300 emits null-padded
      views.addData((90L, 9L, ts("15:00")))
      clicks.addData((900L, 9L, ts("15:00")))
      q.processAllAvailable()
      val rows = sp.table("ssj_left_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((100L, 10L)), s"matched pair missing: $rows")
      assert(rows.contains((300L, -1L)), s"null-padded unmatched click missing: $rows")
    } finally q.stop()
  }

  test("stream_topk_windowed twin: rank over streamed window counts == batch op") {
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    val data = Seq(
      (ts("10:05"), "click"), (ts("10:10"), "click"), (ts("10:15"), "view"),
      (ts("10:20"), "view"), (ts("10:25"), "view"), (ts("10:30"), "error"),
      (ts("10:40"), "signup"), (ts("10:45"), "purchase"), // 5 types: one must fall out of top-3
      (ts("11:05"), "view"))
    val mem = MemoryStream[(Timestamp, String)]
    mem.addData(data: _*)
    // streaming stage: the watermarked windowed count (bounded state)
    val q = mem.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("topk_counts")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    // downstream rank over the closed windows (the op's second stage)
    val streamed = sp.table("topk_counts")
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("window_start").orderBy(col("n").desc, col("event_type"))))
      .filter(col("rnk") <= 3)
      .collect().map(_.toString).sorted.toSeq
    val batch = data.toDF("ts", "event_type")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("window_start").orderBy(col("n").desc, col("event_type"))))
      .filter(col("rnk") <= 3)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch && streamed.nonEmpty)
    // exactly 3 survivors in the 10:00 window (5 types competed)
    assert(streamed.count(_.contains("10:00")) == 3)
  }

  test("stream_cdc_upsert twin: LWW state over out-of-order, duplicate-delivered changelog batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    // rows: (k, nk, bal, op, seq). State per key = (nk, bal, deleted,
    // lastSeq); a row with seq <= lastSeq is a RE-DELIVERY and must be a
    // no-op — the idempotence the declared op's LWW window encodes.
    val mem = MemoryStream[(Long, Long, Long, String, Long)]
    val q = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[(Long, Long, Long, String, Long)],
         state: GroupState[(Long, Long, Boolean, Long)]) =>
          val sorted = rows.toArray.sortBy(_._5) // in-batch out-of-order repair
          val init = state.getOption.getOrElse((0L, 0L, false, Long.MinValue))
          val fin = sorted.foldLeft(init) { (st, r) =>
            if (r._5 <= st._4) st // duplicate / stale delivery: no-op
            else (r._2, r._3, r._4 == "D", r._5)
          }
          state.update(fin)
          Iterator((k, fin._1, fin._2, fin._3, fin._4))
      }
      .toDF("k", "nk", "bal", "deleted", "last_seq")
      .writeStream.format("memory").queryName("cdc_twin_out")
      .outputMode(OutputMode.Append()).start()
    // Keys 1,2 live; key 7 updated then deleted; key 3 updated. Batches
    // arrive with: an update BEFORE its insert inside one batch (in-batch
    // sort repairs), a cross-batch duplicate of an applied seq, and a
    // stale late insert after a delete (must not resurrect the key).
    try {
      mem.addData((1L, 10L, 100L, "I", 1L), (7L, 20L, 700L, "I", 1L),
        (3L, 10L, 300L, "U", 2L), (3L, 10L, 290L, "I", 1L)) // 3's U precedes its I
      q.processAllAvailable()
      mem.addData((2L, 20L, 200L, "I", 1L), (7L, 20L, 750L, "U", 2L),
        (3L, 10L, 300L, "U", 2L)) // duplicate of 3's applied seq 2
      q.processAllAvailable()
      mem.addData((7L, 20L, 0L, "D", 3L), (7L, 20L, 700L, "I", 1L)) // stale I after D
      q.processAllAvailable()
    } finally q.stop()
    // final state per key = the emission with the max last_seq
    val fin = sp.table("cdc_twin_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(col("last_seq").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(fin == Map(
      1L -> ((10L, 100L, false)),
      2L -> ((20L, 200L, false)),
      3L -> ((10L, 300L, false)), // LWW kept the seq-2 update, duplicate was a no-op
      7L -> ((20L, 0L, true))     // deleted; the stale insert did not resurrect it
    ), s"CDC state diverged: $fin")
    // The same census the DECLARED op reports, over this state.
    val live = fin.values.filterNot(_._3)
    assert(live.size == 3 && live.map(_._2).sum == 600L)
  }

  test("stream_idempotent_sink twin: kill + forced batch replay commits nothing twice (no dup, no loss)") {
    import java.nio.file.Files
    val sp = s
    val dir = Files.createTempDirectory("graft_idem_src").toString
    val sink = Files.createTempDirectory("graft_idem_sinkT").toString + "/sink"
    val chk = Files.createTempDirectory("graft_idem_chk").toString
    val src = Tables.events(sp, TestSpark.sf)
      .select(col("event_id"), col("event_type"), graft.Norm.money(col("value")).as("cents"))
    // wave 1 lands as 2 files → 2 microbatches under maxFilesPerTrigger=1
    src.filter(col("event_id") % 2 === 0).repartition(2)
      .write.mode("append").parquet(dir)
    val delivered = scala.collection.mutable.ListBuffer[Long]()
    def query() = sp.readStream
      .schema("event_id LONG, event_type STRING, cents LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        delivered.synchronized { delivered += id }
        graft.ops.Streaming.commitBatchIdempotent(b.toDF(), id, sink); ()
      }
      .option("checkpointLocation", chk)
      .outputMode(OutputMode.Append()).start()
    val q1 = query()
    try q1.processAllAvailable() finally q1.stop()
    val run1 = delivered.toList
    assert(run1.distinct.size >= 2, s"need >=2 microbatches in run 1, saw $run1")
    // THE KILL: crash between the sink commit and the checkpoint commit —
    // the sink's marker for the last batch is durable, but Spark's own
    // commit record is lost, so the restart genuinely RE-DELIVERS that
    // batch id with the same offsets (offsets/<n> present, commits/<n>
    // absent). Simulated exactly by deleting commits/<last>.
    val commitsDir = new java.io.File(chk, "commits")
    val last = commitsDir.listFiles().map(_.getName).filter(_.forall(_.isDigit))
      .map(_.toLong).max
    assert(new java.io.File(commitsDir, last.toString).delete(), "commit record delete failed")
    // the local-FS checkpoint is a ChecksumFileSystem: the stale .crc must
    // go too, or the replay's re-write of commits/<last> collides with it
    new java.io.File(commitsDir, s".$last.crc").delete()
    // wave 2 arrives while the job is down
    src.filter(col("event_id") % 2 === 1).repartition(2)
      .write.mode("append").parquet(dir)
    val q2 = query()
    try q2.processAllAvailable() finally q2.stop()
    // the replay really happened: batch id `last` was delivered twice...
    assert(delivered.count(_ == last) >= 2,
      s"restart did not replay batch $last (delivered: $delivered)")
    // ...but committed once: marker set has no duplicate to create, and the
    // census off the committed sink equals the full input exactly — the
    // replayed delivery added nothing (no dup) and wave 2 is all there (no
    // loss)
    def agg(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = agg(graft.ops.Streaming.readCommittedBatches(sp, sink))
    val want = agg(src)
    assert(got == want, s"sink census diverged after replay:\n got=$got\nwant=$want")
  }

  test("stream_state_timers twin: event-time timers close sessions exactly at watermark + 30 min") {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, StatefulProcessor,
      TTLConfig, TimeMode, TimerValues, ValueState}
    val GapMs = 30L * 60 * 1000
    // The real timer API the batch op models: per-user last-event ts +
    // event count as ValueState; every event re-arms the single
    // last_ts + 30 min timer (deleting the stale one); expiry EMITS the
    // closed session's event count and clears state.
    class SessionTimerProc extends StatefulProcessor[Long, (Long, Timestamp), (Long, Long)] {
      @transient private var lastTs: ValueState[Long] = _
      @transient private var nEv: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        lastTs = getHandle.getValueState[Long]("lastTs", Encoders.scalaLong, TTLConfig.NONE)
        nEv = getHandle.getValueState[Long]("nEv", Encoders.scalaLong, TTLConfig.NONE)
      }
      override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp)],
                                   tv: TimerValues): Iterator[(Long, Long)] = {
        val old = if (lastTs.exists()) Some(lastTs.get()) else None
        var mx = old.getOrElse(Long.MinValue)
        var c = if (nEv.exists()) nEv.get() else 0L
        rows.foreach { r => c += 1; mx = math.max(mx, r._2.getTime) }
        old.foreach(o => getHandle.deleteTimer(o + GapMs))
        getHandle.registerTimer(mx + GapMs)
        lastTs.update(mx); nEv.update(c)
        Iterator.empty
      }
      override def handleExpiredTimer(key: Long, tv: TimerValues,
                                      info: ExpiredTimerInfo): Iterator[(Long, Long)] = {
        val out = Iterator.single((key, if (nEv.exists()) nEv.get() else 0L))
        lastTs.clear(); nEv.clear()
        out
      }
    }
    val sp = s; import sp.implicits._
    implicit val ctx = sp.sqlContext
    sp.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp)]
      val q = mem.toDS().toDF("uid", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new SessionTimerProc, TimeMode.EventTime(), OutputMode.Update())
        .toDF("uid", "closed_events")
        .writeStream.format("memory").queryName("timer_out")
        .outputMode(OutputMode.Update()).start()
      try {
        // b1: two users open sessions; wm after b1 = 10:05 — nothing fires.
        mem.addData((1L, ts("10:00")), (2L, ts("10:05")))
        q.processAllAvailable()
        // b2: u1 extends its session (20-min gap re-arms the timer to
        // 10:50); u3 opens. wm after b2 = 12:00.
        mem.addData((1L, ts("10:20")), (3L, ts("12:00")))
        q.processAllAvailable()
        // b3 runs with wm = 12:00: u2's 10:35 timer and u1's re-armed
        // 10:50 timer fire — u1 must close with BOTH events (2), proving
        // the stale 10:30 timer really was deleted (had it fired, u1
        // would have closed early with 1). wm after b3 = 15:00.
        mem.addData((4L, ts("15:00")))
        q.processAllAvailable()
        // b4 runs with wm = 15:00: u3's 12:30 timer fires. The watermark
        // then advances to 20:00 and Spark runs its no-data microbatch,
        // firing u4's 15:30 timer too. u5 (timer 20:30 > wm 20:00) must
        // stay open — an open session never emits.
        mem.addData((5L, ts("20:00")))
        q.processAllAvailable()
      } finally q.stop()
      val closed = sp.table("timer_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(closed == Set((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)),
        s"timer emissions diverged from the declared semantics: $closed")
    } finally sp.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
