package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 rework equivalences: the similarity trio's shuffle-shedding
  * kernels (bounded-heap top-k, in-cogroup k-NN, prefix+Cauchy–Schwarz
  * pair pruning) must produce EXACTLY the frame the naive window/unpruned
  * forms produce — the naive form stays in the test as the executable
  * semantic definition, as in Round7Suite.
  */
class Round8Suite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def assertSameFrame(got: DataFrame, want: DataFrame, hint: String): Unit = {
    val extra = got.exceptAll(want).count()
    val missing = want.exceptAll(got).count()
    assert(extra == 0 && missing == 0,
      s"$hint: +$extra unexpected / -$missing missing rows")
  }

  private def vecs: DataFrame = graft.ops.Shared.vecs(s, d)

  test("llm_sim_topk (bounded-heap agg) == row_number window form") {
    val scored = graft.ops.SimKernel.scoreAgainstQueries(
      s, vecs, vecs.filter(col("vec_id") < 10))
    val naive = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vid"), graft.Norm.d4(col("cos")).as("cosine"),
        col("rank"))
    val got = SparkEntry.queries("llm_sim_topk")(s, d)
    assertSameFrame(got, naive, "topk agg vs window")
  }

  test("llm_sim_knn (in-cogroup local top-k) == all-pairs window form") {
    val half = graft.ops.SimKernel.cosinePairs(s, vecs, -2.0)
    val both = half.select(col("vid_a").as("src"), col("vid_b").as("dst"), col("cos"))
      .union(half.select(col("vid_b").as("src"), col("vid_a").as("dst"), col("cos")))
    val naive = both.withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
      .filter(col("rank") <= 3)
      .select(col("src"), col("dst"), graft.Norm.d4(col("cos")).as("cosine"),
        col("rank"))
    val got = SparkEntry.queries("llm_sim_knn")(s, d)
    assertSameFrame(got, naive, "knn kernel vs window")
  }

  test("cosinePairs prefix-CS pruning changes nothing vs a brute-force join") {
    // brute force: every ordered pair through the codegen graft_dot
    val a = vecs.select(col("vec_id").as("vid_a"), col("v").as("va"), col("nrm").as("na"))
    val b = vecs.select(col("vec_id").as("vid_b"), col("v").as("vb"), col("nrm").as("nb"))
    val naive = a.join(b, col("vid_a") < col("vid_b"))
      .select(col("vid_a"), col("vid_b"),
        (expr("graft_dot(va, vb)") / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= 0.35)
    val got = graft.ops.SimKernel.cosinePairs(s, vecs, 0.35)
    assertSameFrame(got, naive, "pruned pairs vs brute force")
  }

  test("cosinePairs pruning actually engages (>=25% of pair visits skip the suffix)") {
    // the kernel directly, NOT the declared op: the op's orderBy adds a
    // range-partitioner sampling pass that executes the kernel twice and
    // doubles the counters
    val (df, (nEval, nPruned)) = graft.ops.SimKernel.cosinePairsCounted(s, vecs, 0.5)
    df.collect()
    val total = nEval.value + nPruned.value
    val n = vecs.count()
    // lower bound only, and ratio-based pruning floor: task retries /
    // speculative re-execution inflate BOTH counters proportionally, so an
    // exact == C(n,2) check would fail spuriously under any retry (r8
    // advice). Pair-coverage exactness is pinned separately by
    // PropertySuite's blockAllPairs sweep.
    assert(total >= n * (n - 1) / 2,
      s"pair visits $total < C($n,2) — the block kernel lost pairs")
    assert(nPruned.value * 4 >= total,
      s"pruning collapsed: ${nPruned.value} of $total visits pruned (floor 25%) — " +
        "if the corpus stopped being isotropic, revisit prefixDims")
  }

  test("knnExact's shuffle stage emits <= n*(blocks+1)*k rows, far below n^2") {
    val (kernel, counter) = graft.ops.SimKernel.knnExactCounted(s, vecs, 3)
    kernel.collect()
    val n = vecs.count()
    val bound = n * (16 + 1) * 3 // blocks = 16 default
    assert(counter.value > 0 && counter.value <= bound,
      s"local top-k stage emitted ${counter.value} rows (bound $bound)")
    assert(counter.value * 4 <= n * n,
      s"shuffle volume ${counter.value} not clearly below n^2 = ${n * n}")
  }

  test("scan_cbo_stats: ANALYZE'd column stats flip a filtered dim to broadcast under CBO") {
    SparkEntry.queries("scan_cbo_stats")(s, d).collect() // creates + ANALYZEs the table
    val tbl = s"graft_cbo_nation_${Math.abs(d.hashCode)}"
    val noStats = tbl + "_nostats"
    s.sql(s"DROP TABLE IF EXISTS $noStats")
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(noStats)))
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    Tables.nation(s, d).write.mode("overwrite").format("parquet").saveAsTable(noStats)
    val conf = s.conf
    val oldCbo = conf.get("spark.sql.cbo.enabled", "false")
    val oldThr = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.cbo.enabled", "true")
      // between the CBO estimate of the filtered analyzed dim (~3 rows ·
      // row width ≈ 10² B) and the file-size fallback of the twin (kB-scale)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      // the catalog rowCount must reach the optimizer's stats visitor
      val rc = s.table(tbl).queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(25)), s"catalog rowCount not visible to CBO: $rc")
      def planFor(t: String): String =
        Tables.supplier(s, d)
          .join(s.table(t).filter(col("n_nationkey") < 3),
            col("s_nationkey") === col("n_nationkey"))
          .queryExecution.executedPlan.toString
      assert(planFor(tbl).contains("BroadcastHashJoin"),
        "with column stats the 3-row filtered dim must broadcast")
      assert(!planFor(noStats).contains("BroadcastHashJoin"),
        "without stats the same join must stay non-broadcast at this threshold " +
          "(if this fires, the file-size fallback shrank below 1 KB — retune)")
    } finally {
      conf.set("spark.sql.cbo.enabled", oldCbo)
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThr)
      s.sql(s"DROP TABLE IF EXISTS $noStats")
    }
  }

  test("CBO join reorder: stats move the tiny filtered dim ahead of the big dim") {
    // A deliberately BAD syntactic order — fact ⋈ big dim ⋈ tiny filtered
    // dim — that a cost-based reorder should rewrite to join the selective
    // tiny dim first. All three sides are ANALYZE'd managed tables so the
    // optimizer has real rowCounts; with CBO + joinReorder off, the
    // syntactic order must survive (the control).
    def mkTable(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(name)))
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      df.write.format("parquet").saveAsTable(name)
      s.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    mkTable("graft_jr_fact", Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey")))
    mkTable("graft_jr_cust", Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey")))
    mkTable("graft_jr_nat", Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name")))
    val conf = s.conf
    val oldCbo = conf.get("spark.sql.cbo.enabled", "false")
    val oldJr = conf.get("spark.sql.cbo.joinReorder.enabled", "false")
    def leafOrder: Seq[String] = {
      val q = s.sql(
        """SELECT count(*) AS n FROM graft_jr_fact f
           JOIN graft_jr_cust c ON f.o_custkey = c.c_custkey
           JOIN graft_jr_nat n ON c.c_nationkey = n.n_nationkey
           WHERE n.n_name = 'CHINA'""")
      q.queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString).map { s0 =>
          Seq("fact", "cust", "nat").find(t => s0.contains(s"graft_jr_$t")).getOrElse("?")
        }
    }
    try {
      conf.set("spark.sql.cbo.enabled", "false")
      conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val syntactic = leafOrder
      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = leafOrder
      assert(syntactic == Seq("fact", "cust", "nat"),
        s"control lost the syntactic order: $syntactic")
      assert(reordered != syntactic,
        "stats-driven join reorder did not engage (order unchanged)")
    } finally {
      conf.set("spark.sql.cbo.enabled", oldCbo)
      conf.set("spark.sql.cbo.joinReorder.enabled", oldJr)
      Seq("graft_jr_fact", "graft_jr_cust", "graft_jr_nat")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("TopKBuf: (score desc, id asc) order, k cap, insertion-order invariance") {
    val items = Seq((0.5, 7L), (0.9, 3L), (0.5, 2L), (0.1, 9L), (0.9, 8L),
      (0.7, 1L), (0.5, 4L))
    val want = Seq((0.9, 3L), (0.9, 8L), (0.7, 1L)) // ties by id asc
    for (perm <- Seq(items, items.reverse, items.sortBy(_._2), items.sortBy(_._1))) {
      val buf = new graft.ops.TopKBuf(3)
      perm.foreach { case (sc, id) => buf.insert(sc, id) }
      assert(buf.toPairs.toSeq == want, s"order ${perm.take(3)}…")
    }
    // merge of disjoint partials == single-buffer insert of the union
    val b1 = new graft.ops.TopKBuf(3); val b2 = new graft.ops.TopKBuf(3)
    items.take(3).foreach { case (sc, id) => b1.insert(sc, id) }
    items.drop(3).foreach { case (sc, id) => b2.insert(sc, id) }
    assert(b1.mergeFrom(b2).toPairs.toSeq == want, "merge path")
    // fewer than k items: all emitted, ordered
    val small = new graft.ops.TopKBuf(5)
    small.insert(0.2, 5L); small.insert(0.8, 6L)
    assert(small.toPairs.toSeq == Seq((0.8, 6L), (0.2, 5L)))
  }
}
