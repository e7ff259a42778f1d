package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 surface: the agg_product bounded-domain rewrite, the
  * join_multiway ASIA pushdown + gated supplier broadcast, the
  * dimBroadcast size gate, and the interned-gram LSH verify
  * (IntersectSizeLong). */
class Round13Suite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  // ------------------------------------------------------ agg_product

  test("agg_product plans a pure codegen HashAggregate — no ObjectHashAggregate, no collect_list") {
    val qe = SparkEntry.queries("agg_product")(s, d).queryExecution
    val p = qe.executedPlan.toString()
    assert(p.contains("HashAggregate"), "expected hash aggregation")
    assert(!p.contains("ObjectHashAggregate"),
      "the r12 sf100 cliff WAS the ObjectHashAggregate sort-fallback — the " +
        "bounded-domain counter rewrite must not reintroduce it:\n" + p.take(1500))
    assert(!qe.optimizedPlan.toString().contains("collect_list"),
      "no per-group array buffer may survive the rewrite")
  }

  test("agg_product: exponent-counter product equals the direct per-group fold") {
    // independent truth: fold the actual line numbers per order
    val want = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(expr("aggregate(collect_list(CAST(l_linenumber AS BIGINT)), 1L, (acc, x) -> acc * x)")
        .as("line_product"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("agg_product")(s, d).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("line_product") == want(r.getLong(0)),
        s"product mismatch for order ${r.getLong(0)}")
    }
  }

  // ---------------------------------------------------- join_multiway

  test("join_multiway: ASIA restriction is semi-joined below the fact joins") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val qe = SparkEntry.queries("join_multiway")(s, d).queryExecution
    // the analyzed plan must contain a LeftSemi join whose left side scans
    // customer — the explicit pushdown Catalyst cannot infer transitively
    val semis = qe.analyzed.collect {
      case j: LJoin if j.joinType.sql == "LEFT SEMI" => j
    }
    assert(semis.nonEmpty, "expected the explicit ASIA left-semi filter on customer")
    // and the supplier leg's broadcast hint flows through the size gate
    import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, SubqueryAlias}
    val gatedHints = qe.analyzed.collect {
      case ResolvedHint(SubqueryAlias(id, _), _) if id.name == graft.Scale.BroadcastGateTag => 1
    }
    assert(gatedHints.nonEmpty, "supplier broadcast must carry the gate tag")
  }

  // ------------------------------------------------------ dimBroadcast

  test("dimBroadcast: hints under the cap (tagged), drops the hint above it") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val dim = Tables.supplier(s, d)
    val under = graft.ops.Joins.dimBroadcast(dim, 1L << 20)
    assert(under.queryExecution.analyzed.collect { case h: ResolvedHint => h }.nonEmpty,
      "a 1 MiB dim must be hinted")
    val over = graft.ops.Joins.dimBroadcast(dim, 1L << 40)
    assert(over.queryExecution.analyzed.collect { case h: ResolvedHint => h }.isEmpty,
      "a 1 TiB dim must NOT be hinted — the shuffle join is the safe path")
  }

  // ------------------------------------------------ IntersectSizeLong

  test("intersect_size_long: sorted merge, unsorted fallback, and dup semantics match size(array_intersect)") {
    // built over a range() leaf (not VALUES) so ConvertToLocalRelation
    // cannot fold the whole projection away before the rewrite is visible
    val df = s.range(0, 5).select(col("id"),
      expr("""CASE CAST(id AS INT)
              WHEN 0 THEN array(1L, 3L, 5L, 9L)
              WHEN 1 THEN array(5L, 1L, 3L)
              WHEN 2 THEN array(2L, 2L, 4L)
              WHEN 3 THEN slice(array(0L), 1, 0)
              ELSE array(7L) END""").as("a"),
      expr("""CASE CAST(id AS INT)
              WHEN 0 THEN array(3L, 9L, 11L)
              WHEN 1 THEN array(3L, 3L, 1L)
              WHEN 2 THEN array(2L, 4L, 4L)
              WHEN 3 THEN array(1L)
              ELSE slice(array(0L), 1, 0) END""").as("b"))
    val q = df.select(col("id"), size(array_intersect(col("a"), col("b"))).as("n"))
    val got = q.orderBy("id").collect().map(_.getInt(1))
    assert(got.toSeq == Seq(2, 2, 2, 0, 0))
    // and the injected rule actually rewrote it (no ArrayIntersect survives)
    val p = q.queryExecution.optimizedPlan.toString()
    assert(p.contains("intersect_size_long"),
      s"rule must fire on array<bigint>: $p")
  }

  // ----------------------------------------- sink_v2_distribution

  test("sink_v2_distribution: engine-planned layout reaches the writers (sorted, disjoint clusters)") {
    import graft.sources.GraftMemWriteAudit
    val res = SparkEntry.queries("sink_v2_distribution")(s, d).collect()
    assert(res.length == 5, "five event types expected")
    val key = s"graftmem.evd_${Math.abs(d.hashCode)}"
    val parts = GraftMemWriteAudit.partitions(key)
    assert(parts.nonEmpty, s"no write audit recorded for $key")
    // per-partition ordering: every writer saw its rows ascending on cents
    parts.foreach { case (pid, p) =>
      assert(p.sorted, s"partition $pid received unsorted rows — the required ordering did not reach the write")
    }
    // clustering: no event_type may span two write partitions
    val nonEmpty = parts.filter(_._2.rows > 0)
    val keySets = nonEmpty.map { case (pid, p) =>
      pid -> p.clusterKeys.getOrElse(fail(s"partition $pid overflowed the cluster-key cap — 5 event types cannot"))
    }
    keySets.toSeq.combinations(2).foreach { case Seq((pa, ka), (pb, kb)) =>
      assert(ka.intersect(kb).isEmpty,
        s"cluster keys ${ka.intersect(kb)} appear in both partition $pa and $pb — clustered distribution violated")
    }
    // and all five types were written somewhere
    assert(keySets.values.flatten.toSet.size == 5, "all event types must be covered")
  }

  test("sink_v2_distribution: a table without layout properties takes the plain write path") {
    import graft.sources.GraftMemWriteAudit
    // sink_dsv2_write has no write.distribution/ordering props — its write
    // must not register an audit (the RequiresDistributionAndOrdering
    // branch is property-gated, not unconditional)
    SparkEntry.queries("sink_dsv2_write")(s, d).collect()
    val key = s"graftmem.nation_enriched_${Math.abs(d.hashCode)}"
    assert(GraftMemWriteAudit.partitions(key).isEmpty,
      "plain writes must not flow through the layout-audited path")
  }

  test("interned LSH pairs equal the string-verified pairs on real docs") {
    // the interning bijection cannot change the exact Jaccard verdicts:
    // run the LSH kernel (interned verify) against an independent
    // string-array verification of the same candidate semantics — full
    // all-pairs exact Jaccard at the same threshold, restricted to the
    // pairs either side found (LSH miss probability at J>=0.8 is 6.5e-15,
    // so the sets must be identical on this corpus).
    val toks = Tables.documents(s, d).select(col("doc_id"),
      sort_array(array_distinct(split(col("text"), " "))).as("toks"))
    val lsh = graft.ops.LlmPipeline.lshJaccardPairs(toks)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ta = toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val tb = toks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    val allPairs = ta.join(tb, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).as("inter"),
        (size(col("toks_a")) + size(col("toks_b"))).as("stot"))
      .filter(col("inter") * 5 >= (col("stot") - col("inter")) * 4)
      .select(col("doc_a"), col("doc_b"),
        expr("(CAST(inter AS BIGINT) * 10000) div (stot - inter)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lsh == allPairs,
      s"interned LSH diverged from exact truth: lsh-only=${(lsh -- allPairs).take(3)} " +
        s"truth-only=${(allPairs -- lsh).take(3)}")
  }
}
