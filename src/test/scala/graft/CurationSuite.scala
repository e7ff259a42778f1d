package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.N subqueries + §2.O curation ops: decorrelation plan audits and the
  * semantic invariants the DuckDB oracle can't see (plan shapes, COUNT-bug
  * null→0, packing-offset conservation, two-phase == naive window).
  */
class CurationSuite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def physical(name: String): String =
    SparkEntry.queries(name)(s, d).queryExecution.executedPlan.toString()

  // --- §2.N decorrelation plan audits -----------------------------------

  test("sub_in decorrelates to a left semi join") {
    assert(physical("sub_in").contains("LeftSemi"), "IN should plan as semi join")
  }

  test("sub_not_exists decorrelates to a left anti join") {
    assert(physical("sub_not_exists").contains("LeftAnti"),
      "NOT EXISTS should plan as anti join")
  }

  test("sub_exists pushes the quantity predicate below the semi join") {
    val df = SparkEntry.queries("sub_exists")(s, d)
    val p = df.queryExecution.executedPlan.toString() + "\n" + df.queryExecution.toString()
    assert(p.contains("LeftSemi"))
    // the qty filter must prune lineitem AT THE SCAN, not post-join: assert
    // on the scan's PushedFilters line, which a post-join Filter can't fake
    assert(p.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(l_quantity")),
      s"qty predicate not pushed to the lineitem scan:\n${p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")}")
  }

  test("sub_scalar_corr decorrelates: aggregate + outer join, no per-row subquery") {
    val p = physical("sub_scalar_corr")
    assert(p.contains("LeftOuter"), "correlated scalar agg should become an outer join")
    assert(!p.contains("CorrelatedScalarSubquery"),
      "correlated subquery survived to the physical plan")
  }

  test("sub_scalar_corr patches the COUNT bug: no-match orders read 0, not null") {
    val df = SparkEntry.queries("sub_scalar_corr")(s, d)
    assert(df.filter(col("n_big_items").isNull).count() == 0)
    // cross-check against the hand-lowered join on the same 200-order slice
    val expect = {
      import s.implicits._
      val li = Tables.lineitem(s, d).filter($"l_quantity" > 25)
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      Tables.orders(s, d).join(li, $"o_orderkey" === $"l_orderkey", "left")
        .select($"o_orderkey", coalesce($"n", lit(0L)).as("n_big_items"))
        .orderBy($"o_orderkey").limit(200)
    }
    assert(df.collect().toSeq == expect.collect().toSeq)
  }

  test("sub_cte_chain agrees with direct aggregation and stays one scan") {
    val df = SparkEntry.queries("sub_cte_chain")(s, d)
    val row = df.collect()(0)
    val per = Tables.orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val n = per.count()
    val mx = per.agg(max("n")).collect()(0).getLong(0)
    val mn = per.agg(min("n")).collect()(0).getLong(0)
    assert(row.getAs[Long]("max_orders") == mx)
    assert(row.getAs[Long]("min_orders") == mn)
    assert(row.getAs[Long]("n_cust") == n)
    // the chained-CTE shape must collapse to a single scan of orders —
    // the multi-referenced-CTE variant re-planned it 4× (see Subqueries).
    // After execution AQE's toString appends an "== Initial Plan ==" copy;
    // count scans only in the final-plan section.
    val scans = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 orders scan, saw $scans")
  }

  test("sub_lateral lowers the per-order LIMIT to WindowGroupLimit top-k, not a loop") {
    val p = physical("sub_lateral")
    assert(p.contains("WindowGroupLimit"),
      s"per-group LIMIT should prune via WindowGroupLimit:\n${p.take(1500)}")
    assert(!p.contains("CorrelatedScalarSubquery"))
    // spot-check: every order contributes at most 2 rows
    val over = SparkEntry.queries("sub_lateral")(s, d)
      .groupBy("o_orderkey").count().filter(col("count") > 2).count()
    assert(over == 0, "an order contributed more than 2 lateral rows")
  }

  test("join_band_bucketed plans a bucket equi-join, never a nested-loop product") {
    val p = physical("join_band_bucketed")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"pure range band fell back to a product join:\n${p.take(1500)}")
  }

  // --- §2.O curation invariants -----------------------------------------

  test("llm_quality_repetition: bp bounds and dup==0 ⟺ every word unique") {
    val rows = SparkEntry.queries("llm_quality_repetition")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, dup, top) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("dup_word_bp"), r.getAs[Long]("top_word_bp"))
      assert(dup >= 0 && dup < 10000, s"dup_word_bp out of range: $r")
      // lower bound is the single-occurrence floor 10000 div n_words, which
      // legitimately rounds to 0 once a doc passes 10k words
      assert(top >= 10000 / nw && top <= 10000, s"top_word_bp out of range: $r")
      // all-unique doc: top word appears once → the two measures must agree
      if (dup == 0) assert(top == 10000 / nw, s"dup/top disagree on unique doc: $r")
    }
  }

  test("llm_contamination: benchmark slice excluded, shared ≤ total, flag is 0/1") {
    val rows = SparkEntry.queries("llm_contamination")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 20 != 0, s"benchmark doc in corpus: $r")
      val (tot, sh, fl) = (r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("contaminated"))
      assert(sh >= 0 && sh <= tot, s"n_shared out of range: $r")
      assert(fl == (if (sh > 0) 1L else 0L), s"flag inconsistent: $r")
    }
  }

  test("llm_domain_mix: en keeps everything, rates bound the kept counts") {
    val rows = SparkEntry.queries("llm_domain_mix")(s, d).collect()
    val byLang = rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))).toMap
    assert(byLang.keySet == Set("de", "en", "es", "fr", "zh"))
    val (enTot, enKept) = byLang("en")
    assert(enKept == enTot, "rate-100 language must keep every doc")
    byLang.foreach { case (lang, (tot, kept)) =>
      assert(kept <= tot, s"$lang kept > total")
    }
  }

  test("llm_pack_sequences: contiguous token spans that tile the corpus") {
    val rows = SparkEntry.queries("llm_pack_sequences")(s, d).collect()
    // reconstruct offsets: spans must be contiguous in doc_id order and the
    // seq ids must match a running offset from zero
    var off = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("first_seq") == off / 512, s"first_seq wrong at $r")
      assert(r.getAs[Long]("last_seq") == (off + n - 1) / 512, s"last_seq wrong at $r")
      off += n
    }
    assert(off > 0)
  }

  test("llm_pack_greedy: bins respect the budget and are greedily tight") {
    val rows = SparkEntry.queries("llm_pack_greedy")(s, d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"), r.getAs[Long]("bin_id")))
    assert(rows.nonEmpty)
    // docs stay whole and in doc_id order within namespaced bins
    val byBin = rows.groupBy(_._3)
    byBin.foreach { case (bin, ds) =>
      val fill = ds.map(_._2).sum
      assert(fill <= 512 || ds.length == 1, s"bin $bin over budget with ${ds.length} docs: $fill")
    }
    // greedy tightness: the first doc of bin k+1 would NOT have fit in bin k
    rows.groupBy(_._3 / 1000).foreach { case (bkt, ds) =>
      val bins = ds.groupBy(_._3).toSeq.sortBy(_._1)
      bins.sliding(2).foreach {
        case Seq((_, prev), (_, next)) =>
          val prevFill = prev.map(_._2).sum
          val firstNext = next.minBy(_._1)._2
          assert(prevFill + firstNext > 512,
            s"bucket $bkt: doc of ${firstNext} tokens should have joined the previous bin (fill $prevFill)")
        case _ =>
      }
    }
  }

  test("llm_pack_sequences two-phase offsets equal the naive global window") {
    val naive = Tables.documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("off", coalesce(sum("n_tokens").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("off div 512").as("first_seq"),
        expr("(off + n_tokens - 1) div 512").as("last_seq"))
      .orderBy("doc_id")
    val got = SparkEntry.queries("llm_pack_sequences")(s, d)
    assert(got.collect().toSeq == naive.collect().toSeq)
  }

  test("llm_contamination probes membership via broadcast (no corpus-sized shuffle join)") {
    val p = physical("llm_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram set should broadcast:\n${p.take(1500)}")
  }
}
