package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed golden values on sf0.001 (SURVEY §5.1). */
class GoldenSuite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(s, d)

  test("entry returns the 4+ pricing-summary groups") {
    val rows = SparkEntry.entry(s).collect()
    assert(rows.length >= 4 && rows.length <= 6)
  }

  test("scan_full: exactly the 5 regions in key order") {
    val rows = run("scan_full").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("join_broadcast: 25 nations each mapped to a region") {
    val rows = run("join_broadcast").collect()
    assert(rows.length == 25 && rows.forall(r => !r.isNullAt(2)))
  }

  test("join_cross: |region x nation| = 125") {
    assert(run("join_cross").count() == 125)
  }

  test("left_semi + left_anti partition the customer table") {
    val n = Tables.customer(s, d).count()
    assert(run("join_left_semi").count() + run("join_left_anti").count() == n)
  }

  test("agg_global row count matches table count") {
    val r = run("agg_global").collect().head
    assert(r.getAs[Long]("n_rows") == Tables.lineitem(s, d).count())
  }

  test("win_topk_per_group: at most 3 rows per customer, ranks 1..3") {
    val df = run("win_topk_per_group")
    assert(df.groupBy("o_custkey").count().filter(col("count") > 3).isEmpty)
    assert(df.filter(col("rn") < 1 || col("rn") > 3).isEmpty)
  }

  test("llm_text_wordcount: counts are non-increasing, tokens nonempty") {
    val rows = run("llm_text_wordcount").collect()
    val counts = rows.map(_.getAs[Long]("n")).toSeq
    assert(counts == counts.sorted.reverse)
    assert(rows.forall(_.getAs[String]("token").nonEmpty))
  }

  test("llm_dedup_near: every emitted pair really has Jaccard >= 0.8 and a < b") {
    val rows = run("llm_dedup_near").collect()
    assert(rows.nonEmpty, "synthetic corpus is known to contain near-dups")
    assert(rows.forall(r => r.getAs[Long]("jaccard_bp") >= 8000))
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("llm_sim_topk: 5 neighbors per query, cosine within [-1, 1]") {
    val rows = run("llm_sim_topk").collect()
    assert(rows.length == 50)
    assert(rows.forall(r => math.abs(r.getAs[Long]("cosine")) <= 10001L)) // basis points
    assert(rows.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vid")))
  }

  test("llm_sim_ann_ivf results are a subset of the corpus with exact cosines") {
    val rows = run("llm_sim_ann_ivf").collect()
    assert(rows.nonEmpty && rows.forall(r => r.getAs[Int]("rank") <= 3))
  }

  test("udtf_generator: 3-char shingles at contiguous 0-based positions") {
    val rows = run("udtf_generator").collect()
    assert(rows.forall(_.getAs[String]("shingle").length == 3))
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val ps = rs.map(_.getAs[Int]("pos")).sorted.toSeq
      assert(ps == (0 until ps.length))
    }
  }

  test("session_window batch form == gaps-and-islands emulation") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).select(col("user_id"),
      Norm.tsec(col("ts")).as("ts_s"))
    val native = ev.groupBy(session_window(col("ts_s"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ss"), col("w.end").as("se"), col("n"))
    val lagW = Window.partitionBy("user_id").orderBy("ts_s")
    val emul = ev
      .withColumn("new_s",
        when(col("ts_s").cast("long") - lag(col("ts_s"), 1).over(lagW).cast("long") > 600 ||
          lag(col("ts_s"), 1).over(lagW).isNull, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(lagW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_s").as("ss"),
        (max(col("ts_s")) + expr("INTERVAL 10 MINUTES")).as("se"),
        count(lit(1)).as("n"))
      .select("user_id", "ss", "se", "n")
    assert(native.except(emul).isEmpty && emul.except(native).isEmpty)
  }

  test("reshape_pivot: 5 buckets, event-type columns sum to table count") {
    val rows = run("reshape_pivot").collect()
    assert(rows.length == 5)
    val total = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total == Tables.events(s, d).count())
  }

  test("reshape_gapfill: each user's day sequence is contiguous") {
    val rows = run("reshape_gapfill").collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val days = rs.map(_.getAs[java.sql.Date]("day").toLocalDate).sortBy(_.toEpochDay).toSeq
      days.zip(days.drop(1)).foreach { case (a, b) =>
        assert(b.toEpochDay == a.toEpochDay + 1, s"hole between $a and $b")
      }
    }
  }

  test("reshape_base64_hex: every roundtrip returns the original text") {
    assert(run("reshape_base64_hex").filter(col("roundtrip") === false).isEmpty)
  }

  test("join_asof_forward: next click is strictly after the purchase") {
    val bad = run("join_asof_forward")
      .filter(col("next_click_ts").isNotNull && col("next_click_ts") <= col("ts_s"))
    assert(bad.isEmpty)
  }

  test("approx_percentile within 10% of exact") {
    val approx = run("agg_approx_percentile").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = run("agg_percentile").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("p50_qty") / 10000.0).toMap // bp → value
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= math.max(1.0, 0.1 * e), s"status $k: ${approx(k)} vs $e")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = run("agg_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_parts")).toMap
    val exact = Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("x")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("x")).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e <= 0.05, s"flag $k: approx ${approx(k)} vs exact $e")
    }
  }

  test("llm_dedup_clusters: labels form a valid partition with min-id representatives") {
    val rows = run("llm_dedup_clusters").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep")))
    val byRep = rows.groupBy(_._2)
    assert(rows.map(_._1).distinct.length == rows.length, "every doc labeled once")
    assert(byRep.forall { case (rep, mem) => mem.map(_._1).min == rep },
      "representative must be the cluster's min doc id")
    // pair-connected docs must share a label
    val pairs = run("llm_dedup_near").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val lbl = rows.toMap
    assert(pairs.forall { case (a, b) => lbl(a) == lbl(b) },
      "near-dup pair split across clusters")
  }

  test("llm_dedup_keep_best: kept docs are cluster members, sizes sum to corpus") {
    val kept = run("llm_dedup_keep_best").collect()
      .map(r => (r.getAs[Long]("cluster_rep"), r.getAs[Long]("kept_doc"), r.getAs[Long]("n_members")))
    val lbl = run("llm_dedup_clusters").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"))).toMap
    assert(kept.forall { case (rep, doc, _) => lbl(doc) == rep }, "kept doc outside its cluster")
    assert(kept.map(_._3).sum == lbl.size, "cluster sizes must sum to corpus size")
    assert(kept.map(_._1).distinct.length == kept.length, "one kept doc per cluster")
  }

  test("llm_sim_knn: 3 neighbors per vector, no self-edges, ranks contiguous") {
    val rows = run("llm_sim_knn").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"), r.getAs[Int]("rank")))
    assert(rows.forall { case (s0, d0, _) => s0 != d0 })
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == Seq(1, 2, 3), "each source needs ranks 1..3")
    }
  }

  test("llm_dedup_simhash_pairs == brute-force hamming over the signature table") {
    val sigs = run("llm_dedup_simhash").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        java.lang.Long.parseUnsignedLong(r.getAs[String]("simhash"), 16)))
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      ham = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if ham <= 3
    } yield {
      val (a, b) = (sigs(i)._1, sigs(j)._1)
      (math.min(a, b), math.max(a, b), ham.toLong)
    }).toSet
    val got = run("llm_dedup_simhash_pairs").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming"))).toSet
    assert(got == expected,
      s"banding missed/invented pairs: ${(expected diff got) ++ (got diff expected)}")
  }
}
