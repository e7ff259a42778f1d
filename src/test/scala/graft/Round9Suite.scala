package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 op invariants: the BPE train→apply pair and the LPA→modularity
  * pair each form a producer/consumer contract whose algebra can be pinned
  * independently of the DuckDB oracle (which checks values, not structure).
  */
class Round9Suite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("graph_modularity: degree/edge accounting closes against the raw graph") {
    val m = SparkEntry.queries("graph_modularity")(s, d).collect()
    val lpa = SparkEntry.queries("graph_label_propagation")(s, d)
    // Rebuild E the same way the op does, from the emitted invariants:
    // Σ_c d_sum = E (every directed edge contributes 1 to its src degree)
    // and Σ_c e_within ≤ E (within-community edges are a subset).
    val dSum = m.map(_.getAs[Long]("d_sum")).sum
    val eWithin = m.map(_.getAs[Long]("e_within")).sum
    assert(dSum > 0, "co-supply graph must be non-empty")
    assert(eWithin <= dSum, s"within-edges $eWithin exceed total edges $dSum")
    // Node accounting: Σ_c n_nodes = |labels| (each node in exactly one c).
    assert(m.map(_.getAs[Long]("n_nodes")).sum == lpa.count())
    // Each row's q_bp is exactly the difference of its two floored terms,
    // and global modularity Q = Σ q_bp stays in the mathematical range
    // (−0.5 ≤ Q ≤ 1, scaled ×1e8; floor error is bounded by |communities|).
    m.foreach { r =>
      assert(r.getAs[Long]("q_bp") ==
        r.getAs[Long]("e_bp") - r.getAs[Long]("dd_bp"))
    }
    val q = m.map(_.getAs[Long]("q_bp")).sum
    assert(q >= -50000000L - m.length && q <= 100000000L,
      s"global modularity out of range: $q")
  }

  test("graph_modularity: perfect-partition limit on a two-clique graph") {
    // Two disjoint triangles labeled by their own component: every edge is
    // within-community, so Q = 1 − Σ(d_c/E)² = 1 − 2·(6/12)² = 0.5 exactly
    // — the textbook value, reproduced by the same scaled-integer algebra
    // the op emits. Guards the formula against sign/scale regressions
    // independently of the LPA labels.
    val e = 12L // directed edges: 2 triangles × 3 edges × 2 directions
    val dC = 6L // per-clique degree sum: 3 nodes × degree 2
    val eBp = 100000000L * 6L / e
    val ddBp = 100000000L * dC * dC / (e * e)
    assert(2 * (eBp - ddBp) == 50000000L)
  }

  test("llm_bpe_vocab: stream accounting closes and ranks are dense") {
    val v = SparkEntry.queries("llm_bpe_vocab")(s, d).collect()
    // Ranks are a dense 1..|vocab| permutation (the row_number contract).
    assert(v.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to v.length))
    // Every merge consumes exactly one symbol from the stream, so the
    // post-merge symbol total = training-corpus char total − Σ n_merged.
    val trainChars = graft.Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w")))).head().getLong(0)
    val merged = SparkEntry.queries("llm_bpe_train_k")(s, d)
      .agg(sum("n_merged")).head().getLong(0)
    assert(v.map(_.getAs[Long]("n")).sum == trainChars - merged,
      "post-merge symbol count must equal chars minus merges")
    // The 4 merged symbols are in the vocab (each survives at least once:
    // a later round can consume SOME occurrences but n_merged>0 of a pair
    // that itself contains the earlier merge keeps the alphabet growing).
    val syms = v.map(_.getAs[String]("symbol")).toSet
    val merges = SparkEntry.queries("llm_bpe_train_k")(s, d)
      .collect().map(_.getAs[String]("merged_pair").replace(" ", ""))
    merges.foreach(m =>
      assert(syms.contains(m) || merges.exists(o => o != m && o.contains(m)),
        s"merged symbol $m vanished from the vocab without a successor"))
  }

  test("llm_bpe_apply: token accounting closes against train_k's corpus") {
    val ap = SparkEntry.queries("llm_bpe_apply")(s, d)
    val agg = ap.agg(sum("n_words"), sum("n_chars"), sum("n_tokens")).head()
    val (words, chars, toks) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    // Encoding can only SHRINK the symbol stream: chars ≥ tokens (each
    // merge reduces count), and tokens ≥ words (no word encodes to zero).
    assert(chars >= toks, s"merges must not grow the stream: $chars < $toks")
    assert(toks >= words, s"every word encodes to ≥1 token: $toks < $words")
    // The 4 learned merges each fire n_merged times corpus-wide on the
    // TRAINING corpus (words with len ≥ 2); apply encodes ALL words, so
    // the total shrink (chars − tokens) is at least train's Σ n_merged.
    val trained = SparkEntry.queries("llm_bpe_train_k")(s, d)
      .agg(sum("n_merged")).head().getLong(0)
    assert(chars - toks >= trained,
      s"apply shrank ${chars - toks} < trained merges $trained")
    // Per-doc fertility/compression are exact integral ratios of the
    // emitted counters — recompute and compare row-by-row.
    val bad = ap.filter(
      col("fert_bp") =!= expr("10000 * n_tokens div n_words") ||
      col("comp_bp") =!= expr("10000 * n_tokens div n_chars")).count()
    assert(bad == 0, s"$bad rows with inconsistent bp ratios")
  }

  test("llm_kmeans_step: Lloyd-update partition/state algebra closes") {
    val km = SparkEntry.queries("llm_kmeans_step")(s, d).collect()
    val nVecs = Tables.embeddings(s, d).count()
    val dims = km.map(_.getAs[Long]("dim")).distinct.sorted
    val clusters = km.map(_.getAs[Long]("cluster")).distinct.sorted
    // Every (cluster, dim) cell present: 8 seed clusters × all dims.
    assert(clusters.sameElements(0L until 8L), clusters.mkString(","))
    assert(km.length == clusters.length * dims.length)
    // Assignment is a PARTITION of the corpus: for every dim, cluster
    // member counts sum to |corpus| (each vector in exactly one cluster).
    km.groupBy(_.getAs[Long]("dim")).foreach { case (dm, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum == nVecs,
        s"dim $dm cluster sizes don't partition the corpus")
    }
    // Emitted drift is EXACTLY the n-scaled numerator of (mean − seed):
    // recompute from the other two columns — no float ever involved.
    km.foreach { r =>
      assert(r.getAs[Long]("drift_nu") ==
        r.getAs[Long]("sum_u") - r.getAs[Long]("n") * r.getAs[Long]("seed_u"))
    }
    // Seeds assign to themselves (cos(x,x) = 1 beats every tie-break), so
    // every cluster has at least one member.
    assert(km.forall(_.getAs[Long]("n") >= 1))
  }

  test("llm_lsh_band_recall: nested-banding monotonicity theorems hold") {
    // The 4 configs band the SAME 8 minhashes with prefix-aligned runs, so
    // detection is nested by construction: all-8-match ⇒ each 4-run matches
    // ⇒ each 2-run matches ⇒ some single hash matches. Both recall and
    // multiplicity-counted candidate volume are therefore monotone in the
    // band count — a structural theorem the oracle's value check can't
    // distinguish from coincidence on one fixture.
    val rows = SparkEntry.queries("llm_lsh_band_recall")(s, d)
      .orderBy(col("bands").desc).collect()
    assert(rows.map(_.getAs[Long]("bands")).sameElements(Array(8L, 4L, 2L, 1L)))
    assert(rows.map(_.getAs[Long]("n_true")).distinct.length == 1,
      "n_true is config-independent")
    val det = rows.map(_.getAs[Long]("n_detected"))
    assert(det.zip(det.tail).forall { case (hi, lo) => hi >= lo },
      s"detection must shrink with fewer bands: ${det.mkString(",")}")
    val cand = rows.map(_.getAs[Long]("candidate_pairs"))
    assert(cand.zip(cand.tail).forall { case (hi, lo) => hi >= lo },
      s"candidate volume must shrink with fewer bands: ${cand.mkString(",")}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_detected") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("recall_bp") ==
        10000L * r.getAs[Long]("n_detected") / math.max(r.getAs[Long]("n_true"), 1L))
    }
  }

  test("llm_curriculum_order: schedule is a quality-sorted permutation with balanced phases") {
    val rows = SparkEntry.queries("llm_curriculum_order")(s, d)
      .orderBy("curriculum_rank").collect()
    // Ranks are a permutation of 1..n (the two-phase bucket decomposition
    // must not drop, duplicate, or gap any position).
    assert(rows.map(_.getAs[Long]("curriculum_rank")).toSeq ==
      (1L to rows.length.toLong).toSeq)
    // Rank order IS quality order: quality_bp non-decreasing along ranks,
    // doc_id ascending within equal quality (the declared tie-break).
    rows.sliding(2).foreach { case Array(a, b) =>
      val (qa, qb) = (a.getAs[Long]("quality_bp"), b.getAs[Long]("quality_bp"))
      assert(qa < qb || (qa == qb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    case _ => ()
    }
    // Phases are 1..4, non-decreasing along the schedule, and each phase's
    // token mass is within one document of the ideal total/4 (a doc joins
    // the phase its FIRST token falls in, so the boundary error is bounded
    // by the largest single document).
    val phases = rows.map(_.getAs[Long]("phase"))
    assert(phases.forall(p => p >= 1 && p <= 4))
    assert(phases.zip(phases.tail).forall { case (a, b) => a <= b })
    val total = rows.map(_.getAs[Long]("n_toks")).sum
    val maxDoc = rows.map(_.getAs[Long]("n_toks")).max
    (1L to 4L).foreach { p =>
      val mass = rows.filter(_.getAs[Long]("phase") == p).map(_.getAs[Long]("n_toks")).sum
      assert(math.abs(mass - total / 4) <= maxDoc + 4,
        s"phase $p mass $mass vs ideal ${total / 4} (maxDoc $maxDoc)")
    }
  }

  test("graph_closeness_fixed: per-seed BFS accounting stays inside the 3-hop bounds") {
    val rows = SparkEntry.queries("graph_closeness_fixed")(s, d).collect()
    assert(rows.nonEmpty, "at least one v%50 seed must exist")
    rows.foreach { r =>
      val (n, sd, h) = (r.getAs[Long]("n_reached"), r.getAs[Long]("sum_dist"),
        r.getAs[Long]("harmonic_x12"))
      // Every reached node contributes one dist ∈ {1,2,3} and one exact
      // 12/d ∈ {12,6,4} term — the three counters must agree on the bounds.
      assert(sd >= n && sd <= 3 * n, s"seed ${r.getLong(0)}: sum_dist $sd vs n $n")
      assert(h >= 4 * n && h <= 12 * n, s"seed ${r.getLong(0)}: harmonic $h vs n $n")
      // d=1 terms dominate both sums consistently: a node at dist 1 adds
      // (1, 12), at 2 adds (2, 6), at 3 adds (3, 4) — so h + 4·sd is
      // 16·n₁ + 14·n₂ + 16·n₃ ∈ [14n, 16n].
      assert(h + 4 * sd >= 14 * n && h + 4 * sd <= 16 * n)
    }
  }

  test("llm_zipf_fit: regression outputs respect the monotone-rank theorems") {
    val rows = SparkEntry.queries("llm_zipf_fit")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // ln(freq) is non-increasing in ln(rank) BY CONSTRUCTION (ranks are
      // ordered by freq desc), so the least-squares covariance — and hence
      // the slope — is ≤ 0 (Chebyshev's sum inequality); R² is a square
      // over a product of nonnegative variances, so 0 ≤ r² ≤ 1.
      assert(r.getAs[Long]("slope_bp") <= 0,
        s"${r.getString(0)}: slope must be non-positive")
      val r2 = r.getAs[Long]("r2_bp")
      assert(r2 >= 0 && r2 <= 10000, s"${r.getString(0)}: r2_bp $r2 out of [0,1]")
      assert(r.getAs[Long]("vocab_n") >= 1)
    }
    // The fit must DISCRIMINATE: the fixture's sources are not all drawn
    // from one distribution, so slopes are not all equal (a constant
    // output would pass the bounds above while measuring nothing).
    assert(rows.map(_.getAs[Long]("slope_bp")).distinct.length > 1)
  }

  test("llm_source_ks_drift: the KS statistic is a bounded census over a partition") {
    val rows = SparkEntry.queries("llm_source_ks_drift")(s, d).collect()
    val corpus = Tables.documents(s, d)
    // One row per source; per-source doc counts partition the corpus.
    assert(rows.length == corpus.select("source").distinct().count())
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus.count())
    // KS is a sup of |CDF difference|: 0 ≤ ks_bp ≤ 10000, and the arg-max
    // length is an OBSERVED value (the sup over the union of jump points
    // is attained at a jump point).
    val (lo, hi) = {
      val r = corpus.agg(min("n_chars"), max("n_chars")).head()
      (r.getLong(0), r.getLong(1))
    }
    rows.foreach { r =>
      val ks = r.getAs[Long]("ks_bp")
      assert(ks >= 0 && ks <= 10000, s"${r.getString(0)}: ks_bp $ks")
      val v = r.getAs[Long]("at_n_chars")
      assert(v >= lo && v <= hi, s"${r.getString(0)}: arg-max $v outside [$lo,$hi]")
    }
  }

  test("llm_sample_temperature: apportionment is exact and temperature flattens") {
    val rows = SparkEntry.queries("llm_sample_temperature")(s, d).collect()
    // Largest-remainder apportionment: quotas sum to the budget EXACTLY
    // (the property floor-only or float shares cannot give).
    assert(rows.map(_.getAs[Long]("quota")).sum == 10000L)
    // Weight is monotone in source size (n^0.7 is increasing), and each
    // quota is its floor share or floor share + 1.
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    byN.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("weight_u") <= b.getAs[Long]("weight_u"))
      case _ => ()
    }
    val tw = rows.map(_.getAs[Long]("weight_u")).sum
    rows.foreach { r =>
      val base = 10000L * r.getAs[Long]("weight_u") / tw
      val q = r.getAs[Long]("quota")
      assert(q == base || q == base + 1, s"${r.getString(0)}: quota $q vs base $base")
    }
    // α < 1 flattening (only observable when sizes differ): the smallest
    // source's sampled share must be ≥ its raw share, the largest's ≤ —
    // with 1-slot rounding slack.
    val n = rows.map(_.getAs[Long]("n_docs"))
    if (n.distinct.length > 1) {
      val total = n.sum
      val smin = byN.head; val smax = byN.last
      assert(smin.getAs[Long]("quota") + 1 >=
        10000L * smin.getAs[Long]("n_docs") / total)
      assert(smax.getAs[Long]("quota") <=
        10000L * smax.getAs[Long]("n_docs") / total + 1)
    }
  }

  test("BPE encode round-trip: token concatenation reproduces every corpus word") {
    // Structural soundness of the whole tokenizer trio: a merge only ever
    // JOINS adjacent symbols, so stripping the separators from any word's
    // encoded token stream must give back the word's exact characters —
    // for every distinct corpus word, under the actually-learned merge
    // table. A violation would mean the sentinel-replace encode corrupted
    // a symbol (e.g. a merge matching across a token boundary).
    val merges = SparkEntry.queries("llm_bpe_train_k")(s, d)
      .select("round", "merged_pair")
    val mrow = merges.groupBy()
      .pivot("round", Seq(1L, 2L, 3L, 4L)).agg(first("merged_pair"))
    val enc = (1 to 4).foldLeft("concat(' ', array_join(split(w, ''), ' '), ' ')") {
      (acc, k) =>
        s"replace($acc, concat(' ', `$k`, ' '), concat(' ', replace(`$k`, ' ', ''), ' '))"
    }
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
    val bad = words.crossJoin(broadcast(mrow))
      .withColumn("roundtrip", expr(s"replace(trim($enc), ' ', '')"))
      .filter(col("roundtrip") =!= col("w"))
    assert(bad.count() == 0,
      s"words whose encoded form lost characters: ${bad.select("w").take(5).mkString(",")}")
  }

  test("llm_minhash_accuracy: the 8-hash estimator behaves like its binomial theory") {
    val rows = SparkEntry.queries("llm_minhash_accuracy")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, n, mae, bias) = (r.getAs[Long]("bucket_lo"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("mae_bp"), r.getAs[Long]("bias_bp"))
      // Truth pairs are J ≥ 0.8, so buckets live in [8000, 9500].
      assert(b >= 8000 && b <= 9500 && b % 500 == 0, s"bucket $b")
      assert(n > 0)
      // agree/8 is unbiased with std √(p(1−p)/8) ≤ √(0.2·0.8/8) ≈ 14.1% at
      // the J = 0.8 edge: mean |err| must sit well under 2σ ≈ 2830 bp, and
      // the empirical bias (a mean over ≥ hundreds of pairs here) must be
      // an order smaller than the spread.
      assert(mae >= 0 && mae <= 2830, s"bucket $b: mae $mae out of theory range")
      assert(math.abs(bias) <= mae.max(1L), s"bucket $b: |bias| $bias exceeds mae $mae")
    }
    // Estimator variance p(1−p)/8 shrinks as J → 1: the top bucket must be
    // at least as accurate as the bottom one.
    val sorted = rows.sortBy(_.getAs[Long]("bucket_lo"))
    assert(sorted.last.getAs[Long]("mae_bp") <= sorted.head.getAs[Long]("mae_bp"),
      "accuracy must not degrade as true Jaccard approaches 1")
  }

  test("ts_downsample_triangle: one interior representative per bucket, drawn from the bucket") {
    val out = SparkEntry.queries("ts_downsample_triangle")(s, d)
    val rows = out.collect()
    // Interior buckets only (first/last have no prev/next anchor), one
    // representative each, per series.
    rows.groupBy(_.getString(0)).foreach { case (tp, rs) =>
      val bks = rs.map(_.getAs[Long]("bucket"))
      assert(bks.distinct.length == bks.length, s"$tp: duplicate bucket reps")
      assert(bks.forall(b => b >= 1 && b <= 30), s"$tp: non-interior bucket selected")
    }
    // Every representative is a REAL event: (type, t, cents) must join back
    // to the source — the argmax cannot fabricate a point.
    import org.apache.spark.sql.functions.{col => c}
    val src = Tables.events(s, d).select(c("event_type"),
      unix_timestamp(date_trunc("second", c("ts"))).as("sel_t"),
      graft.Norm.money(c("value")).as("sel_cents")).distinct()
    val orphans = out.join(src, Seq("event_type", "sel_t", "sel_cents"), "left_anti")
    assert(orphans.count() == 0, "downsampled point not present in the source series")
  }

  test("join_interval_overlap: overlap counting is symmetric and day-bounded") {
    val rows = SparkEntry.queries("join_interval_overlap")(s, d).collect()
    // One row per order, including zero-overlap orders.
    assert(rows.length == Tables.orders(s, d).count())
    // Overlap is symmetric, so each overlapping pair contributes 1 to TWO
    // orders' counts: the global concurrent-count sum must be even.
    assert(rows.map(_.getAs[Long]("n_concurrent")).sum % 2 == 0)
    rows.foreach { r =>
      val (n, dys) = (r.getAs[Long]("n_concurrent"), r.getAs[Long]("overlap_days"))
      // Every overlap spans ≥ 1 day and at most the full 31-day window.
      assert(dys >= n, s"order ${r.getLong(0)}: $dys days for $n overlaps")
      assert(dys <= 31 * n, s"order ${r.getLong(0)}: $dys days exceeds window bound")
    }
  }

  test("win_rolling_corr: frame accounting closes and r² stays in [0, 1e6]") {
    val rows = SparkEntry.queries("win_rolling_corr")(s, d).collect()
    assert(rows.nonEmpty)
    // One output row per full 15-row frame: Σ_supplier max(0, rows_s − 14),
    // where rows_s counts the COLLAPSED (suppkey, orderkey, linenumber) keys
    // the op's pre-aggregation produces.
    val perSupp = Tables.lineitem(s, d)
      .select("l_suppkey", "l_orderkey", "l_linenumber").distinct()
      .groupBy("l_suppkey").count().collect()
    val expected = perSupp.map(r => math.max(0L, r.getAs[Long]("count") - 14)).sum
    assert(rows.length.toLong == expected,
      s"${rows.length} frames vs expected $expected")
    rows.foreach { r =>
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("r_sign")))
      if (!r.isNullAt(r.fieldIndex("r2_micro"))) {
        val r2 = r.getAs[Long]("r2_micro")
        assert(r2 >= 0 && r2 <= 1000000L, s"r² out of range: $r2")
      }
    }
  }

  test("agg_corr_matrix: integer r² tracks float corr² on every pair") {
    val rows = SparkEntry.queries("agg_corr_matrix")(s, d).collect()
    val flags = rows.map(_.getAs[String]("flag")).distinct
    // 6 pairs per returnflag group, r² ∈ [0, 1e18].
    assert(rows.length == flags.length * 6)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("r2_x18")))
        assert(r.getAs[Long]("r2_x18") >= 0 && r.getAs[Long]("r2_x18") <= (1e18 + 1e12).toLong)
    }
    // Cross-check the quantized integer path against Spark's float corr on
    // the identical casted columns: sign AND r² must agree to ~1e-3 (the
    // two floor-divides each quantize at 1e-9 of the factor).
    val base = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
      col("l_quantity").cast("long").cast("double").as("q"),
      Norm.money(col("l_extendedprice")).cast("double").as("p"))
    val fc = base.groupBy("flag").agg(corr("q", "p").as("c")).collect()
      .map(r => r.getAs[String]("flag") -> r.getAs[Double]("c")).toMap
    rows.filter(_.getAs[String]("pair") == "q_p").foreach { r =>
      val c = fc(r.getAs[String]("flag"))
      val got = r.getAs[Long]("r2_x18") / 1e18
      assert(math.abs(got - c * c) < 2e-3, s"flag ${r.getAs[String]("flag")}: $got vs ${c * c}")
      assert(r.getAs[Long]("r_sign") == math.signum(c).toLong || math.abs(c) < 1e-9)
    }
  }

  test("graph_assortativity: directed-endpoint algebra closes and r is bounded") {
    val r = SparkEntry.queries("graph_assortativity")(s, d).head()
    // Both orientations of every unordered edge: n = 2·n_edges exactly.
    assert(r.getAs[Long]("n") == 2 * r.getAs[Long]("n_edges"))
    // Pearson of a real sample: −1 ≤ r ≤ 1 (scaled ×1e6, floor-div slack 1).
    if (!r.isNullAt(r.fieldIndex("r_micro"))) {
      val rm = r.getAs[Long]("r_micro")
      assert(rm >= -1000001L && rm <= 1000000L, s"assortativity out of range: $rm")
    }
    // Cauchy–Schwarz on the symmetric sums: |n·Σxy − Σx²| ≤ n·Σx² − (Σx)²
    // is exactly den ≥ |num|, already implied by the range check above.
  }

  test("llm_shard_balance: shard census partitions the corpus exactly") {
    val rows = SparkEntry.queries("llm_shard_balance")(s, d).collect()
    assert(rows.map(_.getAs[Long]("shard")).forall(sh => sh >= 0 && sh < 16))
    val docs = Tables.documents(s, d)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // Token mass closes against an independent count.
    val tok = docs.select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == tok)
    // Σ load_bp = Σ floor(10000·16·t_s/T) ∈ (160000 − #shards, 160000].
    val lb = rows.map(_.getAs[Long]("load_bp")).sum
    assert(lb > 160000L - rows.length && lb <= 160000L, s"load sum $lb")
  }

  test("llm_ngram_coverage: the head-coverage curve is a monotone CDF") {
    val rows = SparkEntry.queries("llm_ngram_coverage")(s, d).collect()
      .sortBy(_.getAs[Long]("top_n"))
    assert(rows.length == 9)
    val total = rows.head.getAs[Long]("total")
    var prevCov = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_used") <= r.getAs[Long]("top_n"))
      assert(r.getAs[Long]("total") == total, "total is a constant of the corpus")
      val cov = r.getAs[Long]("covered")
      assert(cov >= prevCov, "coverage is cumulative in top_n")
      assert(cov <= total)
      assert(r.getAs[Long]("coverage_bp") == 10000L * cov / total)
      prevCov = cov
    }
  }

  test("quantified ALL/ANY lowerings agree with direct min/max predicates") {
    val cust = Tables.customer(s, d).select("c_custkey")
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(min(Norm.money(col("o_totalprice"))).as("lo"),
        max(Norm.money(col("o_totalprice"))).as("hi"))
    // ALL: every order ≥ $50k ⇔ min ≥ 5000000, vacuously true with no orders.
    val expAll = cust.join(perCust, Seq("c_custkey"), "left")
      .filter(col("lo").isNull || col("lo") >= 5000000L)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val gotAll = SparkEntry.queries("sub_quantified_all")(s, d)
      .collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(gotAll == expAll, s"ALL: ${gotAll.size} vs ${expAll.size}")
    assert(gotAll.nonEmpty)
    // ANY: at least one order ≤ $5k ⇔ min ≤ 500000, false with no orders.
    val expAny = perCust.filter(col("lo") <= 500000L)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val gotAny = SparkEntry.queries("sub_quantified_any")(s, d)
      .collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(gotAny == expAny, s"ANY: ${gotAny.size} vs ${expAny.size}")
  }

  test("llm_contamination_sweep: longer grams can only flag fewer docs") {
    val rows = SparkEntry.queries("llm_contamination_sweep")(s, d).collect()
      .sortBy(_.getAs[Long]("gram_n"))
    assert(rows.map(_.getAs[Long]("gram_n")).toSeq == Seq(3L, 5L, 8L))
    val nDocs = rows.head.getAs[Long]("n_docs")
    // Every n-gram of a shared (n+k)-gram window is itself shared (bench
    // grams are taken over ALL windows of bench docs), so the contaminated
    // set shrinks monotonically with gram length.
    var prev = Long.MaxValue
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == nDocs, "doc universe is n-independent")
      val c = r.getAs[Long]("n_contaminated")
      assert(c <= prev, s"n=${r.getAs[Long]("gram_n")}: $c contaminated > $prev at shorter n")
      assert(r.getAs[Long]("doc_bp") == 10000L * c / nDocs)
      assert(r.getAs[Long]("gram_bp") >= 0 && r.getAs[Long]("gram_bp") <= 10000L)
      prev = c
    }
  }

  test("win_ewma_bounded: matches a sequential replay of the binary-decay kernel") {
    val got = SparkEntry.queries("win_ewma_bounded")(s, d).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        (r.getAs[Long]("n_in"), r.getAs[Long]("ewma_c"))).toMap
    // Replay the kernel sequentially (the semantics the bounded frame
    // approximates exactly) for three users straight off the raw table.
    val users = Seq(1L, 7L, 42L)
    val raw = Tables.events(s, d).filter(col("user_id").isin(users: _*))
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("tss"), Norm.money(col("value")).as("v"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("tss"),
        r.getAs[Long]("event_id"), r.getAs[Long]("v")))
    users.foreach { u =>
      val series = raw.filter(_._1 == u).sortBy(t => (t._2.getTime, t._3))
      var window = Vector.empty[Long]
      series.foreach { case (_, _, eid, v) =>
        window = (window :+ v).takeRight(16)
        val num = window.zipWithIndex.map { case (x, i) => x * (1L << i) }.sum
        val den = (1L << window.size) - 1
        val (nIn, ewma) = got((u, eid))
        assert(nIn == window.size, s"user $u event $eid: frame size")
        assert(ewma == num / den, s"user $u event $eid: ${num / den} vs $ewma")
      }
    }
    // Weighted-mean sanity on every row: the estimate never leaves the
    // global value range.
    assert(got.values.forall { case (_, e) => e >= 1 && e <= 49002 })
  }

  test("ts_cross_corr_lags: lag alignment shrinks the grid by exactly one per lag") {
    val rows = SparkEntry.queries("ts_cross_corr_lags")(s, d).collect()
      .sortBy(_.getAs[Long]("lag"))
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (0L to 5L))
    val n0 = rows.head.getAs[Long]("n")
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n0 - r.getAs[Long]("lag"),
        "each lag k drops exactly k boundary buckets from the pair set")
      if (!r.isNullAt(r.fieldIndex("r2_micro"))) {
        val r2 = r.getAs[Long]("r2_micro")
        // Product of two same-sign truncating divides: 0 ≤ r² ≤ 1e6.
        assert(r2 >= 0 && r2 <= 1000000L, s"lag ${r.getAs[Long]("lag")}: r² $r2")
      }
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("r_sign")))
    }
  }

  test("sink_zorder_layout: z-order prunes a y-narrow box a 1-D x-sort cannot") {
    // Run the op (writes the z-ordered files), then write the 1-D
    // comparison layout and measure, per file, whether its (xb, yb)
    // min/max envelope intersects a box that is FULL in x and narrow in y
    // — the shape that defeats single-key sorting: an x-sorted file bounds
    // xb tightly but spans all of yb, so every file intersects, while the
    // morton interleave bounds both dimensions per file.
    SparkEntry.queries("sink_zorder_layout")(s, d).collect()
    val zPath = s"${System.getProperty("java.io.tmpdir")}/graft_zorder${Math.abs(d.hashCode)}"
    val xPath = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_x${Math.abs(d.hashCode)}"
    s.read.parquet(zPath).select("xb", "yb")
      .repartitionByRange(8, col("xb")).sortWithinPartitions("xb")
      .write.mode("overwrite").parquet(xPath)
    def touched(path: String): (Int, Int) = {
      val envs = s.read.parquet(path)
        .groupBy(col("_metadata.file_name"))
        .agg(min("xb").as("x0"), max("xb").as("x1"),
          min("yb").as("y0"), max("yb").as("y1"))
        .collect()
      val hit = envs.count { r =>
        r.getAs[Number]("y1").longValue >= 128 && r.getAs[Number]("y0").longValue <= 159
      }
      (hit, envs.length)
    }
    val (zHit, zTotal) = touched(zPath)
    val (xHit, xTotal) = touched(xPath)
    assert(xHit == xTotal, s"1-D x-sort should touch every file for a y-box ($xHit/$xTotal)")
    assert(zHit * 2 <= zTotal,
      s"z-order should skip at least half the files on the y-box ($zHit/$zTotal)")
  }

  test("util_table_checksum: fold is order/partition-invariant and row-sensitive") {
    val rows = SparkEntry.queries("util_table_checksum")(s, d).collect()
      .map(r => r.getAs[String]("tab") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_checksum"))).toMap
    // Row counts must agree with the raw tables — the (count, xor) pair is
    // only a proof of content equality if count is honest.
    assert(rows("nation")._1 == Tables.t(s, d, "nation").count())
    assert(rows("orders")._1 == Tables.t(s, d, "orders").count())
    // Invariance: the same fold over a deliberately different physical
    // layout (17-way hash repartition on a non-key column, which also
    // scrambles intra-partition order) must produce the identical xor —
    // that is the entire point of a commutative checksum.
    val scrambled = Tables.t(s, d, "nation")
      .repartition(17, col("n_name"))
      .selectExpr("CAST(conv(substring(md5(concat_ws('|', n_nationkey, n_name, n_regionkey)), 1, 15), 16, 10) AS BIGINT) AS h")
      .agg(expr("bit_xor(h)")).head.getLong(0)
    assert(scrambled == rows("nation")._2, "checksum must not depend on layout")
    // Sensitivity: mutating a single row's key flips the xor (the two md5
    // prefixes differ, so their xor contribution is nonzero).
    val mutated = Tables.t(s, d, "nation")
      .withColumn("n_nationkey",
        when(col("n_nationkey") === 0, lit(9999)).otherwise(col("n_nationkey")))
      .selectExpr("CAST(conv(substring(md5(concat_ws('|', n_nationkey, n_name, n_regionkey)), 1, 15), 16, 10) AS BIGINT) AS h")
      .agg(expr("bit_xor(h)")).head.getLong(0)
    assert(mutated != rows("nation")._2, "a mutated row must move the checksum")
  }

  test("agg_ols_multi: exact milli betas track a float least-squares solve") {
    val rows = SparkEntry.queries("agg_ols_multi")(s, d).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.t(s, d, "lineitem").count())
    // Re-solve the same normal equations in doubles from the raw columns
    // and require the exact integer path to agree to the milli it floors
    // to — Cramer's rule is the same algebra, so any divergence beyond
    // 1 ulp of the float solve is an arithmetic bug, not noise.
    import org.apache.spark.sql.functions._
    // Mirror the op's exact integerization (whole percent, truncated
    // dollars) so the float solve sees the same regressors.
    val base = Tables.t(s, d, "lineitem").select(
        col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x1l"),
        Norm.d4(col("l_discount")).as("dbp"),
        Norm.money(col("l_extendedprice")).as("yc"))
      .select(col("flag"),
        col("x1l").cast("double").as("x1"),
        expr("CAST(dbp div 100 AS DOUBLE)").as("x2"),
        expr("CAST(yc div 100 AS DOUBLE)").as("y"))
    val m = base.groupBy("flag").agg(
      count(lit(1)).cast("double").as("n"),
      sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
      sum(expr("x1*x1")).as("s11"), sum(expr("x2*x2")).as("s22"),
      sum(expr("x1*x2")).as("s12"), sum(expr("x1*y")).as("s1y"),
      sum(expr("x2*y")).as("s2y")).collect()
      .map(r => r.getAs[String]("flag") -> r).toMap
    rows.foreach { r =>
      val g = m(r.getAs[String]("flag"))
      def f(c: String) = g.getAs[Double](c)
      val (n, s1, s2, sy) = (f("n"), f("s1"), f("s2"), f("sy"))
      val c11 = n * f("s11") - s1 * s1; val c22 = n * f("s22") - s2 * s2
      val c12 = n * f("s12") - s1 * s2
      val c1y = n * f("s1y") - s1 * sy; val c2y = n * f("s2y") - s2 * sy
      val den = c11 * c22 - c12 * c12
      assert(den > 0, "fixture regressors must not be collinear")
      val b1 = (c22 * c1y - c12 * c2y) / den
      val b2 = (c11 * c2y - c12 * c1y) / den
      val got1 = r.getAs[Long]("b1_sign") * r.getAs[Long]("b1_abs_milli") / 1000.0
      val got2 = r.getAs[Long]("b2_sign") * r.getAs[Long]("b2_abs_milli") / 1000.0
      assert(math.abs(got1 - b1) < 0.002 + math.abs(b1) * 1e-9,
        s"${r.get(0)}: b1 exact $got1 vs float $b1")
      assert(math.abs(got2 - b2) < 0.002 + math.abs(b2) * 1e-9,
        s"${r.get(0)}: b2 exact $got2 vs float $b2")
    }
  }

  test("join_range_strategy: the custom exec plans and matches the nested-loop lowering") {
    val df = SparkEntry.queries("join_range_strategy")(s, d)
    // The injected strategy must actually fire — the whole point of the
    // LogicalPlan/Strategy/SparkPlan triple is that the plan contains OUR
    // operator, not a BroadcastNestedLoopJoin.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), s"custom exec missing from plan:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Vanilla lowering of the same predicate (Spark picks nested-loop).
    val bands = s.range(0, 40).select(col("id").as("band_id"),
      (lit(90000L) + col("id") * 250L).as("lo"),
      (lit(90500L) + col("id") * 250L).as("hi"))
    val probe = Tables.t(s, d, "part")
      .select(Norm.money(col("p_retailprice")).as("cents"))
    val want = probe.join(bands, col("cents") >= col("lo") && col("cents") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "custom exec diverged from the nested-loop truth")
    // Overlapping half-width bands: every in-range part lands in exactly 2
    // bands except the first half-band's — so the census roughly doubles
    // the part count and can never exceed it.
    val parts = probe.count()
    val total = got.toSeq.map(_._2).sum
    assert(total > parts && total <= 2 * parts, s"stab count $total vs parts $parts")
  }

  test("util_salt_advisor: advisories follow the documented sizing rule and match the skew report") {
    val legs = SparkEntry.queries("util_salt_advisor")(s, d).collect()
      .map(r => r.getAs[String]("relationship") -> r).toMap
    assert(legs.size == 4)
    // Each leg's row count must be the raw table count (the key collapse
    // is a partition of the fact side).
    assert(legs("events.user_id").getAs[Long]("n_rows") == Tables.events(s, d).count())
    assert(legs("orders.o_custkey").getAs[Long]("n_rows") == Tables.t(s, d, "orders").count())
    legs.values.foreach { r =>
      val (rows, keys, mx) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("max_mult"))
      assert(mx * keys >= rows, "max multiplicity cannot sit below the mean")
      assert(r.getAs[Long]("avg_mult_bp") == 10000 * rows / keys)
      assert(r.getAs[Long]("skewed") == (if (mx * keys > 4 * rows) 1L else 0L))
      assert(r.getAs[Long]("salt_factor") == math.max(1L, (mx + 4095) / 4096))
    }
    // The events leg must agree with util_skew_report's global stats.
    val sk = SparkEntry.queries("util_skew_report")(s, d).collect().head
    assert(legs("events.user_id").getAs[Long]("n_keys") == sk.getAs[Long]("n_keys"))
    assert(legs("events.user_id").getAs[Long]("max_mult") == sk.getAs[Long]("max_n"))
  }

  test("util_checksum_shards: the manifest folds to the table-level checksum") {
    val shards = SparkEntry.queries("util_checksum_shards")(s, d).collect()
    // Every shard id is a low-6-bit value and (at 60k rows) all 64 occur.
    assert(shards.map(_.getAs[Long]("shard")).toSet == (0L until 64L).toSet)
    // Partition property: shard counts sum to the table count.
    assert(shards.map(_.getAs[Long]("n_rows")).sum ==
      Tables.t(s, d, "lineitem").count())
    // Merkle-root property: xor of the shard xors equals the whole-table
    // xor_checksum util_table_checksum emits for lineitem — the drill-down
    // and the root are the same fold, just grouped.
    val root = SparkEntry.queries("util_table_checksum")(s, d).collect()
      .find(_.getAs[String]("tab") == "lineitem").get
      .getAs[Long]("xor_checksum")
    assert(shards.map(_.getAs[Long]("xor_checksum")).reduce(_ ^ _) == root)
    // The extrema discriminators nest inside the hash space of the shard.
    shards.foreach { r =>
      assert(r.getAs[Long]("h_min") <= r.getAs[Long]("h_max"))
      assert(r.getAs[Long]("h_min") % 64 == r.getAs[Long]("shard"))
      assert(r.getAs[Long]("h_max") % 64 == r.getAs[Long]("shard"))
    }
  }

  test("agg_chi2_independence: contingency accounting and per-cell algebra close") {
    val rows = SparkEntry.queries("agg_chi2_independence")(s, d).collect()
    val n = rows.map(_.getAs[Long]("obs")).sum
    assert(n == Tables.t(s, d, "lineitem").count())
    rows.groupBy(_.getAs[String]("flag")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("obs")).sum == rs.head.getAs[Long]("r_tot"))
    }
    rows.groupBy(_.getAs[String]("st")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("obs")).sum == rs.head.getAs[Long]("c_tot"))
    }
    rows.foreach { r =>
      val (o, rt, ct) = (BigInt(r.getAs[Long]("obs")),
        BigInt(r.getAs[Long]("r_tot")), BigInt(r.getAs[Long]("c_tot")))
      assert(BigInt(r.getAs[Long]("exp_micro")) == rt * ct * 1000000 / n)
      val dlt = o * n - rt * ct
      assert(BigInt(r.getAs[Long]("term_micro")) ==
        dlt * dlt * 1000000 / (BigInt(n) * rt * ct))
    }
    // Expected counts partition N exactly up to the per-cell floors.
    val expSum = rows.map(_.getAs[Long]("exp_micro")).sum
    assert(expSum <= n * 1000000L && expSum > n * 1000000L - 1000000L * rows.length)
  }

  test("llm_kmeans_train_k: the trained state is a consistent hard partition") {
    val rows = SparkEntry.queries("llm_kmeans_train_k")(s, d).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    // Every surviving cluster carries all 64 dims with ONE member count —
    // n is a cluster property, repeated per dim by construction.
    byCluster.foreach { case (c, rs) =>
      assert(rs.map(_.getAs[Long]("dim")).toSet == (0L until 64L).toSet, s"cluster $c dims")
      assert(rs.map(_.getAs[Long]("n")).toSet.size == 1, s"cluster $c member count must be constant")
    }
    // Hard partition: cluster sizes sum to the corpus.
    assert(byCluster.values.map(_.head.getAs[Long]("n")).sum ==
      Tables.t(s, d, "embeddings").count())
    // The emitted next-centroid is exactly the truncating mean at 1e4.
    rows.foreach { r =>
      assert(r.getAs[Long]("cent_cu") ==
        r.getAs[Long]("sum_xu") / (100 * r.getAs[Long]("n")))
    }
  }

  test("ts_trend_mann_kendall: pair accounting closes and the z-call matches its algebra") {
    val rows = SparkEntry.queries("ts_trend_mann_kendall")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val np = r.getAs[Long]("n_pairs")
      val st = r.getAs[Long]("s_stat")
      assert(np == n * (n - 1) / 2, "every ordered grid pair must be scored once")
      assert(math.abs(st) <= np, "S is a sum of ±1/0 over the pairs")
      assert(r.getAs[Long]("var18") == n * (n - 1) * (2 * n + 5))
      val sig = (math.abs(st) - 1) * (math.abs(st) - 1) * 45000 >
        9604 * n * (n - 1) * (2 * n + 5)
      val expect = if (sig && st > 0) "increasing"
                   else if (sig && st < 0) "decreasing" else "none"
      assert(r.getAs[String]("trend") == expect)
    }
  }

  test("ts_theilsen_slope: pair set matches Mann-Kendall and the median sign obeys S") {
    val sen = SparkEntry.queries("ts_theilsen_slope")(s, d).collect()
      .map(r => r.getAs[String]("seg") -> r).toMap
    val mk = SparkEntry.queries("ts_trend_mann_kendall")(s, d).collect()
    assert(sen.keySet == mk.map(_.getAs[String]("seg")).toSet)
    mk.foreach { m =>
      val r = sen(m.getAs[String]("seg"))
      assert(r.getAs[Long]("n_pairs") == m.getAs[Long]("n_pairs"),
        "both ops rank the same C(grid,2) pair set")
      // S = #pos − #neg slopes, so S > 0 forces the lower median slope
      // ≥ 0 and S < 0 forces it ≤ 0 — the two trend ops must agree.
      val (sStat, slope) = (m.getAs[Long]("s_stat"), r.getAs[Long]("sen_slope_micro"))
      if (sStat > 0) assert(slope >= 0, s"S=$sStat but sen=$slope")
      if (sStat < 0) assert(slope <= 0, s"S=$sStat but sen=$slope")
    }
  }

  test("llm_text_readability: syllable proxy and word accounting cohere with the sentence op") {
    val rd = SparkEntry.queries("llm_text_readability")(s, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val se = SparkEntry.queries("llm_text_sentences")(s, d).collect()
    assert(rd.size == se.length)
    se.foreach { t =>
      val r = rd(t.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == t.getAs[Long]("n_words"),
        "both ops must count the same whitespace words")
      val (w, syl, poly) =
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_syll"), r.getAs[Long]("n_poly"))
      assert(syl >= w, "every word carries at least one syllable")
      assert(poly <= w)
      assert(r.getAs[Long]("syll_per_word_bp") == 10000 * syl / w)
      assert(r.getAs[Long]("fk_grade_c") ==
        39 * w / r.getAs[Long]("n_sent") + 1180 * syl / w - 1559)
    }
  }

  test("llm_perplexity_unigram: surprisal is nonnegative and the mean is an honest floor-divide") {
    val rows = SparkEntry.queries("llm_perplexity_unigram")(s, d).collect()
    assert(rows.nonEmpty)
    // Σ n_tok across docs must equal the raw token count — the vocab join
    // is inner on a total vocab, so no token may be dropped or duplicated.
    val rawToks = Tables.documents(s, d)
      .select(explode(split(col("text"), " "))).count()
    assert(rows.map(_.getAs[Long]("n_tok")).sum == rawToks)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tok")
      val tot = r.getAs[Long]("nll_total")
      // floor(1e6 ln T) ≥ floor(1e6 ln c) for every term (c ≤ T, floor is
      // monotone), so every per-token surprisal — hence the total — is ≥ 0.
      assert(tot >= 0, s"doc ${r.get(0)}: negative total surprisal $tot")
      assert(r.getAs[Long]("mean_nll_micro") == tot / n,
        "mean must be the truncating integer divide of the emitted pair")
    }
  }
}
