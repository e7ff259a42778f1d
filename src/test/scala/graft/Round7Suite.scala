package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 rework equivalences: every scale-reshaped op must produce
  * EXACTLY the frame its naive declarative form produces — the naive form
  * stays in the test as the executable semantic definition (the oracles
  * keep the same role on the DuckDB side).
  */
class Round7Suite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def assertSameFrame(got: DataFrame, want: DataFrame, hint: String): Unit = {
    val extra = got.exceptAll(want).count()
    val missing = want.exceptAll(got).count()
    assert(extra == 0 && missing == 0,
      s"$hint: +$extra unexpected / -$missing missing rows")
  }

  test("bucketedPdisc == builtin percentile_disc on lineitem cents (p50 and p90)") {
    val hist = Tables.lineitem(s, d)
      .select(col("l_returnflag"), graft.Norm.money(col("l_extendedprice")).as("cents"))
      .groupBy("l_returnflag", "cents").agg(count(lit(1)).as("w"))
    val naive = Tables.lineitem(s, d)
      .select(col("l_returnflag"), graft.Norm.money(col("l_extendedprice")).as("cents"))
      .groupBy("l_returnflag")
      .agg(
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("p50"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("p90"))
    val got = graft.ops.Shared.bucketedPdisc(hist, "l_returnflag", "cents", "w", 1, 2, "p50")
      .join(graft.ops.Shared.bucketedPdisc(hist, "l_returnflag", "cents", "w", 9, 10, "p90"),
        "l_returnflag")
    assertSameFrame(got.select("l_returnflag", "p50", "p90"),
      naive.select("l_returnflag", "p50", "p90"), "bucketedPdisc vs percentile_disc")
  }

  test("bucketedPdisc respects weights (== percentile_disc over weight-exploded rows)") {
    val sp = s; import sp.implicits._
    // deterministic synthetic histogram: values with multiplicities 1..7
    val hist = (1 to 500).map { i =>
      (s"g${i % 3}", (i * 37 % 211).toLong * 997L, (i % 7 + 1).toLong)
    }.toDF("g", "v", "w")
    val exploded = hist.select(col("g"), col("v"), explode(expr("sequence(1, w)")))
    val naive = exploded.groupBy("g")
      .agg(expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("p"))
    val got = graft.ops.Shared.bucketedPdisc(hist, "g", "v", "w", 1, 4, "p")
    assertSameFrame(got, naive, "weighted bucketedPdisc vs exploded percentile_disc")
  }

  test("bucketedPdiscMulti == one bucketedPdisc per cut") {
    val hist = Tables.lineitem(s, d)
      .select(col("l_returnflag"), graft.Norm.money(col("l_extendedprice")).as("cents"))
      .groupBy("l_returnflag", "cents").agg(count(lit(1)).as("w"))
    val cuts = Seq((1, 10, "c10"), (1, 4, "c25"), (1, 2, "c50"), (9, 10, "c90"))
    val multi = graft.ops.Shared.bucketedPdiscMulti(hist, "l_returnflag", "cents", "w", cuts)
    val singles = cuts.map { case (n, dn, name) =>
      graft.ops.Shared.bucketedPdisc(hist, "l_returnflag", "cents", "w", n, dn, name)
    }.reduce(_.join(_, "l_returnflag"))
    assertSameFrame(multi.select("l_returnflag", "c10", "c25", "c50", "c90"),
      singles.select("l_returnflag", "c10", "c25", "c50", "c90"),
      "multi-cut vs per-cut bucketedPdisc")
  }

  test("agg_gini tie-group decomposition == ranked-window definition") {
    val j = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        graft.Norm.money(col("o_totalprice")).as("cents"), col("o_orderkey"))
    val w = Window.partitionBy("seg").orderBy("cents", "o_orderkey")
    val naive = j.withColumn("i", row_number().over(w).cast("long"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(i * cents AS DECIMAL(38,0))) AS BIGINT)").as("six"),
        expr("CAST(sum(CAST(cents AS DECIMAL(38,0))) AS BIGINT)").as("sx"))
      .select(col("seg"), col("n"),
        expr("""CAST((10000 * (2 * CAST(six AS DECIMAL(38,0)) - (n + 1) * CAST(sx AS DECIMAL(38,0))))
                     div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)""").as("gini_bp"))
    assertSameFrame(SparkEntry.queries("agg_gini")(s, d), naive.orderBy("seg"),
      "agg_gini bucketed vs ranked")
  }

  test("str_levenshtein distributed lag == single nation-partitioned window") {
    val naive = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"),
        lag(col("s_name"), 1).over(
          Window.partitionBy("s_nationkey").orderBy("s_suppkey")).as("prev_name"),
        col("s_name"))
      .select(col("s_suppkey"), col("s_nationkey"),
        coalesce(levenshtein(col("s_name"), col("prev_name")), lit(-1)).as("dist_prev"))
    assertSameFrame(SparkEntry.queries("str_levenshtein")(s, d), naive,
      "str_levenshtein distributed lag vs single window")
  }

  test("llm_token_budget two-phase cut == single lang-partitioned cumsum window") {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n"),
        expr("CAST(size(filter(split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT)")
          .as("st"),
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long").as("np"),
        length(col("text")).cast("long").as("len"))
      .withColumn("quality_bp", expr(
        "(100 * (least(n, 50) * n * len + 30 * (n - st) * len + 20 * (len - np) * n)) div (n * len)"))
    val byLang = Window.partitionBy("lang").orderBy(col("quality_bp").desc, col("doc_id"))
    val naive = scored
      .withColumn("cum_toks", sum("n").over(byLang))
      .withColumn("kept", col("cum_toks") <= lit(2000L))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("total_toks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n")).otherwise(0L)).as("kept_toks"))
      .withColumn("budget_used_bp", expr("10000 * kept_toks div 2000"))
    assertSameFrame(SparkEntry.queries("llm_token_budget")(s, d), naive,
      "llm_token_budget two-phase vs single window")
  }

  test("join_spatial_grid half-neighborhood == full 3x3 ordered-pair emission") {
    val pts = Tables.events(s, d).select(col("event_id"),
      graft.Norm.money(col("value")).as("x"),
      (expr("hour(ts) * 3600 + minute(ts) * 60 + second(ts)")).cast("long").as("y"))
      .withColumn("cx", expr("x div 50")).withColumn("cy", expr("y div 50"))
    val probe = pts.select(col("event_id").as("a"), col("x").as("xa"), col("y").as("ya"),
      explode(expr(
        """flatten(transform(sequence(-1L, 1L),
                     dx -> transform(sequence(-1L, 1L),
                       dy -> struct(cx + dx AS cx, cy + dy AS cy))))""")).as("c"))
      .select(col("a"), col("xa"), col("ya"), col("c.cx"), col("c.cy"))
    val build = pts.select(col("event_id").as("b"), col("x").as("xb"), col("y").as("yb"),
      col("cx"), col("cy"))
    val naive = probe.join(build, Seq("cx", "cy"))
      .filter(col("a") =!= col("b") &&
        abs(col("xa") - col("xb")) <= 50 && abs(col("ya") - col("yb")) <= 50)
      .groupBy(col("a").as("event_id")).agg(count(lit(1)).as("n_neighbors"))
    assertSameFrame(SparkEntry.queries("join_spatial_grid")(s, d), naive,
      "half-neighborhood vs 3x3")
  }

  test("ScaleUp tiling preserves referential integrity and row counts (x3 on sf0.001)") {
    val out = System.getProperty("java.io.tmpdir") + "/graft-scaleup-test"
    graft.ScaleUpCore.run(s, d, out, copies = 3)
    def t(n: String) = s.read.parquet(s"$out/$n.parquet")
    assert(t("orders").count() == 3 * Tables.orders(s, d).count())
    assert(t("lineitem").count() == 3 * Tables.lineitem(s, d).count())
    assert(t("region").count() == Tables.region(s, d).count(), "fixed dims must not tile")
    // FK integrity: every tiled orders row must still find its customer,
    // every lineitem its order — zero orphans, exactly as in the source.
    val orphanOrders = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    val orphanLines = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphanOrders == 0 && orphanLines == 0,
      s"tiling broke FKs: $orphanOrders order orphans, $orphanLines lineitem orphans")
    // keys must not collide across copies
    assert(t("orders").select("o_orderkey").distinct().count() == t("orders").count())
    assert(t("documents").select("doc_id").distinct().count() == t("documents").count())
  }

  test("agg_hhi == driver BigInt brute force, and bounds [10000/n, 10000]") {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_custkey"))
      .agg(graft.Norm.moneySum(col("o_totalprice")).as("r"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(2))))
    val want = rev.groupBy(_._1).map { case (seg, rs) =>
      val t = rs.map(_._2).sum
      val sq = rs.map(x => x._2 * x._2).sum
      (seg, rs.size.toLong, (BigInt(10000) * sq / (t * t)).toLong)
    }.toSet
    val got = SparkEntry.queries("agg_hhi")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"hhi mismatch: got $got want $want")
    got.foreach { case (seg, n, bp) =>
      assert(bp <= 10000 && bp >= 10000 / n, s"$seg hhi_bp=$bp out of [${10000 / n}, 10000]")
    }
  }

  test("win_drawdown == driver replay of the per-user cumulative series") {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        graft.Norm.tsec(col("ts")).cast("long").as("tss"),
        graft.Norm.money(col("value")).as("v"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var cum = 0L; var peak = Long.MinValue; var dd = 0L
      ordered.foreach { r =>
        cum += r._4; peak = math.max(peak, cum); dd = math.max(dd, peak - cum)
      }
      (u, ordered.size.toLong, dd, cum)
    }.toSet
    val got = SparkEntry.queries("win_drawdown")(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"drawdown mismatch (got ${got.size} users, want ${want.size})")
  }

  test("graph_cc_fixed == driver BFS-3 min label (and labels are graph-valid)") {
    val inc = Tables.lineitem(s, d).filter(col("l_quantity") >= 50)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val byPart = inc.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    byPart.values.foreach { ss =>
      for (a <- ss; b <- ss if a != b) adj(a) = adj(a) + b
    }
    val nodes = inc.map(_._2).toSet
    val want = nodes.map { v =>
      var frontier = Set(v); var seen = Set(v)
      (1 to 3).foreach { _ =>
        frontier = frontier.flatMap(adj) -- seen
        seen ++= frontier
      }
      (v, seen.min)
    }
    val got = SparkEntry.queries("graph_cc_fixed")(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
    assert(got == want, s"cc labels mismatch: ${got.size} got vs ${want.size} want")
  }

  test("llm_pii_scan counts are exactly the doc_id residue classes per source") {
    val docs = Tables.documents(s, d).select("doc_id", "source").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val ids = ds.map(_._1)
      (src, ids.size.toLong,
        ids.count(i => i % 7 == 0 || i % 11 == 0 || i % 13 == 0).toLong,
        ids.count(_ % 7 == 0).toLong, ids.count(_ % 11 == 0).toLong,
        ids.count(_ % 13 == 0).toLong)
    }.toSet
    val got = SparkEntry.queries("llm_pii_scan")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, s"pii counts mismatch: got $got want $want")
  }

  test("ts_burstiness == driver brute force over daily counts") {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        expr("""CAST(datediff(CAST(date_trunc('day', date_trunc('second', ts)) AS DATE),
                              DATE'2024-01-01') AS BIGINT)""").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val cs = rows.map(_._2)
      val n = cs.size.toLong; val tot = cs.sum; val q = cs.map(c => c * c).sum
      (t, n, tot, n * q - tot * tot, n * tot)
    }.toSet
    val got = SparkEntry.queries("ts_burstiness")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want, s"burstiness mismatch: got $got want $want")
  }

  test("llm_rouge_pairs == driver multiset-overlap brute force") {
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getString(1).split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap))
      .toMap
    val want = docs.keySet.filter(a => docs.contains(a + 1)).map { a =>
      val (ca, cb) = (docs(a), docs(a + 1))
      val ov = ca.keysIterator.map(w => math.min(ca(w), cb.getOrElse(w, 0L))).sum
      val (na, nb) = (ca.values.sum, cb.values.sum)
      (a, a + 1, ov, na, nb, 10000 * ov / nb, 10000 * ov / na, 20000 * ov / (na + nb))
    }
    val got = SparkEntry.queries("llm_rouge_pairs")(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == want, s"rouge mismatch: ${got.size} got vs ${want.size} want pairs")
  }

  test("llm_minhash_signature: md5-exact on the driver, clone-invariant by construction") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def mh(k: Int, toks: Set[String]): Long = toks.map { w =>
      val hex = md.digest(s"$k:$w".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }.min
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1).split(" ").toSet)).toMap
    val got = SparkEntry.queries("llm_minhash_signature")(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue, (1 to 8).map(r.getLong).toVector)).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, toks) =>
      val want = (0 until 8).map(mh(_, toks)).toVector
      assert(got(id) == want, s"doc $id signature mismatch")
    }
    // min-stability: equal distinct-token sets ⇒ equal signatures
    docs.groupBy(_._2).values.filter(_.size > 1).foreach { clones =>
      assert(clones.keys.map(got).toSet.size == 1, "clone class signatures diverge")
    }
  }

  test("agg_theil == driver replay with identical IEEE arithmetic") {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_custkey"))
      .agg(graft.Norm.moneySum(col("o_totalprice")).as("r"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val want = rev.groupBy(_._1).map { case (seg, rs) =>
      val n = rs.size.toLong; val tot = rs.map(_._2).sum
      val terms = rs.map { case (_, r) =>
        val x = (r * n) / (tot + 0.0)
        math.floor(1000000 * (x * math.log(x))).toLong
      }
      (seg, n, tot, terms.sum)
    }.toSet
    val got = SparkEntry.queries("agg_theil")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"theil mismatch: got $got want $want")
  }

  test("llm_boilerplate_chunks == driver chunk-and-count replay") {
    val docs = Tables.documents(s, d).select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getString(2).split(" ")))
    val chunks = docs.flatMap { case (id, src, t) =>
      (0 until t.length by 24).map(st =>
        (id, src, t.slice(st, math.min(st + 32, t.length)).mkString(" ")))
    }
    val nd = chunks.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size).toMap
    val want = chunks.groupBy(_._2).map { case (src, cs) =>
      (src, cs.size.toLong,
        cs.count(c => nd(c._3) >= 2).toLong,
        cs.filter(c => nd(c._3) >= 2).map(_._1).distinct.size.toLong)
    }.toSet
    val got = SparkEntry.queries("llm_boilerplate_chunks")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"boilerplate mismatch: got $got want $want")
  }

  test("llm_lsh_bucket_stats is consistent with the signature table") {
    val sigs = SparkEntry.queries("llm_minhash_signature")(s, d).collect()
      .map(r => (1 to 8).map(r.getLong).toVector)
    val want = (0 until 4).map { b =>
      val buckets = sigs.groupBy(v => (v(2 * b), v(2 * b + 1))).values.map(_.size.toLong)
      (b.toLong, buckets.size.toLong, buckets.max,
        buckets.map(sz => sz * (sz - 1) / 2).sum)
    }.toSet
    val got = SparkEntry.queries("llm_lsh_bucket_stats")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"lsh stats mismatch: got $got want $want")
  }

  test("util_zorder_key: interleave is a bijection (driver replay) and buckets census") {
    def zOf(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    // bijectivity on the used domain: de-interleave recovers (x, y)
    for (x <- 0L to 520L by 7; y <- 0L to 400L by 11) {
      val z = zOf(x, y)
      val xb = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yb = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert((xb, yb) == (x, y), s"de-interleave broke at ($x, $y)")
    }
    val ev = Tables.events(s, d)
      .select(graft.Norm.money(col("value")).as("cents"),
        expr("""CAST(datediff(CAST(date_trunc('day', date_trunc('second', ts)) AS DATE),
                              DATE'2024-01-01') AS BIGINT)""").as("y"))
      .collect().map(r => zOf(r.getLong(0) / 100, r.getLong(1)))
    val want = ev.groupBy(_ / 1024).map { case (b, zs) =>
      (b, zs.size.toLong, zs.min, zs.max)
    }.toSet
    val got = SparkEntry.queries("util_zorder_key")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"zorder mismatch: got $got want $want")
  }

  test("ts_gap_report == driver replay over distinct active days") {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        expr("""CAST(datediff(CAST(date_trunc('day', date_trunc('second', ts)) AS DATE),
                              DATE'2024-01-01') AS BIGINT)""").as("day"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val days = rows.map(_._2).sorted
      val gaps = days.zip(days.drop(1)).map { case (a, b) => b - a }
      (t, days.size.toLong, gaps.count(_ >= 2).toLong,
        if (gaps.isEmpty) 0L else gaps.max, days.max - days.min + 1)
    }.toSet
    val got = SparkEntry.queries("ts_gap_report")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want, s"gap report mismatch: got $got want $want")
  }

  test("array_reduce_stats: norm agrees with graft_dot, extrema with the raw array") {
    val got = SparkEntry.queries("array_reduce_stats")(s, d)
    val vecs = Tables.embeddings(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getSeq[Float](1).map(_.toDouble).toVector)).toMap
    got.collect().foreach { r =>
      val v = vecs(r.getAs[Number](0).longValue)
      assert(r.getInt(1) == v.size)
      def micro(x: Double) =
        (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact
      assert(r.getLong(3) == micro(v.min) && r.getLong(4) == micro(v.max))
      assert(r.getLong(5) == micro(math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))))
    }
  }

  test("llm_perplexity_filter: held-out census matches, drop fraction < 25%") {
    val rows = SparkEntry.queries("llm_perplexity_filter")(s, d).collect()
    val nHeld = rows.map(_.getLong(1)).sum
    val nKept = rows.map(_.getLong(2)).sum
    val heldDocs = Tables.documents(s, d).filter(col("doc_id") % 5 === 0).count()
    assert(nHeld == heldDocs, s"held census: $nHeld vs $heldDocs docs")
    // p25 DISCRETE cutoff: strictly fewer than a quarter fall below it.
    assert((nHeld - nKept) * 4 < nHeld,
      s"dropped ${nHeld - nKept} of $nHeld — p25 discrete bound violated")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: kept > held")
    }
  }

  test("agg_benford == driver replay over exact cents digits") {
    val cents = Tables.orders(s, d)
      .select(graft.Norm.money(col("o_totalprice")).as("c"))
      .collect().map(_.getLong(0))
    val byDigit = cents.groupBy(c => c.toString.take(1)).map { case (dg, v) =>
      (dg, v.length.toLong)
    }
    val total = cents.length.toLong
    val want = byDigit.map { case (dg, n) =>
      (dg, n, 10000 * n / total,
        math.floor(10000 * math.log10(1.0 + 1.0 / dg.toDouble)).toLong)
    }.toSet
    val got = SparkEntry.queries("agg_benford")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"benford mismatch: got $got want $want")
  }

  test("agg_mutual_info == driver replay, and cells census the event stream") {
    val rows = SparkEntry.queries("agg_mutual_info")(s, d).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == Tables.events(s, d).count(), "cell census != |events|")
    val nx = rows.groupBy(_._1._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val ny = rows.groupBy(_._1._2).map { case (k, v) => (k, v.map(_._2).sum) }
    val total = rows.map(_._2).sum
    rows.foreach { case ((t, dw), nxy, pmi) =>
      val want = math.floor(1000000 *
        math.log((nxy.toDouble * total) / (nx(t).toDouble * ny(dw)))).toLong
      assert(pmi == want, s"($t,$dw): pmi $pmi != replay $want")
    }
  }

  test("ts_peak_concurrency == driver minute-occupancy replay") {
    val m0s = Tables.events(s, d)
      .select(col("event_type"),
        expr("unix_timestamp(date_trunc('second', ts)) div 60").as("m0"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val occ = m0s.flatMap { case (t, m0) => (m0 to m0 + 29).map(m => (t, m)) }
      .groupBy(identity).map { case ((t, m), v) => (t, m, v.length.toLong) }
    val want = occ.groupBy { case (t, m, _) => (t, m / 1440) }.map { case ((t, dy), v) =>
      (t, dy, v.map(_._3).max, v.size.toLong)
    }.toSet
    val got = SparkEntry.queries("ts_peak_concurrency")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"peak-concurrency mismatch (${got.size} vs ${want.size} rows)")
  }

  test("llm_bigram_pmi == driver replay from raw token streams") {
    val toks = Tables.documents(s, d).select(col("text"))
      .collect().map(_.getString(0).split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, v) => (w, v.size.toLong) }
    val total = toks.map(_.size.toLong).sum
    val big = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
      .filter(_._2 >= 10)
    val want = big.map { case ((w1, w2), nxy) =>
      (s"$w1 $w2", nxy, math.floor(1000000 *
        math.log((nxy.toDouble * total) / (uni(w1).toDouble * uni(w2)))).toLong)
    }.toSet
    val got = SparkEntry.queries("llm_bigram_pmi")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"bigram-pmi mismatch: +${(got -- want).take(3)} -${(want -- got).take(3)}")
  }

  test("graph_jaccard_neighbors == driver graph replay") {
    val inc = Tables.lineitem(s, d).filter(col("l_quantity") >= 50)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPart = inc.groupBy(_._1).values.map(_.map(_._2).toSet)
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    byPart.foreach { vs =>
      for (a <- vs; b <- vs if a != b) nbrs(a) = nbrs(a) + b
    }
    val want = nbrs.toSeq.flatMap { case (a, na) =>
      na.filter(_ > a).map { b =>
        val common = (na & nbrs(b)).size.toLong
        val (da, db) = (na.size.toLong, nbrs(b).size.toLong)
        (a, b, common, da, db, 10000 * common / (da + db - common))
      }
    }.toSet
    val got = SparkEntry.queries("graph_jaccard_neighbors")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, s"neighbor-jaccard mismatch (${got.size} vs ${want.size} edges)")
  }

  test("agg_iqr == builtin percentile_disc quartiles, monotone bands") {
    val naive = Tables.lineitem(s, d)
      .select(col("l_returnflag"), graft.Norm.money(col("l_extendedprice")).as("c"))
      .groupBy("l_returnflag")
      .agg(
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY c) AS BIGINT)").as("p25"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)").as("p50"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY c) AS BIGINT)").as("p75"))
      .withColumn("iqr", col("p75") - col("p25"))
    val got = SparkEntry.queries("agg_iqr")(s, d)
    assertSameFrame(got, naive.select("l_returnflag", "p25", "p50", "p75", "iqr"),
      "agg_iqr vs builtin percentile_disc")
    got.collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3),
        s"${r.getString(0)}: quartiles not monotone")
    }
  }

  test("ts_rfm_scores == driver quintile replay") {
    val base = Tables.orders(s, d)
      .select(col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') AS BIGINT)").as("day"),
        graft.Norm.money(col("o_totalprice")).as("cents"))
      .groupBy("o_custkey")
      .agg(max("day").as("ld"), count(lit(1)).as("f"), sum("cents").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ref = base.map(_._2).max
    val rows = base.map { case (k, ld, f, m) => (k, ref - ld, f, m) }
    def cut(vs: Seq[Long], num: Int): Long = {
      val sorted = vs.sorted; val n = sorted.size.toLong
      sorted(((n * num + 4) / 5 - 1).toInt) // min v with cum*5 >= tot*num
    }
    def score(v: Long, qs: Seq[Long]): Long = 1 + qs.count(v > _)
    val (rq, fq, mq) = (
      (1 to 4).map(cut(rows.map(_._2).toSeq, _)),
      (1 to 4).map(cut(rows.map(_._3).toSeq, _)),
      (1 to 4).map(cut(rows.map(_._4).toSeq, _)))
    val want = rows.map { case (k, r, f, m) =>
      val (rs, fs, ms) = (score(r, rq), score(f, fq), score(m, mq))
      (k, r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms)
    }.toSet
    val got = SparkEntry.queries("ts_rfm_scores")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == want, s"rfm mismatch: +${(got -- want).take(3)} -${(want -- got).take(3)}")
  }

  test("ts_seasonality_strength == driver replay, SSB within [0, SST]") {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        expr("""CAST(datediff(CAST(date_trunc('day', date_trunc('second', ts)) AS DATE),
                              DATE'2024-01-01') AS BIGINT)""").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val n = rows.size.toLong; val stot = rows.map(_._3).sum
      val q = rows.map(r => r._3 * r._3).sum
      val ssbTerms = rows.groupBy(_._2 % 7).map { case (_, g) =>
        val sk = g.map(_._3).sum; val nk = g.size.toLong
        math.floor(1000000 * (sk.toDouble * sk / nk)).toLong
      }.sum
      val grand = math.floor(1000000 * (stot.toDouble * stot / n)).toLong
      (t, n, ssbTerms - grand, 1000000 * q - grand)
    }.toSet
    val got = SparkEntry.queries("ts_seasonality_strength")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"seasonality mismatch: got $got want $want")
    got.foreach { case (t, _, ssb, sst) =>
      assert(ssb >= -7000000 && ssb <= sst, // per-term floors can push SSB a hair under 0
        s"$t: SSB $ssb outside [~0, SST=$sst]")
    }
  }

  test("llm_dedup_casefold == driver normalization replay") {
    val docs = Tables.documents(s, d).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).map { case (src, v) =>
      val keys = v.map(_._2.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim)
      val (nd, nk) = (v.size.toLong, keys.distinct.size.toLong)
      (src, nd, nk, 10000 * (nd - nk) / nd)
    }.toSet
    val got = SparkEntry.queries("llm_dedup_casefold")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"casefold mismatch: got $got want $want")
  }

  test("graph_kcore_fixed == driver 3-round peel replay") {
    val inc = Tables.lineitem(s, d).filter(col("l_quantity") >= 50)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = inc.groupBy(_._1).values.flatMap { g =>
      val vs = g.map(_._2).toSet
      for (a <- vs; b <- vs if a != b) yield (a, b)
    }.toSet
    for (_ <- 1 to 3) {
      val deg = edges.groupBy(_._1).map { case (v, es) => (v, es.size) }
      val keep = deg.filter(_._2 >= 2).keySet
      edges = edges.filter { case (a, b) => keep(a) && keep(b) }
    }
    val want = edges.groupBy(_._1).map { case (v, es) => (v, es.size.toLong) }.toSet
    val got = SparkEntry.queries("graph_kcore_fixed")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"kcore mismatch (${got.size} vs ${want.size} nodes)")
  }

  test("agg_trimmed_mean == driver replay, bounded by full range") {
    val vals = Tables.lineitem(s, d)
      .select(col("l_returnflag"), graft.Norm.money(col("l_extendedprice")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = vals.groupBy(_._1).map { case (f, v) =>
      val sorted = v.map(_._2).sorted; val n = sorted.size.toLong
      def q(num: Int, den: Int) = sorted(((n * num + den - 1) / den - 1).toInt)
      val (p10, p90) = (q(1, 10), q(9, 10))
      val kept = sorted.filter(x => x >= p10 && x <= p90)
      (f, kept.size.toLong, kept.sum, p10, p90, kept.sum / kept.size)
    }.toSet
    val got = SparkEntry.queries("agg_trimmed_mean")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, s"trimmed-mean mismatch: got $got want $want")
  }

  test("util_file_plan == driver census replay") {
    val docs = Tables.documents(s, d).select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue))
    val want = docs.groupBy(_._1).map { case (src, v) =>
      val tot = v.map(_._2).sum
      (src, v.size.toLong, tot, v.map(_._2).min, v.map(_._2).max,
        (tot + 1048575) / 1048576, tot / v.size)
    }.toSet
    val got = SparkEntry.queries("util_file_plan")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want, s"file-plan mismatch: got $got want $want")
  }

  test("llm_backoff_logprob == driver replay of the stupid-backoff score") {
    val docs = Tables.documents(s, d).select("doc_id", "text")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1).split(" ", -1).toSeq))
    val bigrams = docs.flatMap { case (id, t) => t.zip(t.drop(1)).map(p => (id, p._1, p._2)) }
    val train = bigrams.filter(_._1 % 5 != 0)
    val cb = train.groupBy(b => (b._2, b._3)).map { case (k, v) => (k, v.size.toLong) }
    val cp = train.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    val cu = train.groupBy(_._3).map { case (k, v) => (k, v.size.toLong) }
    val nt = train.size.toLong
    val vv = train.map(_._3).distinct.size.toLong
    val want = bigrams.filter(_._1 % 5 == 0).groupBy(_._1).map { case (id, bs) =>
      val lps = bs.map { case (_, p, w) =>
        cb.get((p, w)) match {
          case Some(c) => math.floor(1000000 * math.log(c.toDouble / cp(p))).toLong
          case None =>
            val laplace = (BigDecimal(cu.getOrElse(w, 0L)) + BigDecimal("1.0")) / (nt + vv)
            math.floor(1000000 * math.log(0.4 * laplace.toDouble)).toLong
        }
      }
      (id, bs.size.toLong, bs.count(b => !cb.contains((b._2, b._3))).toLong, lps.sum)
    }.toSet
    val got = SparkEntry.queries("llm_backoff_logprob")(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want,
      s"backoff mismatch: +${(got -- want).take(3)} -${(want -- got).take(3)}")
  }

  test("sink_parquet_bloom: footer carries a bloom filter for o_custkey") {
    SparkEntry.queries("sink_parquet_bloom")(s, d).collect() // materialize the sink
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_bloomsink${Math.abs(d.hashCode)}")
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val conf = s.sparkContext.hadoopConfiguration
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val block = reader.getRowGroups.get(0)
      val custCol = block.getColumns.asScala.find(_.getPath.toDotString == "o_custkey").get
      val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(custCol)
      assert(bloom != null, "no bloom filter written for o_custkey")
      assert(bloom.findHash(bloom.hash(42L)) || bloom.findHash(bloom.hash(42: Int)),
        "bloom misses a key that exists")
    } finally reader.close()
  }

  test("llm_embed_outliers == driver replay of the median/MAD gate") {
    def micro(x: Double): Long =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact
    val rows = Tables.embeddings(s, d).select("label", "embedding")
      .collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        (r.getAs[Number](0).longValue, micro(math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))))
      }
    def medOf(vs: Seq[Long]): Long = {
      val sorted = vs.sorted; sorted(((sorted.size + 1) / 2) - 1)
    }
    val med = medOf(rows.map(_._2).toSeq)
    val devs = rows.map { case (l, n) => (l, math.abs(n - med)) }
    val mad = medOf(devs.map(_._2).toSeq)
    val want = devs.groupBy(_._1).map { case (l, v) =>
      (l, v.size.toLong, v.count(_._2 * 10000 > mad * 44478).toLong, med, mad)
    }.toSet
    val got = SparkEntry.queries("llm_embed_outliers")(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want, s"embed-outliers mismatch: got $got want $want")
  }

  test("ts_fulfillment_lag == driver replay over per-order ship maxima") {
    val ship = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE'1995-01-01') AS BIGINT)").as("sd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).max) }
    val ords = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') AS BIGINT)").as("od"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lags = ords.flatMap { case (k, pri, od) => ship.get(k).map(sdm => (pri, sdm - od)) }
    def q(vs: Seq[Long], num: Int, den: Int): Long = {
      val sorted = vs.sorted; val n = sorted.size.toLong
      sorted(((n * num + den - 1) / den - 1).toInt)
    }
    val want = lags.groupBy(_._1).map { case (pri, v) =>
      val xs = v.map(_._2).toSeq
      (pri, xs.size.toLong, q(xs, 1, 2), q(xs, 9, 10), xs.max)
    }.toSet
    val got = SparkEntry.queries("ts_fulfillment_lag")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want, s"fulfillment-lag mismatch: got $got want $want")
  }

  test("reshape_histogram2d == driver census, buckets non-negative") {
    val rows = SparkEntry.queries("reshape_histogram2d")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == Tables.orders(s, d).count(), "grid census != |orders|")
    assert(rows.forall { case (m, b, n) => m >= 0 && b >= 0 && n > 0 })
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length, "duplicate cells")
  }

  test("agg_topn_share == driver replay of the whale-share stat") {
    val rev = Tables.orders(s, d).select("o_custkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) =>
        val sum10 = v.map(x => BigDecimal(java.lang.Double.toString(x._2))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
        (k, (sum10.setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      }
    val top = rev.toSeq.sortBy { case (k, r) => (-r, k) }.take(10).map(_._2)
    val total = rev.values.sum
    val want = (rev.size.toLong, total, top.sum, top.min, 10000 * top.sum / total)
    val r = SparkEntry.queries("agg_topn_share")(s, d).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(got == want, s"topn-share mismatch: got $got want $want")
  }

  test("agg_pareto_frontier == brute-force dominance scan") {
    val pts = Tables.orders(s, d).select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), BigDecimal(java.lang.Double.toString(r.getDouble(1)))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (k, v) =>
        (k, v.size.toLong,
          (v.map(_._2).sum.setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      }.toSeq
    // brute force: (freq, mon) is on the frontier iff no point has strictly
    // greater freq and >= mon; among frontier cells keep min custkey
    val cells = pts.map(p => (p._2, p._3)).distinct
    val frontier = cells.filter { case (f, m) =>
      !cells.exists { case (f2, m2) => f2 > f && m2 >= m }
    }.filter { case (f, m) => m == cells.filter(_._1 == f).map(_._2).max }
    val want = frontier.map { case (f, m) =>
      (pts.filter(p => p._2 == f && p._3 == m).map(_._1).min, f, m)
    }.toSet
    val got = SparkEntry.queries("agg_pareto_frontier")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"pareto mismatch: got $got want $want")
  }

  test("ts_active_lifetime == driver replay, density bounded") {
    val e = Tables.events(s, d)
      .select(col("user_id"),
        expr("""CAST(datediff(CAST(date_trunc('day', date_trunc('second', ts)) AS DATE),
                              DATE'2024-01-01') AS BIGINT)""").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = e.groupBy(_._1).map { case (u, v) =>
      val days = v.map(_._2)
      val (mn, mx) = (days.min, days.max)
      val span = mx - mn + 1
      val act = days.distinct.size.toLong
      (u, mn, mx, act, v.size.toLong, span, 10000 * act / span)
    }.toSet
    val got = SparkEntry.queries("ts_active_lifetime")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want, s"lifetime mismatch (${got.size} vs ${want.size} users)")
    got.foreach { case (u, _, _, _, _, _, dbp) =>
      assert(dbp >= 0 && dbp <= 10000, s"user $u density $dbp out of range")
    }
  }

  test("llm_ngram_entropy_rate == driver replay, entropy non-negative") {
    val docs = Tables.documents(s, d).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    val bg = docs.flatMap { case (l, t) => t.zip(t.drop(1)).map(p => (l, p._1, p._2)) }
    val cb = bg.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val cp = bg.groupBy(b => (b._1, b._2)).map { case (k, v) => (k, v.size.toLong) }
    val want = cb.groupBy(_._1._1).map { case (l, m) =>
      val terms = m.map { case ((_, p, _), c) =>
        math.floor(1000000 * (c.toDouble * math.log(c.toDouble / cp((l, p))))).toLong
      }
      (l, m.values.sum, terms.sum)
    }.toSet
    val got = SparkEntry.queries("llm_ngram_entropy_rate")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"entropy-rate mismatch: got $got want $want")
    got.foreach { case (l, _, sum) => assert(sum <= 0, s"$l: positive -H term sum") }
  }

  test("filter_above_group_mean == driver replay, strict-majority bound") {
    val rows = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), graft.Norm.money(col("o_totalprice")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (seg, v) =>
      val (tot, n) = (v.map(_._2).sum, v.size.toLong)
      val above = v.map(_._2).filter(c => c * n > tot)
      (seg, above.size.toLong, above.sum, n, tot, 10000 * above.size / n)
    }.toSet
    val got = SparkEntry.queries("filter_above_group_mean")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want, s"above-mean mismatch: got $got want $want")
  }

  test("filter_top_decile: kept slice is >= p90 and about a tenth") {
    val got = SparkEntry.queries("filter_top_decile")(s, d).collect()
    val byFlag = Tables.lineitem(s, d)
      .select(col("l_returnflag"), graft.Norm.money(col("l_extendedprice")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    got.foreach { r =>
      val (flag, kept, cut) = (r.getString(0), r.getLong(1), r.getLong(3))
      val v = byFlag(flag).map(_._2)
      val wantKept = v.count(_ >= cut).toLong
      assert(kept == wantKept, s"$flag: kept $kept != replay $wantKept")
      assert(kept * 10 <= v.size + 10 * v.count(_ == cut) + 10,
        s"$flag: kept $kept of ${v.size} — more than a decile plus ties")
      assert(kept > 0 && kept < v.size)
    }
  }

  test("math_try_arithmetic == driver replay of the overflow boundaries") {
    val cents = Tables.orders(s, d)
      .select(graft.Norm.money(col("o_totalprice")).as("c"))
      .collect().map(_.getLong(0))
    def d4r(x: Double): Long =
      (BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLongExact
    val want = (cents.length.toLong,
      cents.count(_ > 49322845L).toLong,
      cents.count(_ > 49400000L).toLong,
      cents.count(_ % 7 == 0).toLong,
      cents.filter(_ % 7 != 0).map(c => d4r(c.toDouble / (c % 7))).sum)
    val r = SparkEntry.queries("math_try_arithmetic")(s, d).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(got == want, s"try-arith mismatch: got $got want $want")
  }

  test("topk_per_group_merge: salted two-level == single-window truth") {
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    val naive = Tables.documents(s, d).select("source", "doc_id", "n_chars")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .orderBy(col("n_chars").desc, col("doc_id")).limit(10)
    assertSameFrame(SparkEntry.queries("topk_per_group_merge")(s, d),
      naive.select("source", "doc_id", "n_chars", "rk"),
      "two-level topk vs single window")
  }

  test("sort_hash_sample is stable across partitionings") {
    val a = SparkEntry.queries("sort_hash_sample")(s, d).collect().map(_.getLong(0)).toSeq
    val b = Tables.orders(s, d).repartition(13)
      .select(col("o_orderkey"), md5(col("o_orderkey").cast("string")).as("h"))
      .orderBy("h").limit(20).collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash sample depends on partitioning")
  }

  test("llm_dedup_containment == driver shingle replay") {
    val docs = Tables.documents(s, d).select("doc_id", "text")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1).split(" ", -1).toSeq))
    val sh = docs.filter(_._2.size >= 5).map { case (id, t) =>
      (id, t.sliding(5).map(_.mkString(" ")).toSet)
    }
    val df_ = sh.flatMap(_._2).groupBy(identity).map { case (k, v) => (k, v.size) }
    val rare = sh.map { case (id, g) => (id, g.filter(df_(_) <= 64)) }
      .filter(_._2.nonEmpty).toMap
    val want = (for {
      (a, ga) <- rare.toSeq if ga.size >= 5
      (b, gb) <- rare.toSeq if a != b
      c = (ga & gb).size if c * 5 >= ga.size * 4
    } yield (a, b, c.toLong, ga.size.toLong, 10000L * c / ga.size)).toSet
    val got = SparkEntry.queries("llm_dedup_containment")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want, s"containment mismatch (${got.size} vs ${want.size} pairs)")
  }

  test("sink_decimal_roundtrip: written decimals re-scale to the original d4 ints") {
    val r = SparkEntry.queries("sink_decimal_roundtrip")(s, d).collect().head
    def d4r(x: Double): Long =
      (BigDecimal(java.lang.Double.toString(x)).setScale(10, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toLongExact
    val vals = Tables.orders(s, d).select("o_totalprice").collect().map(r0 => d4r(r0.getDouble(0)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (vals.length.toLong, vals.sum, vals.min, vals.max))
  }

  test("ds_typed_pipeline == untyped groupBy census") {
    val naive = Tables.orders(s, d).filter(col("o_orderstatus") =!= "F")
      .select(pmod(col("o_custkey"), lit(10)).as("bucket"),
        graft.Norm.money(col("o_totalprice")).as("c"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("c").as("total_cents"))
    assertSameFrame(SparkEntry.queries("ds_typed_pipeline")(s, d),
      naive.select("bucket", "n", "total_cents"), "typed vs untyped pipeline")
  }

  test("llm_source_kl == driver replay, KL approx non-negative") {
    val toks = Tables.documents(s, d).select("source", "text")
      .collect().flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val csw = toks.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val cw = toks.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    val ns = toks.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val nt = toks.size.toLong
    val want = csw.groupBy(_._1._1).map { case (src, m) =>
      val n = ns(src)
      val terms = m.map { case ((_, w), c) =>
        math.floor(1000000 * ((c.toDouble / n) *
          math.log((c.toDouble * nt) / (n.toDouble * cw(w))))).toLong
      }
      (src, n, terms.sum)
    }.toSet
    val got = SparkEntry.queries("llm_source_kl")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"source-kl mismatch: got ${got.size} want ${want.size}")
    // per-term floors subtract < 1 micro-nat per word type; KL itself >= 0
    got.foreach { case (src, _, kl) =>
      assert(kl > -1000000, s"$src: kl_micro $kl too negative for a floored KL")
    }
  }

  test("util_stats_histogram: buckets census the table, heights near-equal") {
    val rows = SparkEntry.queries("util_stats_histogram")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.orders(s, d).count()
    assert(rows.map(_._2).sum == total, "bucket census != |orders|")
    assert(rows.map(_._1).toSeq == (1L to 8L), s"bucket ids: ${rows.map(_._1).toSeq}")
    // equi-height within ties: every bucket within [total/8 - slack, total/8 + slack]
    rows.foreach { case (b, n, lo, hi) =>
      assert(lo <= hi, s"bucket $b: lo > hi")
      assert(n * 8 >= total / 2 && n * 8 <= total * 2,
        s"bucket $b holds $n of $total — nowhere near equi-height")
    }
    // buckets tile the value range in order
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bucket ${a._1} hi ${a._4} overlaps bucket ${b._1} lo ${b._3}")
    }
  }

  test("llm_token_moments == driver replay, F2 >= F1²/F0") {
    val toks = Tables.documents(s, d).select("source", "text")
      .collect().flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val want = toks.groupBy(_._1).map { case (src, v) =>
      val cs = v.groupBy(_._2).map(_._2.size.toLong)
      val (f0, f1, f2) = (cs.size.toLong, cs.sum, cs.map(c => c * c).sum)
      (src, f0, f1, f2, 1000000000L * f2 / (f1 * f1))
    }.toSet
    val got = SparkEntry.queries("llm_token_moments")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want, s"token-moments mismatch")
    got.foreach { case (src, f0, f1, f2, _) =>
      assert(f2 * f0 >= f1 * f1, s"$src: Cauchy-Schwarz violated") // Σc² ≥ (Σc)²/F0
    }
  }

  test("ts_slo_burn == driver replay over hourly windows") {
    val hrs = Tables.events(s, d)
      .select(expr("unix_timestamp(date_trunc('second', ts)) div 3600").as("h"),
        (col("event_type") === "error").cast("long").as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perHour = hrs.groupBy(_._1).map { case (h, v) =>
      (h, v.size.toLong, v.map(_._2).sum)
    }
    val want = perHour.groupBy(_._1 / 24).map { case (dy, v) =>
      (dy, v.size.toLong,
        v.count { case (_, n, e) => e * 10000 > n * 500 }.toLong,
        v.map { case (_, n, e) => 10000 * e / n }.max)
    }.toSet
    val got = SparkEntry.queries("ts_slo_burn")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"slo-burn mismatch: got $got want $want")
  }

  test("win_percent_rank_user: ranks are lawful relative ranks") {
    val rows = SparkEntry.queries("win_percent_rank_user")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, pr, cd) =>
      assert(pr >= 0 && pr <= 10000 && cd > 0 && cd <= 10000, s"user $u: ($pr, $cd)")
    }
    // within a fully-covered user, percent_rank spans 0..10000 and
    // cume_dist ends at exactly 10000
    val byUser = rows.groupBy(_._1)
    val full = byUser.filter(_._2.length >= 2)
    assert(full.nonEmpty)
    full.foreach { case (u, v) =>
      assert(v.map(_._2).min == 0, s"user $u: min percent_rank != 0")
    }
  }

  test("join_role_playing: matrix is asymmetric-complete and censuses the fact rows") {
    val rows = SparkEntry.queries("join_role_playing")(s, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case ((c, sN), _) => assert(c != sN, "diagonal cell present") }
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate matrix cells")
    // census: total matrix count == fact rows whose cust/supp nations differ
    val want = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey")).count()
    assert(rows.map(_._2).sum == want, s"matrix census ${rows.map(_._2).sum} != $want")
  }

  test("ts_snaive_error == driver replay over the observed daily series") {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        expr("""CAST(datediff(CAST(date_trunc('day', date_trunc('second', ts)) AS DATE),
                              DATE'2024-01-01') AS BIGINT)""").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, dy), v) => (t, dy, v.size.toLong) }
    val want = daily.groupBy(_._1).map { case (t, v) =>
      val cs = v.toSeq.sortBy(_._2).map(_._3)
      val rows = (7 until cs.size).map(i => (math.abs(cs(i) - cs(i - 7)), math.abs(cs(i) - cs(i - 1))))
      (t, rows.size.toLong, rows.map(_._1).sum, rows.map(_._2).sum)
    }.toSet
    val got = SparkEntry.queries("ts_snaive_error")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"snaive mismatch: got $got want $want")
  }

  test("scan_json_corrupt_records: exactly the planted lines quarantine") {
    val rows = SparkEntry.queries("scan_json_corrupt_records")(s, d).collect()
    val nullRow = rows.filter(_.isNullAt(0))
    val planted = Tables.events(s, d).filter(col("event_id") % 7 === 0).count()
    assert(nullRow.length == 1 && nullRow.head.getLong(1) == planted &&
      nullRow.head.getLong(2) == planted,
      s"corrupt quarantine: ${nullRow.map(_.toString).toSeq} vs $planted planted")
    rows.filterNot(_.isNullAt(0)).foreach { r =>
      assert(r.getLong(2) == 0, s"${r.getString(0)}: healthy group has corrupt rows")
    }
    assert(rows.map(_.getLong(1)).sum == Tables.events(s, d).count(), "row census")
  }

  test("join_null_routed == plain left join (route-around is semantics-free)") {
    val fact = Tables.orders(s, d).select(
      when(col("o_orderkey") % 10 === 0, lit(null)).otherwise(col("o_custkey")).as("k"),
      graft.Norm.money(col("o_totalprice")).as("cents"))
    val naive = fact.join(
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("k") === col("c_custkey"), "left")
      .groupBy("seg").agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
    assertSameFrame(SparkEntry.queries("join_null_routed")(s, d),
      naive.select("seg", "n", "total_cents"), "null-routed vs plain left join")
  }

  test("llm_split_cluster_safe: folds census all docs, zero straddle by construction") {
    val rows = SparkEntry.queries("llm_split_cluster_safe")(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
    assert(rows.map(_._2).sum == Tables.documents(s, d).count(), "fold census != |docs|")
    // the straddle column reports the NAIVE split's leakage; the safe
    // assignment itself cannot straddle — verify from the labels directly
    val labels = graft.ops.Shared.ccLabels(s, TestSpark.sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    def fold(k: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ("0123456789abcdef".indexOf(md5.head)).toLong % 5
    }
    val safeStraddle = labels.groupBy(_._2)
      .count { case (rep, ms) => ms.map(m => fold(rep)).distinct.size >= 2 }
    assert(safeStraddle == 0)
    val naiveStraddle = labels.groupBy(_._2)
      .count { case (_, ms) => ms.map(m => fold(m._1)).distinct.size >= 2 }
    assert(rows.head._4 == naiveStraddle.toLong,
      s"naive straddle ${rows.head._4} != replay $naiveStraddle")
  }

  test("llm_bm25_topk == driver replay of the BM25 ranking") {
    val docs = Tables.documents(s, d).select("doc_id", "text")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1).split(" ", -1).toSeq))
    val nd = docs.size.toLong
    val sumlen = docs.map(_._2.size.toLong).sum
    val avglen = sumlen.toDouble / nd
    val tf = docs.flatMap { case (id, t) =>
      t.groupBy(identity).map { case (w, v) => (id, w, v.size.toLong) }
    }
    val dfm = tf.groupBy(_._2).map { case (w, v) => (w, v.size.toLong) }
    val terms = dfm.filter(_._2 * 2 <= nd).toSeq.sortBy { case (w, df) => (-df, w) }.take(3).toMap
    val lens = docs.map(p => (p._1, p._2.size.toLong)).toMap
    val want = tf.filter(t => terms.contains(t._2)).groupBy(_._1).map { case (id, v) =>
      val score = v.map { case (_, w, c) =>
        val df = terms(w)
        val idf = math.log(((nd - df).toDouble + 0.5) / (df.toDouble + 0.5))
        val tfc = (c.toDouble * 2.2) /
          (c.toDouble + 1.2 * (0.25 + 0.75 * (lens(id).toDouble / avglen)))
        math.floor(1000000 * (idf * tfc)).toLong
      }.sum
      (id, v.size.toLong, score)
    }.toSeq.sortBy { case (id, _, sc) => (-sc, id) }.take(20)
    val got = SparkEntry.queries("llm_bm25_topk")(s, d).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"bm25 mismatch:\n got $got\nwant $want")
  }

  test("sub_in_multicol plans one composite-key semi join, == driver replay") {
    val df = SparkEntry.queries("sub_in_multicol")(s, d)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in:\n${plan.take(800)}")
    val ords = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val urgent = ords.filter(_._4 == "1-URGENT").map(r => (r._2, r._3)).toSet
    val want = ords.filter(r => r._4 == "5-LOW" && urgent((r._2, r._3)))
      .sortBy(_._1).take(200).map(r => (r._1, r._2, r._3)).toSeq
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == want, s"multicol-IN mismatch (${got.size} vs ${want.size})")
  }

  test("llm_feature_hashing: signed features bounded by bucket counts") {
    val rows = SparkEntry.queries("llm_feature_hashing")(s, d).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue, r.getLong(2), r.getLong(3)))
    val total = rows.map(_._3).sum
    val wantTotal = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast("long")).collect().map(_.getLong(0)).sum
    assert(total == wantTotal, s"token census $total != $wantTotal")
    rows.foreach { case (src, b, n, f) =>
      assert(b >= 0 && b < 64, s"$src bucket $b out of range")
      assert(math.abs(f) <= n, s"$src/$b: |feat| $f > n_toks $n")
      assert((n - math.abs(f)) % 2 == 0, s"$src/$b: parity violated")
    }
  }

  test("agg_grouping_id: flags classify every rollup level exactly") {
    val rows = SparkEntry.queries("agg_grouping_id")(s, d).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.orders(s, d).count()
    // grand total row: g1=g2=1
    val grand = rows.filter(r => r._3 == 1 && r._4 == 1)
    assert(grand.length == 1 && grand.head._5 == total)
    // level-1 subtotals sum to total; g-flags match null-ness exactly
    assert(rows.filter(r => r._3 == 0 && r._4 == 1).map(_._5).sum == total)
    assert(rows.filter(r => r._3 == 0 && r._4 == 0).map(_._5).sum == total)
    rows.foreach { case (st, pr, g1, g2, _) =>
      assert((g1 == 1) == st.isEmpty && (g2 == 1) == pr.isEmpty,
        s"flags ($g1,$g2) disagree with nulls ($st,$pr)")
    }
  }

  test("llm_dedup_exact_prefix == driver replay over 32-token prefixes") {
    val docs = Tables.documents(s, d).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1).split(" ", -1).take(32).mkString(" ")))
    val cross = docs.distinct.groupBy(_._2).count(_._2.map(_._1).toSet.size >= 2).toLong
    val want = docs.groupBy(_._1).map { case (src, v) =>
      val (nd, nk) = (v.size.toLong, v.map(_._2).distinct.size.toLong)
      (src, nd, nk, 10000 * (nd - nk) / nd, cross)
    }.toSet
    val got = SparkEntry.queries("llm_dedup_exact_prefix")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want, s"prefix-dedup mismatch: got $got want $want")
  }

  test("util_key_entropy: entropy bounded by ln(buckets), shares sane") {
    val rows = SparkEntry.queries("util_key_entropy")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet == Set("custkey_mod1024", "order_day"))
    rows.foreach { case (k, nb, total, ent, share) =>
      assert(ent >= 0 && ent <= math.ceil(1000000 * math.log(nb.toDouble)).toLong + nb,
        s"$k: entropy $ent outside [0, 1e6·ln($nb)]")
      assert(share >= 10000 / nb && share <= 10000, s"$k: max share $share")
      assert(total == Tables.orders(s, d).count(), s"$k: census")
    }
  }

  test("graph_bfs_layers == driver BFS replay, layers partition the node set") {
    val inc = Tables.lineitem(s, d).filter(col("l_quantity") >= 50)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    inc.groupBy(_._1).values.foreach { g =>
      val vs = g.map(_._2).toSet
      for (a <- vs; b <- vs if a != b) nbrs(a) = nbrs(a) + b
    }
    val nodes = inc.map(_._2).toSet
    var dist = nodes.filter(_ % 100 == 0).map(_ -> 0L).toMap
    for (r <- 1 to 3) {
      val frontier = dist.filter(_._2 == r - 1).keySet.flatMap(nbrs) -- dist.keySet
      dist = dist ++ frontier.map(_ -> r.toLong)
    }
    val want = (dist.groupBy(_._2).map { case (dd, m) => (dd, m.size.toLong) } +
      (-1L -> (nodes -- dist.keySet).size.toLong)).filter(_._2 > 0).toSet
    val got = SparkEntry.queries("graph_bfs_layers")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"bfs-layers mismatch: got $got want $want")
    assert(got.map(_._2).sum == nodes.size, "layers don't partition the node set")
  }

  test("ts_mom_growth: deltas telescope to last-minus-first per segment") {
    val rows = SparkEntry.queries("ts_mom_growth")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rev, prev, delta) => assert(delta == rev - prev) }
    rows.groupBy(_._1).foreach { case (seg, v) =>
      val sorted = v.sortBy(_._2)
      assert(sorted.map(_._5).sum == sorted.last._3 - sorted.head._4,
        s"$seg: telescoping sum broken")
      // consecutive rows chain: prev of row i == rev of row i-1
      sorted.sliding(2).foreach { case Array(a, b) =>
        if (b._2 == a._2 + 1) assert(b._4 == a._3, s"$seg: chain broken at mo ${b._2}")
      }
    }
  }

  test("stream_window_rollup: hourly rollup == direct hourly aggregation") {
    val direct = Tables.events(s, d)
      .select(graft.Norm.tsec(col("ts")).as("ts_s"), col("event_type"))
      .groupBy(window(col("ts_s"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
    val got = SparkEntry.queries("stream_window_rollup")(s, d)
      .select("window_start", "event_type", "n_events")
    assertSameFrame(got, direct, "two-stage rollup vs direct hourly")
  }

  test("sink_nested_parquet: nested roundtrip censuses the flat table") {
    val r = SparkEntry.queries("sink_nested_parquet")(s, d).collect().head
    val o = Tables.orders(s, d)
    assert(r.getLong(0) == o.count())
    assert(r.getLong(1) == o.select("o_custkey").distinct().count())
    val want = o.select(graft.Norm.money(col("o_totalprice")).as("c"))
      .agg(sum("c")).head.getLong(0)
    assert(r.getLong(2) == want, s"nested cents ${r.getLong(2)} != flat $want")
  }

  test("llm_quality_length_matrix censuses all docs, consistent with withQuality") {
    val rows = SparkEntry.queries("llm_quality_length_matrix")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum == Tables.documents(s, d).count(), "matrix census")
    val q = graft.Pipeline.withQuality(Tables.documents(s, d))
      .select("quality_bp", "n_chars").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue))
    val want = q.groupBy { case (qb, nc) => (qb / 1000, nc / 200) }
      .map { case (k, v) => (k._1, k._2, v.size.toLong, v.map(_._1).sum / v.size) }.toSet
    assert(rows.toSet == want, s"matrix mismatch: got ${rows.toSet} want $want")
  }

  test("ts_churn_by_week == driver replay over weekly active sets") {
    val um = Tables.events(s, d)
      .select(col("user_id"),
        expr("""CAST(datediff(CAST(date_trunc('day', date_trunc('second', ts)) AS DATE),
                              DATE'2024-01-01') div 7 AS BIGINT)""").as("wk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = um.groupBy(_._2).map { case (w, v) => (w, v.map(_._1).toSet) }
    val want = byWeek.map { case (w, users) =>
      val retained = byWeek.get(w + 1).map(n => (users & n).size.toLong).getOrElse(0L)
      val churned = users.size - retained
      (w, users.size.toLong, retained, churned, 10000 * churned / users.size)
    }.toSet
    val got = SparkEntry.queries("ts_churn_by_week")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want, s"churn mismatch: got $got want $want")
  }

  test("llm_dedup_wordorder: multiset key collapses at most as much as casefold+order") {
    val rows = SparkEntry.queries("llm_dedup_wordorder")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == Tables.documents(s, d).count(), "census")
    val docs = Tables.documents(s, d).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1).split(" ", -1).sorted.toSeq))
    val want = docs.groupBy(_._1).map { case (src, v) =>
      src -> ((v.size.toLong, v.map(_._2).distinct.size.toLong))
    }.toMap
    rows.foreach { case (src, nd, nk, dbp) =>
      assert(((nd, nk)) == want(src), s"$src: ($nd,$nk) vs ${want(src)}")
      assert(dbp == 10000 * (nd - nk) / nd)
    }
  }

  test("util_log2_histogram: buckets bound their extrema, census is total") {
    val rows = SparkEntry.queries("util_log2_histogram")(s, d).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.orders(s, d).count(), "bucket census")
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert((1L << b) <= mn && mn <= mx && mx < (1L << (b + 1)),
        s"bucket $b: [$mn, $mx] outside [2^$b, 2^${b + 1})")
    }
  }
}
