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
