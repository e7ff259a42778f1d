package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline + AQE skew handling. */
class PipelineSuite extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  private val out = System.getProperty("java.io.tmpdir") + "/graft-pipeline-out"

  test("pipeline: quality floor holds, output is near-dup free, layout prunes") {
    val summary = Pipeline.run(s, d, out, minQualityBp = 8000).collect()
    assert(summary.nonEmpty && summary.forall(_.getAs[Long]("n_docs") > 0))

    val cleaned = s.read.parquet(out)
    // quality floor
    assert(cleaned.filter(col("quality_bp") < 8000).isEmpty)
    // near-dup freeness: running the detector on the survivors finds nothing
    val toks = cleaned.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    assert(ops.LlmPipeline.nearDupPairs(toks).isEmpty)
    // the partitioned layout prunes at the scan
    val plan = cleaned.filter(col("lang") === "en").queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
  }

  test("runtime bloom filter injects might_contain on a selective shuffle join") {
    val sp = s
    val prevBroadcast = sp.conf.get("spark.sql.autoBroadcastJoinThreshold")
    sp.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    sp.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    sp.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(sp, d).select("l_orderkey", "l_quantity")
      val sel = Tables.orders(sp, d)
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${plan.take(1500)}")
      // the filter is a pruning overlay only — results are unchanged
      val n = joined.count()
      sp.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(n == li.join(sel, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      sp.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      sp.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      sp.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    }
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val sp = s; import sp.implicits._
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // one key carries ~95% of the left side
      val left = s.range(200000)
        .select(when(col("id") < 190000, 0L).otherwise(pmod(col("id"), lit(100))).as("k"), col("id"))
      val right = s.range(100).select(col("id").as("k2"))
      val joined = left.join(right, col("k") === col("k2"))
      // collect() executes joined's own QueryExecution (count()/write build
      // separate plans, leaving this one un-finalized under AQE)
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"), s"AQE did not flag the skew join:\n${plan.take(1200)}")
    } finally {
      s.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      s.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      s.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
