package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** SURVEY.md §2.K — the full custom-operator ladder rung (c): a whole
  * operator expressed as LogicalPlan + SparkStrategy + SparkPlan and
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * ([[GraftExtensions]]).
  *
  * The operator is a BROADCAST RANGE JOIN (point-in-interval, NO equi key):
  * `probe.key ∈ [build.lo, build.hi)`. Spark's own planner has no strategy
  * for this shape — JoinSelection falls through to
  * BroadcastNestedLoopJoinExec, which evaluates the predicate on every
  * (probe × build) pair: O(|probe|·|build|) comparisons. This exec sorts
  * the broadcast intervals by `lo` once and answers each probe row by
  * binary search + a bounded backward scan, O(log |build| + answers) per
  * row — the classic interval-stabbing bound, using the max interval
  * LENGTH as the scan cutoff (any interval containing p has
  * lo > p − maxLen, so the walk stops after at most
  * maxLen/minGap candidates; equal-width bands make it exactly the answer
  * count). Equivalence to the nested-loop plan is asserted in Round9Suite
  * and the DuckDB oracle; the speedup is measured there too.
  *
  * Scale notes: the BUILD side must be broadcast-sized (it is
  * driver-collected and torch-broadcast like any build side — a
  * production variant would reuse BroadcastExchange for the memory
  * accounting, the simplification is documented, bounded, and guarded by
  * the strategy's use being explicit opt-in via [[GraftRangeJoin.apply]]);
  * the PROBE side streams partition-parallel with no shuffle and no
  * per-row allocation beyond the joined projection. All three expressions
  * are LongType by contract (cents / day numbers / ids) — integer
  * comparisons, no float boundary.
  */
case class RangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    probeKey: Expression, lo: Expression, hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class BroadcastRangeJoinExec(
    probe: SparkPlan, build: SparkPlan,
    probeKey: Expression, lo: Expression, hi: Expression) extends BinaryExecNode {
  override def left: SparkPlan = probe
  override def right: SparkPlan = build
  override def output: Seq[Attribute] = probe.output ++ build.output
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(probe = newLeft, build = newRight)

  // Native-operator reporting: the exec surfaces the same numOutputRows
  // metric the built-in joins do (visible in the SQL UI / metrics API),
  // plus the build-side size the broadcast contract depends on.
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "buildRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "broadcast interval count"))

  override protected def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference(lo, build.output)
    val hiB = BindReferences.bindReference(hi, build.output)
    // Build side: collect (bounded by contract), sort by lo, broadcast.
    val entries = build.executeCollect().map { r =>
      (loB.eval(r).asInstanceOf[Long], hiB.eval(r).asInstanceOf[Long], r.copy())
    }.sortBy(_._1)
    val maxLen = if (entries.isEmpty) 0L
                 else entries.iterator.map(e => e._2 - e._1).max
    metrics("buildRows").add(entries.length)
    val bc = sparkContext.broadcast((entries, maxLen))
    val keyB = BindReferences.bindReference(probeKey, probe.output)
    val outAttrs = output
    val outRows = metrics("numOutputRows")
    probe.execute().mapPartitions { iter =>
      val (arr, mlen) = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { row =>
        val p = keyB.eval(row).asInstanceOf[Long]
        // first index with lo > p (upper bound)
        var a = 0; var b = arr.length
        while (a < b) { val m = (a + b) >>> 1; if (arr(m)._1 <= p) a = m + 1 else b = m }
        var i = a - 1
        val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        // any interval containing p satisfies lo > p − maxLen: bounded walk
        while (i >= 0 && arr(i)._1 > p - mlen) {
          if (arr(i)._2 > p) buf += proj(joined(row, arr(i)._3)).copy()
          i -= 1
        }
        outRows.add(buf.length)
        buf.iterator
      }
    }
  }
}

/** Planner strategy: lowers the logical node 1:1 to the exec. Injected via
  * `injectPlannerStrategy` so it runs ahead of JoinSelection — but it only
  * ever fires on the dedicated node, never on generic Joins (explicit
  * opt-in keeps every other declared join's plan untouched). */
class RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, k, lo, hi) =>
      BroadcastRangeJoinExec(planLater(l), planLater(r), k, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Public constructor: resolves the three column names against the
  * ANALYZED child plans so the node is born resolved. */
object GraftRangeJoin {
  def apply(probe: org.apache.spark.sql.DataFrame,
            build: org.apache.spark.sql.DataFrame,
            keyCol: String, loCol: String, hiCol: String)
      : org.apache.spark.sql.DataFrame = {
    val lp = probe.queryExecution.analyzed
    val rp = build.queryExecution.analyzed
    def attr(pl: LogicalPlan, n: String): Attribute =
      pl.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${pl.output.map(_.name)}"))
    org.apache.spark.sql.GraftSqlShim.ofRows(probe.sparkSession,
      RangeJoinPlan(lp, rp, attr(lp, keyCol), attr(rp, loCol), attr(rp, hiCol)))
  }
}
