package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen dot product over two array<double> columns — the SURVEY
  * §7.4 stretch `Expression`. Whole-stage codegen emits a primitive loop
  * (identical float op order to the declarative
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` fold, so results are
  * bit-identical), instead of Catalyst's interpreted per-element HOF path.
  *
  * Null semantics match the declarative fold: unequal-length inputs return
  * NULL (zip_with null-pads the shorter side, and `null * x` poisons the
  * fold). Array ELEMENTS are required non-null (embedding vectors) — a null
  * slot would make the fold NULL; the loop assumes packed doubles.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // (covariant override: AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // also null when lengths differ
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering `graft_dot` (usable from SQL and `expr`).
  * Production: `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    // Spark's runtime-filter bloom expressions, surfaced as callable
    // functions (upstream registers bloom_filter_agg/might_contain for the
    // InjectRuntimeFilter rule only, not the public registry). The value is
    // xxhash64-folded to LONG here so callers pass the raw column. This is
    // the manual build-side-bloom → probe-side-prefilter pattern for semi
    // joins whose build side fits a sketch but not a broadcast hash table.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(children.take(1)))
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head,
          new org.apache.spark.sql.catalyst.expressions.XxHash64(children.slice(1, 2)))))
    ext.injectOptimizerRule(_ => RewriteIntersectSize)
    // Whole-operator extension (ladder rung (c)): the broadcast range-join
    // LogicalPlan/SparkStrategy/SparkPlan triple — see plans/RangeJoin.scala.
    ext.injectPlannerStrategy(_ => new RangeJoinStrategy)
  }
}
