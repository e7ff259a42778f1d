package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, ExpectsInputTypes, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** `|A ∩ B|` over two string arrays WITHOUT materializing the intersection
  * array — replaces the `size(array_intersect(a, b))` pattern, which builds
  * an intermediate ArrayData per row only to count it. Distinct-element
  * semantics match ArrayIntersect (each left element counts once if present
  * in the right side; inputs here are pre-deduped token/shingle sets).
  * Codegen emits a nested loop — O(|a|·|b|) with zero allocation, which
  * beats hash-set construction for the short arrays this engine feeds it.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    while (i < x.numElements()) {
      val xi = x.getUTF8String(i)
      var seenBefore = false
      var k = 0
      while (k < i && !seenBefore) { // count each distinct left element once
        if (x.getUTF8String(k) == xi || x.getUTF8String(k).equals(xi)) seenBefore = true
        k += 1
      }
      if (!seenBefore) {
        var j = 0
        var found = false
        while (j < y.numElements() && !found) {
          if (y.getUTF8String(j).equals(xi)) found = true
          j += 1
        }
        if (found) cnt += 1
      }
      i += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val cnt = ctx.freshName("cnt"); val xi = ctx.freshName("xi")
      val seen = ctx.freshName("seen"); val found = ctx.freshName("found")
      s"""
         |int $cnt = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  UTF8String $xi = $a.getUTF8String($i);
         |  boolean $seen = false;
         |  for (int $k = 0; $k < $i && !$seen; $k++) {
         |    if ($a.getUTF8String($k).equals($xi)) $seen = true;
         |  }
         |  if (!$seen) {
         |    boolean $found = false;
         |    for (int $j = 0; $j < $b.numElements() && !$found; $j++) {
         |      if ($b.getUTF8String($j).equals($xi)) $found = true;
         |    }
         |    if ($found) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Injected optimizer rule (`injectOptimizerRule` in [[GraftExtensions]]):
  * rewrites `size(array_intersect(a, b))` on string arrays into
  * [[IntersectSize]] so the intersection array is never built. */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ArrayIntersect(a, b), _)
        if a.dataType == ArrayType(StringType, containsNull = false) &&
           b.dataType == ArrayType(StringType, containsNull = false) &&
           s.dataType == IntegerType =>
      IntersectSize(a, b)
  }
}
