package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, ExpectsInputTypes, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `|A ∩ B|` over two string arrays WITHOUT materializing the intersection
  * array — replaces the `size(array_intersect(a, b))` pattern, which builds
  * an intermediate ArrayData per row only to count it. Distinct-element
  * semantics match ArrayIntersect (each left element counts once if present
  * in the right side; inputs here are pre-deduped token/shingle sets).
  *
  * Two evaluation paths, chosen per row at runtime with an O(n) probe:
  *   - both inputs strictly increasing (the layout `sort_array ∘
  *     array_distinct` produces) → two-pointer merge count, O(n + m). This
  *     is what makes exact LSH verification affordable: ~300-element shingle
  *     sets cost ~600 comparisons per pair instead of ~90,000.
  *   - otherwise → nested loop with left-side dedup, O(n·m), zero
  *     allocation — still beats hash-set construction for short arrays.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size"

  private def strictlyIncreasing(x: ArrayData): Boolean = {
    var i = 1
    while (i < x.numElements()) {
      if (x.getUTF8String(i - 1).compareTo(x.getUTF8String(i)) >= 0) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strictlyIncreasing(x) && strictlyIncreasing(y)) {
      // sorted-unique fast path: two-pointer merge
      var i = 0; var j = 0; var cnt = 0
      while (i < x.numElements() && j < y.numElements()) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      cnt
    } else {
      var cnt = 0
      var i = 0
      while (i < x.numElements()) {
        val xi = x.getUTF8String(i)
        var seenBefore = false
        var k = 0
        while (k < i && !seenBefore) { // count each distinct left element once
          if (x.getUTF8String(k).equals(xi)) seenBefore = true
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
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val cnt = ctx.freshName("cnt"); val xi = ctx.freshName("xi")
      val seen = ctx.freshName("seen"); val found = ctx.freshName("found")
      val sorted = ctx.freshName("sorted"); val c = ctx.freshName("c")
      s"""
         |int $cnt = 0;
         |boolean $sorted = true;
         |for (int $i = 1; $sorted && $i < $a.numElements(); $i++) {
         |  if ($a.getUTF8String($i - 1).compareTo($a.getUTF8String($i)) >= 0) $sorted = false;
         |}
         |for (int $i = 1; $sorted && $i < $b.numElements(); $i++) {
         |  if ($b.getUTF8String($i - 1).compareTo($b.getUTF8String($i)) >= 0) $sorted = false;
         |}
         |if ($sorted) {
         |  int $i = 0; int $j = 0;
         |  while ($i < $a.numElements() && $j < $b.numElements()) {
         |    int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($c == 0) { $cnt++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |} else {
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    UTF8String $xi = $a.getUTF8String($i);
         |    boolean $seen = false;
         |    for (int $k = 0; $k < $i && !$seen; $k++) {
         |      if ($a.getUTF8String($k).equals($xi)) $seen = true;
         |    }
         |    if (!$seen) {
         |      boolean $found = false;
         |      for (int $j = 0; $j < $b.numElements() && !$found; $j++) {
         |        if ($b.getUTF8String($j).equals($xi)) $found = true;
         |      }
         |      if ($found) $cnt++;
         |    }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

/** [[IntersectSize]]'s sibling for `array<bigint>` inputs — the interned-
  * gram layout `lshJaccardPairs` verifies on (r13, verdict #6): every
  * element access is a flat primitive `getLong` and every comparison a
  * branch on two longs, so the sorted-unique merge path runs with zero
  * object churn (the string form pays a UTF8String wrapper + byte-wise
  * compareTo per visited element). Same distinct-element semantics, same
  * two evaluation paths, same null contract. */
case class IntersectSizeLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size_long"

  private def strictlyIncreasing(x: ArrayData): Boolean = {
    var i = 1
    while (i < x.numElements()) {
      if (x.getLong(i - 1) >= x.getLong(i)) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strictlyIncreasing(x) && strictlyIncreasing(y)) {
      var i = 0; var j = 0; var cnt = 0
      while (i < x.numElements() && j < y.numElements()) {
        val xi = x.getLong(i); val yj = y.getLong(j)
        if (xi == yj) { cnt += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
      cnt
    } else {
      var cnt = 0
      var i = 0
      while (i < x.numElements()) {
        val xi = x.getLong(i)
        var seenBefore = false
        var k = 0
        while (k < i && !seenBefore) {
          if (x.getLong(k) == xi) seenBefore = true
          k += 1
        }
        if (!seenBefore) {
          var j = 0
          var found = false
          while (j < y.numElements() && !found) {
            if (y.getLong(j) == xi) found = true
            j += 1
          }
          if (found) cnt += 1
        }
        i += 1
      }
      cnt
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val cnt = ctx.freshName("cnt"); val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val seen = ctx.freshName("seen"); val found = ctx.freshName("found")
      val sorted = ctx.freshName("sorted")
      s"""
         |int $cnt = 0;
         |boolean $sorted = true;
         |for (int $i = 1; $sorted && $i < $a.numElements(); $i++) {
         |  if ($a.getLong($i - 1) >= $a.getLong($i)) $sorted = false;
         |}
         |for (int $i = 1; $sorted && $i < $b.numElements(); $i++) {
         |  if ($b.getLong($i - 1) >= $b.getLong($i)) $sorted = false;
         |}
         |if ($sorted) {
         |  int $i = 0; int $j = 0;
         |  while ($i < $a.numElements() && $j < $b.numElements()) {
         |    long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |    if ($xi == $yj) { $cnt++; $i++; $j++; }
         |    else if ($xi < $yj) { $i++; } else { $j++; }
         |  }
         |} else {
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    long $xi = $a.getLong($i);
         |    boolean $seen = false;
         |    for (int $k = 0; $k < $i && !$seen; $k++) {
         |      if ($a.getLong($k) == $xi) $seen = true;
         |    }
         |    if (!$seen) {
         |      boolean $found = false;
         |      for (int $j = 0; $j < $b.numElements() && !$found; $j++) {
         |        if ($b.getLong($j) == $xi) $found = true;
         |      }
         |      if ($found) $cnt++;
         |    }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectSizeLong =
    copy(left = newLeft, right = newRight)
}

/** Injected optimizer rule (`injectOptimizerRule` in [[GraftExtensions]]):
  * rewrites `size(array_intersect(a, b))` on string or long arrays into
  * [[IntersectSize]] / [[IntersectSizeLong]] so the intersection array is
  * never built. Only fires when `legacySizeOfNull` is false: under
  * `spark.sql.legacy.sizeOfNull=true`, `size(NULL)` is -1 while the
  * null-safe IntersectSize would return NULL — a silent semantics change. */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ArrayIntersect(a, b), false)
        if a.dataType == ArrayType(StringType, containsNull = false) &&
           b.dataType == ArrayType(StringType, containsNull = false) &&
           s.dataType == IntegerType =>
      IntersectSize(a, b)
    case s @ Size(ArrayIntersect(a, b), false)
        if a.dataType == ArrayType(LongType, containsNull = false) &&
           b.dataType == ArrayType(LongType, containsNull = false) &&
           s.dataType == IntegerType =>
      IntersectSizeLong(a, b)
  }
}
