package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are evaluated
  * by the interpreter — measured 30-100× slower than generated code on this
  * workload — so the dot product gets a real `Expression` with `doGenCode`:
  * a tight primitive loop over the two `ArrayData`, inlined into whole-stage
  * codegen (SURVEY §4.2's "custom expressions, small and optional" slot; the
  * reference has no numeric kernels at all).
  *
  * Semantics: strict left-to-right summation in ascending index order —
  * identical to the `aggregate(zip_with(...))` fold it replaces and to
  * DuckDB's `list_dot_product`, so oracle results are bit-for-bit unchanged.
  * Null inputs propagate null; element counts are not required to match
  * (the shorter length wins), and null elements are treated as 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product requires (array<double>, array<double>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED `ARRAY<BIGINT>` columns: a codegen'd
  * two-pointer merge — O(n+m) primitive long comparisons, no per-row hash
  * set. `array_intersect` is interpreted and hash-based; on the similarity
  * verify path (hundreds of thousands of candidate pairs × ~300-element
  * signature arrays) the merge is the difference between the verify stage
  * being free and being the bottleneck.
  *
  * Contract: both inputs ascending-sorted, null-free, duplicate-free (the
  * shape `sort_array(collect_list(...))` over distinct values produces).
  * Unsorted input silently undercounts — callers own the invariant, it is
  * not re-checked per row.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // containsNull=true is REJECTED at analysis time: the merge loop reads
    // elements with getLong (a null slot would silently read as 0 on unsafe
    // arrays), so the documented null-free contract must fail loudly here
    // rather than miscount at run time. sort_array(collect_list(...)) —
    // the shape callers use — declares containsNull=false.
    case (ArrayType(LongType, false), ArrayType(LongType, false)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires null-free (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var (i, j) = (0, 0)
    var c = 0L
    while (i < n && j < m) {
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  long $u = $a.getLong($i);
         |  long $v = $b.getLong($j);
         |  if ($u == $v) { $c++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product of two `ARRAY<DOUBLE>` columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd merge-intersection count of two sorted `ARRAY<BIGINT>`s. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
