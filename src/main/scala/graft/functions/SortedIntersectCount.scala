package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** |A ∩ B| for two SORTED string arrays, as a single codegen'd merge —
  * the inner loop of n-gram Jaccard dedup (SURVEY §2E `dedup_ngram`).
  *
  * Spark's `array_intersect` builds a hash set per invocation; on a
  * blocked self-join that is O(pairs × set-build). Sorting each
  * document's shingle set ONCE (array_sort in the projection, before
  * the join) turns every pairwise intersection into an allocation-free
  * O(n+m) merge. Inputs must be sorted ascending and duplicate-free
  * (array_sort ∘ array_distinct guarantees both).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStringArray(t: DataType): Boolean = t match {
    case ArrayType(_: StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires array<string> arguments, got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** `|A ∩ B| >= needed` with two-sided early exit. */
  def atLeast(a: ArrayData, b: ArrayData, needed: Int): Boolean = {
    if (needed <= 0) return true
    val na = a.numElements()
    val nb = b.numElements()
    if (math.min(na, nb) < needed) return false
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) {
        c += 1
        if (c >= needed) return true
        i += 1; j += 1
      }
      else if (cmp < 0) i += 1
      else j += 1
      if (c + math.min(na - i, nb - j) < needed) return false
    }
    false
  }

  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** Early-exit threshold test `|A ∩ B| >= needed` over the same sorted
  * arrays — the verify-side companion of [[SortedIntersectCount]].
  * The merge aborts as soon as the count reaches `needed` (true) or
  * the remaining elements cannot reach it (false): near-identical
  * pairs stop at ~needed matches, false candidates stop at the first
  * length-bound violation — both far short of the full O(n+m) merge
  * the count expression pays. Survivor projections still use the
  * exact count; this expression only decides the filter, so results
  * are bit-identical to the `count >= needed` inequality.
  */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
                                  third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  private def isStringArray(t: DataType): Boolean = t match {
    case ArrayType(_: StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(first.dataType) && isStringArray(second.dataType) &&
      third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_atleast requires (array<string>, array<string>, " +
        s"int), got ${first.dataType} / ${second.dataType} / ${third.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "sorted_intersect_atleast"

  override def nullSafeEval(a: Any, b: Any, n: Any): Any =
    SortedIntersectCount.atLeast(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, n) =>
      s"graft.functions.SortedIntersectCount.atLeast($a, $b, $n)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SortedIntersectAtLeast =
    copy(first = f, second = s, third = t)
}
