package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class physical operator.
  *
  * The declarative idiom for "top k rows per group" is
  * {{{ df.withColumn("rn", row_number().over(W)).filter($"rn" <= k) }}}
  * which Spark plans as partial/final WindowGroupLimit — each phase
  * SORTING its input (O(n log n), sort buffers, spill risk) — plus a
  * WindowExec. [[TopKPerGroupStrategy]] recognises the
  * Filter(rn ≤ k, Window(row_number() over (partition, order)))
  * pattern and plans two heap phases instead:
  *
  *  - Partial (map-side, before the shuffle): k row-copies per group
  *    per input partition — bounds shuffle volume exactly like Spark's
  *    partial WindowGroupLimit, but O(n log k) with no sort.
  *  - Final (after one shuffle on the partition keys): merges the
  *    partial winners, emits each group ascending with the rank
  *    attribute attached.
  *
  * No sort operator appears anywhere in the plan; memory is
  * O(groups·k) per task. Semantics are identical to row_number +
  * filter: with a total (tie-broken) orderSpec the result is
  * deterministic; with a partial order, row_number is tie-arbitrary
  * and so is the heap. Registered via [[graft.GraftExtensions]];
  * rate_limit, ann_brute and ann_lsh hit the pattern automatically.
  */
case class TopKPerGroupExec(
    k: Int,
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rnAttr: Attribute,
    finalPhase: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (finalPhase) child.output :+ rnAttr else child.output

  // rnAttr is carried in both phases (emitted only by the final one);
  // declaring it produced keeps it out of missingInput accounting
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (!finalPhase) UnspecifiedDistribution :: Nil
    else if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val childOutput = child.output
    val part = partitionSpec
    val order = orderSpec
    val isFinal = finalPhase
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(part, childOutput)
      val ordering = new LazilyGeneratedOrdering(order, childOutput)
      // max-heap per group: peek = worst of the k best seen so far
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1,
            ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      if (!isFinal) {
        // partial: emit the per-partition winners, order irrelevant
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      } else {
        val outProj = UnsafeProjection.create(
          (childOutput :+ rnAttr).map(_.dataType).toArray)
        val joined = new JoinedRow
        val rnRow = new GenericInternalRow(1)
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = new Array[InternalRow](heap.size())
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
          rows.iterator.zipWithIndex.map { case (r, idx) =>
            rnRow.setInt(0, idx + 1)
            outProj(joined(r, rnRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

case class TopKPerGroupStrategy(spark: SparkSession) extends SparkStrategy {

  /** `rn <= lit` / `rn < lit` / `rn = 1` over the window's row_number
    * attribute → the bound k.
    */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) && v == 1 => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
          partitionSpec, orderSpec, child0, _))
        if spec.partitionSpec == partitionSpec &&
          spec.orderSpec == orderSpec =>
      limitOf(cond, alias.toAttribute) match {
        case Some(kk) if kk >= 1 =>
          // the optimizer may already have inserted its sort-based
          // partial WindowGroupLimit below the Window — strip it, the
          // heap phases replace it entirely
          val source = child0 match {
            case wgl: WindowGroupLimit
              if wgl.partitionSpec == partitionSpec &&
                wgl.orderSpec == orderSpec => wgl.child
            case other => other
          }
          val partial = TopKPerGroupExec(kk, partitionSpec, orderSpec,
            alias.toAttribute, finalPhase = false, planLater(source))
          TopKPerGroupExec(kk, partitionSpec, orderSpec,
            alias.toAttribute, finalPhase = true, partial) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}
