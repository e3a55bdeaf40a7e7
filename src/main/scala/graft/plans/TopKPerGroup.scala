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
  * No sort operator appears anywhere in the plan. Memory: the FINAL
  * phase holds O(groups-in-hash-partition · k) rows — bounded by the
  * shuffle's ClusteredDistribution, same class as a hash aggregate.
  * The PARTIAL phase sees arbitrary input partitions where EVERY
  * group may appear, so its map is capped at [[MaxPartialGroups]]
  * with emit-and-evict (LRU): an evicted group's current winners are
  * emitted immediately and the group restarts if seen again. The
  * partial phase only ever needs to emit a SUPERSET of each group's
  * winners — eviction trades combining efficiency, never
  * correctness (observed need: at the 100× probe, 500 k query groups
  * × 32 task-concurrent unmanaged heaps OOM'd a 24 g driver before
  * the cap). Semantics are identical to row_number + filter: with a
  * total (tie-broken) orderSpec the result is deterministic; with a
  * partial order, row_number is tie-arbitrary and so is the heap.
  * Registered via [[graft.GraftExtensions]]; rate_limit, ann_brute
  * and ann_lsh hit the pattern automatically.
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
      // max-heap per group: peek = worst of the k best seen so far;
      // LinkedHashMap iteration order = insertion order (LRU-ish for
      // the partial phase's emit-and-evict)
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      import scala.jdk.CollectionConverters._
      if (!isFinal) {
        // partial: bounded map — on overflow emit the eldest group's
        // current winners and retire it (a superset per group is fine,
        // the final phase reduces); emit remaining winners at end
        new Iterator[InternalRow] {
          private val pending = new java.util.ArrayDeque[InternalRow]()
          private var drained: java.util.Iterator[
            java.util.PriorityQueue[InternalRow]] = null
          private def fill(): Unit = {
            while (pending.isEmpty && drained == null) {
              if (iter.hasNext) {
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
                if (heaps.size() > TopKPerGroupExec.MaxPartialGroups) {
                  val it = heaps.entrySet().iterator()
                  val eldest = it.next()
                  it.remove()
                  eldest.getValue.forEach(r => pending.add(r))
                }
              } else {
                drained = heaps.values().iterator()
              }
            }
            while (pending.isEmpty && drained != null && drained.hasNext) {
              drained.next().forEach(r => pending.add(r))
            }
          }
          override def hasNext: Boolean = { fill(); !pending.isEmpty }
          override def next(): InternalRow = { fill(); pending.poll() }
        }
      } else {
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

object TopKPerGroupExec {
  /** Partial-phase group cap per task: ~32 k groups × (k+1) rows
    * (~tens of MB) regardless of how many distinct groups the input
    * partition carries. Above it the eldest group's winners are
    * emitted early — more shuffle rows, same answer.
    */
  val MaxPartialGroups = 1 << 15
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
