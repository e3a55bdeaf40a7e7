package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All LSH bucket ids for a vector in ONE pass: for each of `tables`
  * hash tables, the `bits`-bit random-hyperplane signature
  * (bit j = sign of ⟨v, h_{t,j}⟩), returned as array<int> of length
  * `tables` (SURVEY §2E `ann_lsh`).
  *
  * Why an expression: composing this from `cosine_sim` columns means
  * tables×bits separate expression evaluations per row, each
  * re-copying the vector — the signature build was the ANN sweep's
  * bottleneck. Here the vector is copied once and all tables×bits×dim
  * multiply-adds run in a single fused loop.
  *
  * Hyperplane components are deterministic ±1 (splitmix64 avalanche of
  * (table, bit, dim)), precomputed per (tables, bits, dim) and cached —
  * the same matrix on every executor, no broadcast needed.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.buckets(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBuckets.buckets($c, $tables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {

  /** Deterministic ±1 hyperplane component for (table, bit, dim) —
    * splitmix64-style avalanche, reproducible everywhere.
    */
  def sign(table: Int, bit: Int, dim: Int): Double = {
    var z = table.toLong * 1000003L + bit.toLong * 8191L + dim.toLong +
      0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  // sign matrix cache: (tables, bits, dim) → [t*bits+j][d]
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def matrix(tables: Int, bits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((tables, bits, dim), { _ =>
      Array.tabulate(tables * bits) { tj =>
        Array.tabulate(dim)(d => sign(tj / bits, tj % bits, d))
      }
    })

  /** Called from both interpreted eval and generated code. */
  def buckets(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val x = v.toDoubleArray()
    val m = matrix(tables, bits, x.length)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val h = m(t * bits + j)
        var dot = 0.0
        var d = 0
        while (d < x.length) { dot += x(d) * h(d); d += 1 }
        if (dot > 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
