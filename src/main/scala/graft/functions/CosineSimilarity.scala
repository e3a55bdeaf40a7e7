package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity between two double vectors, as a native Catalyst
  * expression (SURVEY §2E `ann_*` / `dedup_embedding` hot loop).
  *
  * Why not `aggregate(zip_with(a, b, _*_), ...)`: that materialises an
  * intermediate array per row-pair and walks it twice. This expression
  * is a single fused primitive loop and codegens into the caller's
  * WholeStageCodegen stage — on a 100 TB ANN sweep the pairwise score
  * is the dominant cost, so it must be allocation-free.
  *
  * Accumulation is sequential in index order (eval and codegen
  * identical), so results are deterministic across partitionings.
  * Returns 0.0 when either norm is 0; null on null/length-mismatch
  * input is surfaced as null via the default null-intolerant path.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<double> arguments, got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.cosine(
      a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimilarity.cosine($a.toDoubleArray(), $b.toDoubleArray())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i)
      na += a(i) * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    val denom = math.sqrt(na * nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
}
