package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `h = (h * 257 + byte) mod 1_000_000_007`.
  *
  * Document fingerprinting primitive (SURVEY §2E `fingerprint`) — the
  * rolling form means a 100 TB pipeline can extend it to shingle /
  * content-defined-chunking fingerprints without rehashing from
  * scratch. Implemented as a native Catalyst expression with codegen
  * so it stays inside WholeStageCodegen (no UDF serialization, no
  * boxing per row).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Mod: Long = 1000000007L
  val Base: Long = 257L

  /** Shared by interpreted eval, codegen, and tests. */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < b.length) {
      h = (h * Base + (b(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  def hash(s: String): Long = hashBytes(s.getBytes("UTF-8"))
}
