package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split a string at positions where a
  * rolling hash over a sliding window hits a boundary condition, and
  * return the [[RollingHash]] fingerprint of each chunk
  * (array<long>).
  *
  * Because boundaries depend on CONTENT, not offsets, an insertion
  * early in a document only changes the chunks it touches — chunk
  * fingerprints from two near-identical documents mostly coincide.
  * That makes `explode(cdc_chunks(text))` + groupBy the standard
  * partial-duplicate / common-passage detector for training corpora
  * (the chunk-hash inverted index), complementing whole-document
  * [[RollingHash]] fingerprints and shingle-based MinHash.
  *
  * Parameters: window of 16 bytes, boundary when
  * `windowHash % divisor == divisor - 1` (expected chunk ≈ divisor
  * bytes), chunks bounded to [minSize, maxSize].
  */
case class CdcChunks(child: Expression, divisor: Int, minSize: Int, maxSize: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String].getBytes,
      divisor, minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunks.chunks($c.getBytes(), $divisor, $minSize, $maxSize)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val Window = 16

  /** Boundary positions by a Rabin-style rolling window hash; chunk
    * content hashed with [[RollingHash.hashBytes]] over each slice.
    */
  def chunks(b: Array[Byte], divisor: Int, minSize: Int, maxSize: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var h = 0L
    var i = 0
    while (i < b.length) {
      // true sliding window: h is the degree-(Window-1) polynomial of
      // exactly the last `Window` bytes of the current chunk (mod 2^64);
      // the leaving byte's contribution is 33^Window after this step's
      // multiply. Content-local by construction, so boundaries re-sync
      // after an edit once the window clears it.
      h = h * 33 + (b(i) & 0xff)
      if (i - start >= Window)
        h -= (b(i - Window) & 0xffL) * Pow33Window
      val len = i - start + 1
      val boundary = len >= minSize &&
        (java.lang.Long.remainderUnsigned(h, divisor) == divisor - 1 ||
          len >= maxSize)
      if (boundary) {
        out += sliceHash(b, start, i + 1)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < b.length) out += sliceHash(b, start, b.length)
    new GenericArrayData(out.toArray)
  }

  private val Pow33Window: Long = {
    var p = 1L
    (0 until Window).foreach(_ => p *= 33)
    p
  }

  private def sliceHash(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      h = (h * RollingHash.Base + (b(i) & 0xff)) % RollingHash.Mod
      i += 1
    }
    h
  }
}
