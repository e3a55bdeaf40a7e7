package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed k-gram fingerprints of a document (Schleimer et al. 2003,
  * the MOSS scheme) in ONE pass — value-identical to the SQL
  * formulation it replaces (and to the DuckDB oracle):
  *
  * {{{
  *   transform(sequence(1, greatest(length(txt)-k+1, 1)),
  *     i -> substr(md5(substr(txt, i, k)), 1, 8))       -- gram hashes
  *   CASE WHEN size(h) >= w THEN
  *     array_distinct(transform(sequence(1, size(h)-w+1),
  *       i -> array_min(slice(h, i, w))))               -- window mins
  *   ELSE array(array_min(h)) END
  * }}}
  *
  * The SQL tree costs one full `md5()` expression evaluation (with a
  * fresh digest and hex round trip) per CHARACTER of every document,
  * plus intermediate arrays for the gram list and every window slice.
  * Here each gram is digested once into a REUSED thread-local MD5
  * instance, the 8-hex-char prefix is kept as an unsigned 32-bit int
  * (lexicographic order on fixed-width lowercase hex == unsigned
  * numeric order, so `array_min` semantics are preserved exactly),
  * window minima are computed by a linear scan, and only the DISTINCT
  * minima are materialized as strings — first-occurrence order, like
  * `array_distinct`.
  *
  * Used by `fingerprint_winnow`, `dedup_winnow_pairs` and the
  * `dedup_keep` edge union (SURVEY §2E); equality with the SQL
  * formulation is asserted in FunctionsSpec, and all three gates hash
  * against oracles built on the SQL form.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.fps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFps.fps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def fps(txt: UTF8String, k: Int, w: Int): ArrayData = {
    val n = txt.numChars()
    // positions 1..max(n-k+1, 1): full-width grams, except the single
    // (whole-string) gram of a shorter-than-k document
    val numGrams = math.max(n - k + 1, 1)
    val digest = md5.get()
    // first 4 md5 bytes as an unsigned int held in a long: fixed-width
    // lowercase-hex string order == unsigned numeric order
    val hs = new Array[Long](numGrams)
    var i = 0
    while (i < numGrams) {
      digest.reset()
      val d = digest.digest(txt.substringSQL(i + 1, k).getBytes)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val mins = new java.util.LinkedHashSet[java.lang.Long]()
    if (numGrams >= w) {
      var s = 0
      while (s <= numGrams - w) {
        var m = hs(s)
        var j = s + 1
        while (j < s + w) { if (hs(j) < m) m = hs(j); j += 1 }
        mins.add(m)
        s += 1
      }
    } else {
      var m = hs(0)
      var j = 1
      while (j < numGrams) { if (hs(j) < m) m = hs(j); j += 1 }
      mins.add(m)
    }
    val out = new Array[AnyRef](mins.size())
    val it = mins.iterator()
    var o = 0
    while (it.hasNext) {
      val v = it.next().longValue()
      val cs = new Array[Byte](8)
      var b = 0
      while (b < 8) {
        cs(b) = HexChars(((v >>> ((7 - b) * 4)) & 0xf).toInt).toByte
        b += 1
      }
      out(o) = UTF8String.fromBytes(cs)
      o += 1
    }
    new GenericArrayData(out)
  }
}
