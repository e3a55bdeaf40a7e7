package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature of a shingle set in one pass (SURVEY §2E
  * `dedup_minhash`): each shingle's bytes are hashed ONCE
  * (xxh64-style avalanche), then `numPerm` permutations are derived
  * with per-permutation mixing — versus composing
  * `transform(sh, s -> xxhash64(s, i))` per permutation, which hashes
  * every string numPerm times and allocates numPerm intermediate
  * arrays per row. For 32 permutations this is the difference between
  * 32 string traversals and 1 per shingle.
  *
  * Returns array<long> of length `numPerm` (min over shingles per
  * permutation); empty input yields Long.MaxValue entries.
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSignature.signature($c, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** 64-bit avalanche of a byte string (FNV-ish accumulate + splitmix
    * finaliser) — deterministic across JVMs, cheap, and only computed
    * once per shingle.
    */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  @inline private def mix(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signature(arr: ArrayData, numPerm: Int): ArrayData = {
    val out = Array.fill(numPerm)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = hashBytes(arr.getUTF8String(i).getBytes)
      var p = 0
      while (p < numPerm) {
        // permutation p: remix with a p-dependent odd multiplier
        val hp = mix(h ^ (0x9e3779b97f4a7c15L * (p + 1)))
        if (hp < out(p)) out(p) = hp
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
