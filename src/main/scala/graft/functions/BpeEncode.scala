package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BYTE-level byte-pair-encoding of a whitespace-pre-tokenized string
  * against a fixed merge-rule list (Sennrich et al. 2016; byte
  * alphabet as in GPT-2): each word starts as its UTF-8 byte
  * sequence — bytes represented as uppercase hex pairs, the engine-
  * portable canonical form shared with the DuckDB oracle — then the
  * applicable merge with the LOWEST rank is applied at its leftmost
  * occurrence, repeatedly, until no merge applies; the per-word piece
  * sequences are concatenated in word order. Byte-level means no
  * input is out-of-vocabulary: unmergeable (e.g. non-ASCII) text
  * degrades to its raw byte pieces, never to a sentinel.
  *
  * This one-occurrence-at-a-time formulation is value-identical to
  * the textbook "merge every occurrence of the best pair, then
  * re-pick" loop: in any learned merge list, every pair containing a
  * merge's OUTPUT token must rank after that merge (the token does
  * not exist earlier), so after merging one occurrence of the
  * min-rank pair the min rank present is unchanged while that pair
  * survives — the same occurrences get merged in the same
  * left-to-right order. BpeSpec asserts the equivalence against an
  * independent merge-all-per-step implementation.
  *
  * Execution shape: the merge table rides the serialized expression
  * (rank-ordered hex-pair rules, bounded by the trainer's merge
  * budget — tens of KB worst case); evaluation is a pure per-row map
  * with a per-task-instance memo of word → pieces (the word domain is
  * Zipf-skewed, so the memo turns the per-word merge loop into a hash
  * probe for almost every occurrence). No shuffle, no broadcast round
  * trip, no driver participation — the operator scales with input
  * splits. CodegenFallback: the merge loop is data-dependent
  * iteration over a per-row token array; there is no profitable
  * whole-stage codegen form, and the memo makes the interpreted call
  * cheap.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // rank lookup and word memo are per-deserialized-instance (= per
  // task), transient so only the merge LIST ships
  @transient private lazy val ranks: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int](merges.size * 2)
    merges.iterator.zipWithIndex.foreach { case ((l, r), i) =>
      // first-listed rank wins for a duplicated pair (never produced
      // by the learner; defensive for hand-written lists)
      m.putIfAbsent(l + " " + r, i)
    }
    m
  }
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[String]](1 << 12)
  private val MemoCap = 1 << 16

  private def encodeWord(word: String): Array[String] = {
    val hit = memo.get(word)
    if (hit != null) return hit
    var toks = graft.pipeline.Bpe.hexTokens(word)
    var done = toks.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.getOrDefault(toks(j) + " " + toks(j + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        val next = new Array[String](toks.length - 1)
        System.arraycopy(toks, 0, next, 0, bestAt)
        next(bestAt) = toks(bestAt) + toks(bestAt + 1)
        System.arraycopy(toks, bestAt + 2, next, bestAt + 1,
          toks.length - bestAt - 2)
        toks = next
        done = toks.length < 2
      }
    }
    if (memo.size < MemoCap) memo.put(word, toks)
    toks
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(' ')
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val pieces = encodeWord(words(i))
        var j = 0
        while (j < pieces.length) {
          out += UTF8String.fromString(pieces(j)); j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {

  /** Merge-list wire format for the SQL-function form: rank-ordered
    * `"l r"` pairs joined by `';'` — tokens are hex strings, so
    * neither delimiter can occur inside one.
    */
  def serializeMerges(merges: Seq[(String, String)]): String =
    merges.map { case (l, r) => l + " " + r }.mkString(";")

  def parseMerges(s: String): Seq[(String, String)] =
    if (s.isEmpty) Seq.empty
    else s.split(';').toSeq.map { p =>
      val sp = p.indexOf(' ')
      require(sp > 0, s"malformed merge entry: '$p'")
      (p.substring(0, sp), p.substring(sp + 1))
    }
}
