package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a custom aggregate (SURVEY
  * §2E `heavy_hitters`): a capacity-bounded counter map over a stream
  * of items, with the classic deterministic guarantee that every item
  * whose true frequency exceeds N/(capacity+1) is present in the
  * summary, and each surviving counter under-counts its item by at
  * most N/(capacity+1) — REGARDLESS of input order or how partial
  * buffers are merged.
  *
  * Why a `TypedImperativeAggregate`: the exact alternative is
  * `groupBy(item).count()` — a shuffle keyed by the FULL item domain,
  * which at 100 TB (token or n-gram vocabularies in the billions) IS
  * the cost. This aggregate keeps one bounded map per partial buffer,
  * gets map-side partial aggregation for free, and its `merge` is the
  * mergeable-summaries rule (Agarwal et al., "Mergeable Summaries",
  * PODS'12): pointwise-add the two maps, then subtract the
  * (capacity+1)-th largest counter from every entry and drop the
  * non-positive ones — the additive error bounds compose, so the
  * guarantee survives Spark's arbitrary merge tree.
  *
  * The counter VALUES depend on merge order (only the guarantee is
  * order-free), so queries must treat the output as a candidate set
  * and re-count exactly — see `TextAnalysis.heavyHitters`, which
  * semi-joins the corpus against these candidates and aggregates only
  * the survivors (tiny shuffle), never the full domain.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity > 0, "misra_gries capacity must be positive")

  private type Buf = java.util.HashMap[String, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string item, got ${child.dataType}")

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size < capacity) buf.put(s, 1L)
      else {
        // counter exhaustion: decrement every counter, dropping zeros
        // (the unmatched item is charged against one unit of all
        // capacity counters — the source of the N/(cap+1) bound)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val bi = b.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything;
      // at most `capacity` entries can remain strictly positive
      val vals = new Array[Long](a.size)
      var i = 0
      val vi = a.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - capacity - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - sub
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    // deterministic presentation order: estimate DESC, item ASC
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(entries,
      (x: (String, Long), y: (String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    new GenericArrayData(entries.map { case (k, v) =>
      InternalRow(UTF8String.fromString(k), v)
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
