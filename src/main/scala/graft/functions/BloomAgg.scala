package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A fixed-size Bloom filter as a custom aggregate (SURVEY §2B/E
  * snapshot point-lookup skipping): folds a column into an m-bit
  * filter with k double-hashed probes per value, so
  * `groupBy(file).agg(bloom_agg(col))` builds every file's membership
  * index in ONE distributed scan — the shape
  * [[graft.sources.SnapshotStats]] needs to embed per-file blooms in
  * the manifest, where zone maps (range bounds) are useless because
  * the column is high-cardinality and unclustered.
  *
  * Why a `TypedImperativeAggregate`: Spark's built-in
  * `DataFrameStatFunctions.bloomFilter` aggregates a whole DataFrame
  * to ONE filter on the driver; the manifest needs one PER FILE, i.e.
  * a grouped aggregate with map-side partial merge (bitwise OR — the
  * Bloom merge is exact, so the result is independent of Spark's merge
  * tree). The buffer is a flat `Array[Long]`; update/merge allocate
  * nothing.
  *
  * Determinism: the probe positions come from a splitmix64 double
  * hash ([[BloomAgg.probe]]) shared verbatim with the PLANNER side
  * ([[BloomAgg.mayContain]]), so a bloom built by an executor and
  * probed by the driver agree bit-for-bit. Strings hash through
  * FNV-1a 64 of their UTF-8 bytes first; nulls are skipped (a null is
  * never a point-lookup key).
  *
  * False positives only ever KEEP a file (the lookup read re-applies
  * the real predicate), so sizing is purely a cost knob: m bits for n
  * distinct values gives ~(1−e^{−kn/m})^k false-positive rate — the
  * caller records (m, k) in the table's maintenance tag and pays
  * m/8 bytes per file of manifest.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0,
    "bloom_agg numBits must be a positive multiple of 64")
  require(numHashes > 0 && numHashes <= 16,
    "bloom_agg numHashes must be in [1, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_agg requires a bigint or string key, got $other")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long => l.longValue()
        case s: UTF8String => BloomAgg.fnv64(s.getBytes)
      }
      BloomAgg.set(buf, key, numBits, numHashes)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def serialize(buf: Array[Long]): Array[Byte] =
    eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {

  /** splitmix64 finalizer — the statistically-solid 64-bit mixer
    * (Steele et al., "Fast Splittable Pseudorandom Number
    * Generators", OOPSLA'14); used for both probe hashes.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over raw bytes — string keys reduce to a long key
    * first, then double-hash like native longs.
    */
  def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xFFL
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** The i-th probe position for a key — double hashing
    * `(h1 + i·h2) mod m` with h2 forced odd (full-period stride on the
    * power-of-two-free modulus). Shared by build ([[set]]) and probe
    * ([[mayContain]]).
    */
  private def probe(key: Long, i: Int, numBits: Int): Int = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851F42D4C957F2DL) | 1L
    java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
  }

  private def set(buf: Array[Long], key: Long, numBits: Int,
                  numHashes: Int): Unit = {
    var i = 0
    while (i < numHashes) {
      val pos = probe(key, i, numBits)
      buf(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Planner-side membership probe over the serialized filter bytes
    * ([[BloomAgg.eval]]'s layout: big-endian longs). `false` is exact
    * (the key was never added); `true` is "maybe".
    */
  def mayContain(bytes: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val numBits = bytes.length * 8
    var i = 0
    while (i < numHashes) {
      val pos = probe(key, i, numBits)
      val word = java.nio.ByteBuffer.wrap(bytes, (pos >>> 6) * 8, 8).getLong
      if ((word & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** String keys reduce through [[fnv64]] of UTF-8 bytes. */
  def mayContain(bytes: Array[Byte], key: String, numHashes: Int): Boolean =
    mayContain(bytes, fnv64(key.getBytes("UTF-8")), numHashes)
}
