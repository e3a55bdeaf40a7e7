package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.LogView

/** One parsed `LOG_RECORD` datagram — the wire subset of the log
  * schema (the packet stream carries no event_id/user_id/value, like
  * the JSONL wire format). Optional attributes surface as None/NULL.
  */
case class LogRecordPacket(
    timestamp: Option[Long],
    site: Option[String],
    host: Option[String],
    generator: Option[String],
    analytics_id: Option[String],
    forwarded_to: Option[String],
    remote_host: Option[String],
    `type`: Option[String],
    method: Option[String],
    uri: Option[String],
    referer: Option[String],
    user_agent: Option[String],
    status: Option[Int],
    length: Option[Long],
    content_type: Option[String],
    duration_us: Option[Long],
    traffic_sent: Option[Long],
    traffic_received: Option[Long],
    message: Option[String])

/** Binary log-record packet codec — the `inject` ingestion path
  * (reference doc/index.rst:410-425, src/client/Main.cxx:608-622):
  * pond's client reads `LOG_RECORD` packets (e.g. captured with
  * `--raw`) and replays them into the server.
  *
  * Framing is the reference's own `PondHeader` (reference
  * src/Protocol.hxx:199-223): `{id:u16, command:u16, size:u16}`
  * big-endian, followed by `size` payload bytes; a `LOG_RECORD`
  * payload (Protocol.hxx:182-185) is one serialized log record. The
  * record layout follows the net/log protocol's documented design —
  * a magic word, then single-byte-tagged attributes (strings
  * NUL-terminated, integers big-endian), then a trailing CRC-32 of
  * the attribute bytes. The upstream `net/log/Protocol.hxx` header is
  * not vendored in the reference tree, so the tag/magic VALUES below
  * are this engine's own assignment, kept in one table: adapting to a
  * real capture is a constant swap, and the round-trip gate pins
  * writer↔reader agreement regardless.
  *
  * Malformed payloads (bad magic, CRC mismatch, truncated attribute)
  * are DROPPED, not fatal — the reference's receiver counts and skips
  * malformed datagrams (src/Receiver.cxx:28-43). A drop is still
  * gate-visible as a row-count mismatch.
  */
object DatagramCodec {

  /** PondResponseCommand::LOG_RECORD (reference src/Protocol.hxx:185). */
  val LogRecordCommand = 3

  /** Record-payload magic word ("GLR1" — graft log record v1). */
  val Magic = 0x474c5231

  // attribute tags, one byte each
  private val TTimestamp = 1 // u64 epoch-µs
  private val TRemoteHost = 2 // string
  private val TForwardedTo = 3 // string
  private val THost = 4 // string
  private val TSite = 5 // string
  private val TMethod = 6 // u8, table below
  private val TUri = 7 // string
  private val TReferer = 8 // string
  private val TUserAgent = 9 // string
  private val TStatus = 10 // u16
  private val TLength = 11 // u64
  private val TTraffic = 12 // u64 received, u64 sent
  private val TDuration = 13 // u64 µs
  private val TType = 14 // u8, table below
  private val TMessage = 15 // string
  private val TContentType = 16 // string
  private val TAnalyticsId = 17 // string
  private val TGenerator = 18 // string

  private val methodToByte: Map[String, Byte] = Map(
    "GET" -> 1, "HEAD" -> 2, "POST" -> 3, "PUT" -> 4, "DELETE" -> 5,
    "OPTIONS" -> 6, "TRACE" -> 7, "PATCH" -> 8, "CONNECT" -> 9)
  private val byteToMethod: Map[Byte, String] = methodToByte.map(_.swap)

  private val typeToByte: Map[String, Byte] = Map(
    "http_access" -> 1, "http_error" -> 2, "submission" -> 3,
    "ssh" -> 4, "job" -> 5)
  private val byteToType: Map[Byte, String] = typeToByte.map(_.swap)

  /** Serialize one record into a framed packet (header + payload). */
  def serialize(r: LogRecordPacket, id: Int = 1): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = body.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def u32(v: Long): Unit = { u16((v >>> 16).toInt); u16(v.toInt) }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v) }
    // strings are NUL-terminated on the wire, so an embedded NUL would
    // truncate on parse and desync every following attribute — reject
    // at write time rather than round-trip corrupted
    def str(tag: Int, s: String): Unit = {
      require(s.indexOf('\u0000') < 0, s"NUL byte in string attribute $tag")
      u8(tag); body.write(s.getBytes(UTF_8)); u8(0)
    }
    // enum attributes must fail fast, not silently round-trip to NULL
    def enum8(tag: Int, table: Map[String, Byte], v: String): Unit = {
      val b = table.getOrElse(v, throw new IllegalArgumentException(
        s"value '$v' has no wire encoding for attribute $tag"))
      u8(tag); u8(b)
    }
    u32(Magic.toLong & 0xffffffffL)
    val crcFrom = body.size()
    r.timestamp.foreach { v => u8(TTimestamp); u64(v) }
    r.remote_host.foreach(str(TRemoteHost, _))
    r.forwarded_to.foreach(str(TForwardedTo, _))
    r.host.foreach(str(THost, _))
    r.site.foreach(str(TSite, _))
    r.generator.foreach(str(TGenerator, _))
    r.analytics_id.foreach(str(TAnalyticsId, _))
    r.method.foreach(enum8(TMethod, methodToByte, _))
    r.uri.foreach(str(TUri, _))
    r.referer.foreach(str(TReferer, _))
    r.user_agent.foreach(str(TUserAgent, _))
    r.status.foreach { v => u8(TStatus); u16(v) }
    r.length.foreach { v => u8(TLength); u64(v) }
    if (r.traffic_received.isDefined || r.traffic_sent.isDefined) {
      u8(TTraffic)
      u64(r.traffic_received.getOrElse(0L))
      u64(r.traffic_sent.getOrElse(0L))
    }
    r.duration_us.foreach { v => u8(TDuration); u64(v) }
    r.`type`.foreach(enum8(TType, typeToByte, _))
    r.content_type.foreach(str(TContentType, _))
    r.message.foreach(str(TMessage, _))
    val attrs = body.toByteArray
    val crc = new CRC32
    crc.update(attrs, crcFrom, attrs.length - crcFrom)
    u32(crc.getValue)
    val payload = body.toByteArray
    require(payload.length <= 0xffff,
      s"record payload ${payload.length} exceeds u16 frame size")
    val out = ByteBuffer.allocate(6 + payload.length)
    out.putShort(id.toShort)
    out.putShort(LogRecordCommand.toShort)
    out.putShort(payload.length.toShort)
    out.put(payload)
    out.array()
  }

  /** Parse a packet-stream buffer (one capture file) into records.
    * Non-LOG_RECORD packets are passed over; malformed payloads and a
    * truncated trailing packet are dropped like the reference's
    * receiver drops malformed datagrams.
    */
  def parse(buf: Array[Byte]): Iterator[LogRecordPacket] =
    new Iterator[LogRecordPacket] {
      private var off = 0
      private var nextRec: LogRecordPacket = _
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && off + 6 <= buf.length) {
          val bb = ByteBuffer.wrap(buf, off, buf.length - off)
          bb.getShort() // transaction id — irrelevant to ingestion
          val cmd = bb.getShort() & 0xffff
          val size = bb.getShort() & 0xffff
          if (off + 6 + size > buf.length) { off = buf.length } // truncated
          else {
            if (cmd == LogRecordCommand)
              nextRec = parsePayload(buf, off + 6, size).orNull
            off += 6 + size
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): LogRecordPacket = {
        val r = nextRec; advance(); r
      }
    }

  /** Receiver counters for one capture buffer — pond's
    * `PondStatsPayload` receive counters (reference
    * src/Protocol.hxx:236-263, maintained in src/Receiver.cxx:28-43):
    * `n_received` counts every receive attempt (complete frames of
    * any command, plus a torn byte tail — one failed receive),
    * `n_malformed` counts LOG_RECORD payloads rejected by the
    * magic/CRC/attribute parse plus the torn tail, `n_discarded`
    * counts well-formed frames the log ingest skips (non-LOG_RECORD
    * commands — the file-capture analogue of pond's discard counter),
    * and `n_parsed = n_received - n_malformed - n_discarded` is what
    * actually landed in the table.
    */
  case class CaptureStats(nReceived: Long, nMalformed: Long,
                          nDiscarded: Long, nParsed: Long)

  /** One classification walk over a capture buffer — the SAME framing
    * and payload checks as [[parse]], but counting instead of
    * yielding, so the counters can never drift from what the source
    * actually ingests.
    */
  def parseStats(buf: Array[Byte]): CaptureStats = {
    var off = 0
    var received = 0L
    var malformed = 0L
    var discarded = 0L
    var parsed = 0L
    var torn = false
    while (!torn && off + 6 <= buf.length) {
      val bb = ByteBuffer.wrap(buf, off, buf.length - off)
      bb.getShort()
      val cmd = bb.getShort() & 0xffff
      val size = bb.getShort() & 0xffff
      if (off + 6 + size > buf.length) torn = true
      else {
        received += 1
        if (cmd == LogRecordCommand) {
          if (parsePayload(buf, off + 6, size).isDefined) parsed += 1
          else malformed += 1
        } else discarded += 1
        off += 6 + size
      }
    }
    if (torn || off < buf.length) { // torn frame or partial header
      received += 1
      malformed += 1
    }
    CaptureStats(received, malformed, discarded, parsed)
  }

  private def parsePayload(buf: Array[Byte], start: Int,
                           size: Int): Option[LogRecordPacket] = {
    if (size < 8) return None // magic + crc minimum
    val bb = ByteBuffer.wrap(buf, start, size)
    if (bb.getInt() != Magic) return None
    val crcEnd = start + size - 4
    val crc = new CRC32
    crc.update(buf, start + 4, size - 8)
    if (ByteBuffer.wrap(buf, crcEnd, 4).getInt() != crc.getValue.toInt)
      return None
    // attributes end where the CRC begins: with the limit pinned there,
    // a truncated fixed-width value near the end underflows (→ dropped)
    // instead of silently reading the CRC bytes as its value
    bb.limit(crcEnd)
    var r = LogRecordPacket(None, None, None, None, None, None, None, None,
      None, None, None, None, None, None, None, None, None, None, None)
    def str(): String = {
      val from = bb.position()
      var end = from
      while (end < crcEnd && buf(end) != 0) end += 1
      if (end >= crcEnd) throw new IllegalArgumentException("unterminated")
      bb.position(end + 1)
      new String(buf, from, end - from, UTF_8)
    }
    try {
      while (bb.position() < crcEnd) {
        val tag = bb.get() & 0xff
        tag match {
          case TTimestamp => r = r.copy(timestamp = Some(bb.getLong()))
          case TRemoteHost => r = r.copy(remote_host = Some(str()))
          case TForwardedTo => r = r.copy(forwarded_to = Some(str()))
          case THost => r = r.copy(host = Some(str()))
          case TSite => r = r.copy(site = Some(str()))
          case TGenerator => r = r.copy(generator = Some(str()))
          case TAnalyticsId => r = r.copy(analytics_id = Some(str()))
          case TMethod =>
            r = r.copy(method = byteToMethod.get(bb.get()))
          case TUri => r = r.copy(uri = Some(str()))
          case TReferer => r = r.copy(referer = Some(str()))
          case TUserAgent => r = r.copy(user_agent = Some(str()))
          case TStatus => r = r.copy(status = Some(bb.getShort() & 0xffff))
          case TLength => r = r.copy(length = Some(bb.getLong()))
          case TTraffic =>
            r = r.copy(traffic_received = Some(bb.getLong()),
              traffic_sent = Some(bb.getLong()))
          case TDuration => r = r.copy(duration_us = Some(bb.getLong()))
          case TType => r = r.copy(`type` = byteToType.get(bb.get()))
          case TContentType => r = r.copy(content_type = Some(str()))
          case TMessage => r = r.copy(message = Some(str()))
          case _ => return None // unknown attribute: can't skip, drop
        }
      }
      // a well-formed record consumes exactly the attribute bytes
      if (bb.position() == crcEnd) Some(r) else None
    } catch {
      case _: IllegalArgumentException => None
      case _: java.nio.BufferUnderflowException => None
    }
  }
}

/** Spark source/sink for the binary packet stream — `inject` and
  * `--raw` as a distributed source ([[DatagramCodec]] for the format).
  *
  * Scale notes: a packet stream is not splittable mid-file (packets
  * are variable-length and unaligned), so the FILE is the unit of
  * parallelism — the writer emits one capture file per input
  * partition, and `binaryFile` fans files out across executors; a
  * producer should size capture files like gzip members (~128 MB).
  * Parsing is one streaming pass per file, no allocation beyond the
  * record being built.
  */
object DatagramSource {

  /** Render a log DataFrame as capture files under `outDir`, one
    * `part-NNNNN.bin` per partition, each a concatenation of framed
    * LOG_RECORD packets — exactly the byte stream `pond query --raw`
    * emits and `pond inject` consumes.
    *
    * All I/O goes through the Hadoop `FileSystem` resolved from
    * `outDir`'s scheme, so the sink targets HDFS/object storage like
    * the engine's other sinks, and each task commits by writing a
    * per-attempt temp file and renaming it into place — a retried or
    * speculative attempt can never interleave bytes into a committed
    * part file; first committed rename wins.
    */
  def write(spark: SparkSession, df: DataFrame, outDir: String): Unit =
    writeCapture(spark, toPackets(df), outDir)(
      (r, out) => out.write(DatagramCodec.serialize(r)))

  /** The commit-protocol capture writer shared by [[write]] and
    * [[writeStatsCapture]]: one part file per partition, each task
    * writing a per-attempt temp file and renaming it into place.
    */
  private def writeCapture[T](spark: SparkSession,
                              ds: org.apache.spark.sql.Dataset[T],
                              outDir: String)(
      emit: (T, java.io.OutputStream) => Unit): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(outDir)
    val fs = dir.getFileSystem(hconf)
    fs.delete(dir, true) // overwrite semantics, like DataFrame writers
    fs.mkdirs(dir)
    // ship the resolved Hadoop conf to executors (credentials, fs
    // impls); Configuration itself is not serializable
    val confProps = {
      val it = hconf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    val bProps = spark.sparkContext.broadcast(confProps)
    ds.foreachPartition { (it: Iterator[T]) =>
      val ctx = org.apache.spark.TaskContext.get()
      val conf = new org.apache.hadoop.conf.Configuration(false)
      bProps.value.foreach { case (k, v) => conf.set(k, v) }
      val dir = new org.apache.hadoop.fs.Path(outDir)
      val efs = dir.getFileSystem(conf)
      val fin = new org.apache.hadoop.fs.Path(
        dir, f"part-${ctx.partitionId()}%05d.bin")
      val tmp = new org.apache.hadoop.fs.Path(dir,
        f"_temporary/part-${ctx.partitionId()}%05d-${ctx.taskAttemptId()}.bin")
      val out = new java.io.BufferedOutputStream(efs.create(tmp, true))
      try it.foreach(r => emit(r, out))
      finally out.close()
      // first committed attempt wins. rename-if-absent is checked
      // BEFORE renaming because RawLocalFileSystem (and some object
      // store connectors) implement rename as an overwriting
      // File.renameTo — relying on rename() returning false when the
      // destination exists would let a slower attempt replace a
      // committed part file. The check-then-rename pair is NOT atomic:
      // two concurrent speculative attempts can both observe !exists
      // and both rename, the slower overwriting the faster. That
      // residual TOCTOU window is benign for a DIFFERENT reason — all
      // attempts of a partition serialize the same rows through the
      // same deterministic encoder, so whichever rename lands last,
      // the committed bytes are identical. A nondeterministic emitter
      // would need a create-exclusive marker per partition to make
      // first-commit-wins race-free
      if (efs.exists(fin)) efs.delete(tmp, false)
      else if (!efs.rename(tmp, fin)) {
        efs.delete(tmp, false)
        if (!efs.exists(fin))
          throw new java.io.IOException(s"commit failed for $fin")
      }
      ()
    }
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_temporary"), true)
  }

  private def toPackets(df: DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col("timestamp"), col("site"), col("host"), col("generator"),
      col("analytics_id"), col("forwarded_to"), col("remote_host"),
      col("type"), col("method"), col("uri"), col("referer"),
      col("user_agent"), col("status"), col("length"),
      col("content_type"), col("duration_us"), col("traffic_sent"),
      col("traffic_received"), col("message"))
      .as[LogRecordPacket]
  }

  /** Parse a capture directory back into the typed log view subset. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(DatagramCodec.parse(_))
      .select("timestamp", "site", "host", "generator", "analytics_id",
        "forwarded_to", "remote_host", "type", "method", "uri", "referer",
        "user_agent", "status", "length", "content_type", "duration_us",
        "traffic_sent", "traffic_received", "message")
  }

  /** Write the log view as a capture that also carries FAULTS, so the
    * receiver counters have something to count: every record with
    * `event_id % 10 == 0` is followed by a CRC-corrupted copy of
    * itself (one payload byte flipped AFTER the CRC was computed —
    * frame intact, payload malformed), and every record with
    * `event_id % 15 == 0` is followed by a well-formed non-LOG_RECORD
    * frame (skipped by ingestion). Deterministic, so the DuckDB
    * oracle can predict all three counters from the log table alone.
    */
  def writeStatsCapture(spark: SparkSession, df: DataFrame,
                        outDir: String): Unit = {
    import spark.implicits._
    val flagged = df.select(
      struct(
        col("timestamp"), col("site"), col("host"), col("generator"),
        col("analytics_id"), col("forwarded_to"), col("remote_host"),
        col("type"), col("method"), col("uri"), col("referer"),
        col("user_agent"), col("status"), col("length"),
        col("content_type"), col("duration_us"), col("traffic_sent"),
        col("traffic_received"), col("message")).as("r"),
      (col("event_id") % 10 === 0).as("corrupt"),
      (col("event_id") % 15 === 0).as("chaff"))
      .as[(LogRecordPacket, Boolean, Boolean)]
    // a non-LOG_RECORD frame (command 2 = END in the response
    // protocol), well-formed, payload "PONG"
    val chaffFrame: Array[Byte] = {
      val payload = "PONG".getBytes(UTF_8)
      val bb = ByteBuffer.allocate(6 + payload.length)
      bb.putShort(1); bb.putShort(2); bb.putShort(payload.length.toShort)
      bb.put(payload)
      bb.array()
    }
    writeCapture(spark, flagged, outDir) { case ((r, corrupt, chaff), out) =>
      val bytes = DatagramCodec.serialize(r)
      out.write(bytes)
      if (corrupt) {
        val bad = bytes.clone()
        // flip one bit in the last attribute byte (just ahead of the
        // trailing CRC-32): framing stays valid, the CRC check fails
        bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x01).toByte
        out.write(bad)
      }
      if (chaff) out.write(chaffFrame)
    }
  }

  /** Receiver counters over a capture directory: one
    * [[DatagramCodec.parseStats]] walk per file (distributed like the
    * record parse), summed into pond's `PondStatsPayload` receive
    * counters. One row: (n_received, n_malformed, n_discarded,
    * n_parsed).
    */
  def readStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .map(DatagramCodec.parseStats(_))
      .agg(
        sum("nReceived").as("n_received"),
        sum("nMalformed").as("n_malformed"),
        sum("nDiscarded").as("n_discarded"),
        sum("nParsed").as("n_parsed"))
  }

  /** The `datagram_stats` gate: write a fault-bearing capture of the
    * log view, then count what the receiver saw — valid, corrupt and
    * foreign frames all crafted deterministically so the oracle can
    * recompute every counter from the clean table.
    */
  def statsCapture(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("datagram_stats",
      spark.sparkContext.applicationId, dir)
    writeStatsCapture(spark, LogView(spark, dir), tmp)
    readStats(spark, tmp)
  }

  /** Round trip for the gate: serialize the log view to packets, read
    * them back, compare against the original table — framing, CRC,
    * every attribute codec, and null-member omission all on the line.
    * Sort key as in JsonlSource (the wire carries no event_id).
    */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("datagram_src",
      spark.sparkContext.applicationId, dir)
    write(spark, LogView(spark, dir), tmp)
    read(spark, tmp).orderBy("timestamp", "remote_host", "uri")
  }
}
