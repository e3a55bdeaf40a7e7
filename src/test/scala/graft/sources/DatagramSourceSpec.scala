package graft.sources

import graft.SparkSpec
import graft.logs.LogView
import org.apache.spark.sql.functions._

class DatagramSourceSpec extends SparkSpec {

  private def sample = LogRecordPacket(
    timestamp = Some(1704844800123456L), site = Some("site_1"),
    host = Some("h1.example.com"), generator = Some("gen0"),
    analytics_id = None, forwarded_to = None,
    remote_host = Some("10.1.2.3"), `type` = Some("http_access"),
    method = Some("GET"), uri = Some("/view/item7"),
    referer = Some("https://ref1.example.org/"),
    user_agent = Some("curl/8.5.0"), status = Some(200),
    length = Some(42L), content_type = Some("text/html"),
    duration_us = Some(1234L), traffic_sent = Some(99L),
    traffic_received = Some(7L), message = Some("{\"k\":1}"))

  test("codec round-trips a record, including absent attributes") {
    val packet = DatagramCodec.serialize(sample)
    val back = DatagramCodec.parse(packet).toList
    assert(back == List(sample))
  }

  test("a flipped payload byte fails the CRC and the record is dropped") {
    val packet = DatagramCodec.serialize(sample)
    val corrupt = packet.clone()
    corrupt(20) = (corrupt(20) ^ 0x40).toByte // inside the attributes
    assert(DatagramCodec.parse(corrupt).isEmpty)
    // ...but a corrupt packet does not poison its neighbours
    assert(DatagramCodec.parse(corrupt ++ packet).toList == List(sample))
  }

  test("a truncated trailing packet is dropped, prior packets survive") {
    val packet = DatagramCodec.serialize(sample)
    val stream = packet ++ packet.take(packet.length - 3)
    assert(DatagramCodec.parse(stream).toList == List(sample))
  }

  test("a truncated final attribute with a valid CRC is dropped, not misparsed") {
    // timestamp tag with only 4 of its 8 value bytes, CRC computed over
    // exactly those bytes: without the attribute-region limit the
    // fixed-width read would swallow the 4 CRC bytes as the value and
    // accept the record with a garbage timestamp
    val body = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = body.write(v & 0xff)
    u8(0x47); u8(0x4c); u8(0x52); u8(0x31) // magic "GLR1"
    val crcFrom = body.size()
    u8(1) // TTimestamp
    u8(0); u8(1); u8(2); u8(3) // truncated u64
    val attrs = body.toByteArray
    val crc = new java.util.zip.CRC32
    crc.update(attrs, crcFrom, attrs.length - crcFrom)
    val c = crc.getValue
    u8((c >>> 24).toInt); u8((c >>> 16).toInt); u8((c >>> 8).toInt); u8(c.toInt)
    val payload = body.toByteArray
    val out = java.nio.ByteBuffer.allocate(6 + payload.length)
    out.putShort(1); out.putShort(DatagramCodec.LogRecordCommand.toShort)
    out.putShort(payload.length.toShort); out.put(payload)
    assert(DatagramCodec.parse(out.array()).isEmpty)
  }

  test("serialize fails fast on unmappable enums and NUL-bearing strings") {
    intercept[IllegalArgumentException] {
      DatagramCodec.serialize(sample.copy(method = Some("BREW")))
    }
    intercept[IllegalArgumentException] {
      DatagramCodec.serialize(sample.copy(`type` = Some("mystery")))
    }
    intercept[IllegalArgumentException] {
      DatagramCodec.serialize(sample.copy(uri = Some("/a" + 0.toChar + "b")))
    }
  }

  test("non-LOG_RECORD packets are passed over") {
    // END response (command 2), empty payload, then a record
    val end = Array[Byte](0, 1, 0, 2, 0, 0)
    val stream = end ++ DatagramCodec.serialize(sample)
    assert(DatagramCodec.parse(stream).toList == List(sample))
  }

  test("parseStats counts received/malformed/discarded/parsed per frame class") {
    val good = DatagramCodec.serialize(sample)
    val bad = good.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x01).toByte // CRC fails
    val other = Array[Byte](0, 1, 0, 2, 0, 0) // END frame, empty payload
    val torn = good.take(good.length - 3)
    val s1 = DatagramCodec.parseStats(good ++ bad ++ other ++ good)
    assert(s1 == DatagramCodec.CaptureStats(4, 1, 1, 2), s1)
    // torn tail is one failed receive attempt
    val s2 = DatagramCodec.parseStats(good ++ torn)
    assert(s2 == DatagramCodec.CaptureStats(2, 1, 0, 1), s2)
    // partial header tail likewise
    val s3 = DatagramCodec.parseStats(good ++ Array[Byte](0, 1, 0))
    assert(s3 == DatagramCodec.CaptureStats(2, 1, 0, 1), s3)
    // counters reconcile: received = malformed + discarded + parsed
    for (s <- Seq(s1, s2, s3))
      assert(s.nReceived == s.nMalformed + s.nDiscarded + s.nParsed, s)
  }

  test("statsCapture counters match the crafted fault plan") {
    import graft.Tables
    val n = Tables.events(spark, sf).count()
    val row = DatagramSource.statsCapture(spark, sf).head()
    val nCorrupt = Tables.events(spark, sf)
      .filter(col("event_id") % 10 === 0).count()
    val nChaff = Tables.events(spark, sf)
      .filter(col("event_id") % 15 === 0).count()
    assert(row.getLong(0) == n + nCorrupt + nChaff) // n_received
    assert(row.getLong(1) == nCorrupt) // n_malformed
    assert(row.getLong(2) == nChaff) // n_discarded
    assert(row.getLong(3) == n) // n_parsed
  }

  test("streaming counters equal the batch counters over the same capture plan") {
    val batch = DatagramSource.statsCapture(spark, sf).head()
    val streamed = graft.streaming.StreamOps.datagramStatsStream(spark, sf).head()
    assert((0 to 3).forall(i => batch.getLong(i) == streamed.getLong(i)),
      s"batch=$batch streamed=$streamed")
  }

  test("datagram round trip is lossless for every wire-format field") {
    val back = DatagramSource.roundTrip(spark, sf)
    val orig = LogView(spark, sf).select(
      back.columns.map(col).toIndexedSeq: _*)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // optional members written only when present come back as NULL
    assert(back.filter(col("forwarded_to").isNull).count() ==
      orig.filter(col("forwarded_to").isNull).count())
  }
}
