package graft.logs

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class EnrichSpec extends SparkSpec {

  test("anonymize: IPv4 zeroes the last octet (/24)") {
    assert(Enrich.anonymizeIp("10.1.2.3") == "10.1.2.0")
    assert(Enrich.anonymizeIp("192.168.255.254") == "192.168.255.0")
  }

  test("anonymize: IPv6 keeps /48") {
    assert(Enrich.anonymizeIp("2001:db8:1234:5678::1") == "2001:db8:1234::")
  }

  test("anonymize: ::-compressed IPv6 is expanded before slicing") {
    // the zero-run counts as hextets — compressed forms must not leak
    // later groups into the kept /48 (reference zeroes trailing 80 bits)
    assert(Enrich.anonymizeIp("::1") == "0:0:0::")
    assert(Enrich.anonymizeIp("2001:db8::7") == "2001:db8:0::")
    assert(Enrich.anonymizeIp("::ffff:1:2:3:4:5:6") == "0:ffff:1::")
    assert(Enrich.anonymizeIp("fe80::") == "fe80:0:0::")
    // uncompressed full form: plain first-three slice
    assert(Enrich.anonymizeIp("1:2:3:4:5:6:7:8") == "1:2:3::")
  }

  test("anonymize column expression agrees with the Scala function") {
    import spark.implicits._
    val ips = Seq("10.1.2.3", "2001:db8:abcd:12:34::9", "172.16.0.255",
      "::1", "2001:db8::7", "fe80::", "1:2:3:4:5:6:7:8")
    val got = ips.toDF("ip")
      .select(Enrich.anonymizeIpCol(col("ip"))).collect().map(_.getString(0))
    assert(got.toSeq == ips.map(Enrich.anonymizeIp))
  }

  test("visitor sessions: gap of EXACTLY 30min starts a new visit — VisitorTracker.hxx:24-26") {
    import spark.implicits._
    val idle = Enrich.maxIdleUs
    val t0 = 1704067200000000L
    // host A: gap just under, exactly at, and over the idle limit
    val rows = Seq(
      (1L, t0, "10.0.0.1"),
      (2L, t0 + idle - 1, "10.0.0.1"), // < idle after last_seen → same visit
      (3L, t0 + 2 * idle - 1, "10.0.0.1"), // exactly idle after #2 → NEW visit
      (4L, t0, "10.0.0.2"))
      .toDF("event_id", "timestamp", "remote_host")
    val got = Enrich.trackVisitors(rows)
      .orderBy("event_id")
      .select("visit_seq").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("geoip joins a country for every v4 address") {
    val out = Enrich.geoip(spark, LogView(spark, sf))
    assert(out.filter(col("country") === "-").count() == 0)
    assert(out.select("country").distinct().count() > 1)
  }

  test("geoip resolves IPv6: matched ranges, unmatched prefixes, garbage") {
    import spark.implicits._
    val hosts = Seq(
      (1L, "2001:db8:0:0:0:0:0:1"), // full form, range x=0 → US
      (2L, "2001:db8:5::9"), // compressed, x=5 → JP
      (3L, "2001:db8:c8::1"), // hex hextet, x=0xc8=200 → 200%10=0 → US
      (4L, "2001:0db8:00c8::1"), // zero-padded spelling of the same /48
      (5L, "fe80::1"), // valid v6 outside every range → '-'
      (6L, "2001:db9::1"), // adjacent /32, no range → '-'
      (7L, "10.3.0.1"), // v4 still resolves alongside → GB
      (8L, "not:an::ip:zz"), // structurally invalid v6 → '-'
      (9L, "garbage.host.name")) // invalid v4 → '-'
      .toDF("event_id", "remote_host")
    val got = Enrich.geoip(spark, hosts).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("country")).toMap
    assert(got == Map(1L -> "US", 2L -> "JP", 3L -> "US", 4L -> "US",
      5L -> "-", 6L -> "-", 7L -> "GB", 8L -> "-", 9L -> "-"), got.toString)
  }
}
