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
}
