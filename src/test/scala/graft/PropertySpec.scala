package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSignature, RollingHash}
import graft.logs.{Enrich, TimeParse}

/** Property-based checks (scalacheck) for the pure kernels. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("rolling_hash: concat property h(a+b) derivable from h(a) and b") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      var h = RollingHash.hash(a)
      b.getBytes("UTF-8").foreach { c =>
        h = (h * RollingHash.Base + (c & 0xff)) % RollingHash.Mod
      }
      RollingHash.hash(a + b) == h
    })
  }

  test("rolling_hash stays within the modulus") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = RollingHash.hash(s)
      h >= 0 && h < RollingHash.Mod
    })
  }

  test("anonymize is idempotent and prefix-preserving for IPv4") {
    val octet = Gen.choose(0, 255)
    check(Prop.forAll(octet, octet, octet, octet) { (a, b, c, d) =>
      val ip = s"$a.$b.$c.$d"
      val anon = Enrich.anonymizeIp(ip)
      anon == s"$a.$b.$c.0" && Enrich.anonymizeIp(anon) == anon
    })
  }

  test("time parse: relative offsets invert") {
    val n = Gen.choose(0L, 1000000L)
    val now = 1700000000000000L
    check(Prop.forAll(n) { v =>
      TimeParse.parseUs(s"+${v}s", now) - TimeParse.parseUs(s"-${v}s", now) ==
        2 * v * 1000000L
    })
  }

  test("minhash: signature of a superset is pointwise <= (min-monotone)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val strs = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(Prop.forAll(strs, strs) { (a, b) =>
      def sig(xs: List[String]) = MinHashSignature.signature(
        new GenericArrayData(xs.map(UTF8String.fromString).toArray), 16)
        .toLongArray()
      val sa = sig(a)
      val sab = sig(a ++ b)
      sa.zip(sab).forall { case (x, y) => y <= x }
    })
  }
}
