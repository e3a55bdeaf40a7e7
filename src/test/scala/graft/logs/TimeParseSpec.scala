package graft.logs

import org.scalatest.funsuite.AnyFunSuite

class TimeParseSpec extends AnyFunSuite {
  // 2019-02-04T16:46:41Z
  private val Ref = 1549298801000000L
  private val Now = 1700000000000000L // arbitrary "now"

  test("ISO8601 variants from doc/index.rst all parse") {
    assert(TimeParse.parseUs("2019-02-04T16:46:41Z", Now) == Ref)
    assert(TimeParse.parseUs("2019-02-04T16:46:41", Now) == Ref) // UTC default
    assert(TimeParse.parseUs("2019-02-04T16:46:41+02", Now) == Ref - 2 * 3600000000L)
    assert(TimeParse.parseUs("2019-02-04T16:46:41+0200", Now) == Ref - 2 * 3600000000L)
    assert(TimeParse.parseUs("2019-02-04T16:46:41+02:00", Now) == Ref - 2 * 3600000000L)
    assert(TimeParse.parseUs("2019-02-04T16:46", Now) == Ref - 41000000L)
    assert(TimeParse.parseUs("2019-02-04T16", Now) == Ref - (46 * 60 + 41) * 1000000L)
    assert(TimeParse.parseUs("2019-02-04", Now) ==
      Ref - (16 * 3600 + 46 * 60 + 41) * 1000000L)
    assert(TimeParse.parseUs("20190204T164641", Now) == Ref)
  }

  test("special tokens now/today/yesterday/tomorrow") {
    assert(TimeParse.parseUs("now", Now) == Now)
    val dayUs = 86400000000L
    val today = TimeParse.parseUs("today", Now)
    assert(today % dayUs == 0 && Now - today < dayUs)
    assert(TimeParse.parseUs("yesterday", Now) == today - dayUs)
    assert(TimeParse.parseUs("tomorrow", Now) == today + dayUs)
  }

  test("relative offsets: +30s -30s -15 -1h -1d") {
    assert(TimeParse.parseUs("+30s", Now) == Now + 30000000L)
    assert(TimeParse.parseUs("-30s", Now) == Now - 30000000L)
    assert(TimeParse.parseUs("-15", Now) == Now - 15 * 60000000L) // default minutes
    assert(TimeParse.parseUs("-1h", Now) == Now - 3600000000L)
    assert(TimeParse.parseUs("-1d", Now) == Now - 86400000000L)
    assert(TimeParse.parseUs("-500ms", Now) == Now - 500000L)
    assert(TimeParse.parseUs("-42us", Now) == Now - 42L)
  }
}
