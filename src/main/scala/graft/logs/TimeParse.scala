package graft.logs

import java.time._
import java.time.format.DateTimeFormatter

/** Timestamp parsing for since/until query arguments, matching the
  * reference client's accepted forms (reference doc/index.rst
  * "ISO8601 time stamps": full ISO8601 with/without zone/seconds/
  * minutes, date-only, compact `20190204T164641`, the tokens
  * `now`/`today`/`yesterday`/`tomorrow`, and offsets `+30s`, `-30s`,
  * `-15` (minutes), `-1h`, `-1d`).
  *
  * Returns epoch-microseconds (pond's native resolution). `nowUs` is
  * an explicit parameter so parsing is deterministic/testable; zoneless
  * inputs are interpreted in `zone` (UTC everywhere in this repo —
  * the reference uses the client's local zone).
  */
object TimeParse {

  private val Relative = "^([+-])(\\d+)(us|ms|s|m|h|d)?$".r

  /** Parse with the input's precision width, like the reference
    * client's ParseTimePoint pair (used at Main.cxx:169-186:
    * `until = t.first + t.second`, so `until=2024-01-10` covers the
    * whole day and `time=2024-01-10T12` spans that hour):
    * date-only → 1 day, hour-only → 1 h, to-the-minute → 1 min,
    * to-the-second → 1 s. `now`, the day tokens' instants, and
    * explicit relative offsets are exact instants → precision 0
    * (the day tokens themselves span their day).
    */
  def parseUsPrec(s: String, nowUs: Long,
                  zone: ZoneId = ZoneOffset.UTC): (Long, Long) = {
    s.trim match {
      case "now" => (nowUs, 0L)
      case "today" | "yesterday" | "tomorrow" =>
        (parseUs(s, nowUs, zone), 86400000000L)
      case Relative(_, _, _) => (parseUs(s, nowUs, zone), 0L)
      // ISO forms: precision is decided INSIDE parseIsoUsPrec's own
      // format branches, so parse and precision cannot drift apart
      case iso => parseIsoUsPrec(iso, zone)
    }
  }

  def parseUs(s: String, nowUs: Long, zone: ZoneId = ZoneOffset.UTC): Long = {
    val trimmed = s.trim
    trimmed match {
      case "now" => nowUs
      case "today" => startOfDay(nowUs, 0, zone)
      case "yesterday" => startOfDay(nowUs, -1, zone)
      case "tomorrow" => startOfDay(nowUs, 1, zone)
      case Relative(sign, num, unit) =>
        val n = num.toLong * (if (sign == "-") -1 else 1)
        val us = Option(unit).getOrElse("m") match {
          case "us" => n
          case "ms" => n * 1000L
          case "s"  => n * 1000000L
          case "m"  => n * 60000000L
          case "h"  => n * 3600000000L
          case "d"  => n * 86400000000L
        }
        nowUs + us
      case iso => parseIsoUs(iso, zone)
    }
  }

  private def startOfDay(nowUs: Long, dayOffset: Int, zone: ZoneId): Long = {
    val day = Instant.ofEpochSecond(Math.floorDiv(nowUs, 1000000L))
      .atZone(zone).toLocalDate.plusDays(dayOffset)
    toUs(day.atStartOfDay(zone).toInstant)
  }

  /** The ISO8601 variants of doc/index.rst, normalised then parsed. */
  def parseIsoUs(s: String, zone: ZoneId = ZoneOffset.UTC): Long =
    parseIsoUsPrec(s, zone)._1

  /** ISO parse + the input's precision width in µs — the precision is
    * assigned in the SAME branch that interprets the format, so the
    * two can never disagree.
    */
  def parseIsoUsPrec(s: String,
                     zone: ZoneId = ZoneOffset.UTC): (Long, Long) = {
    // compact form 20190204T164641 → expand
    val expanded = "^(\\d{4})(\\d{2})(\\d{2})T(\\d{2})(\\d{2})(\\d{2})$".r
      .replaceAllIn(s, m => s"${m.group(1)}-${m.group(2)}-${m.group(3)}T${m.group(4)}:${m.group(5)}:${m.group(6)}")
    // offset without colon (+0200) or hour-only (+02) → +02:00; only a
    // string with a time part can carry an offset (a bare date like
    // 2019-02-04 must not have its "-04" eaten as a zone)
    val zoned =
      if (!expanded.contains("T")) expanded
      else expanded
        .replaceAll("([+-])(\\d{2})(\\d{2})$", "$1$2:$3")
        .replaceAll("([+-])(\\d{2})$", "$1$2:00")
    val hasZone = zoned.endsWith("Z") || zoned.matches(".*[+-]\\d{2}:\\d{2}$")
    val body = if (zoned.endsWith("Z")) zoned.dropRight(1) else
      if (hasZone) zoned.substring(0, zoned.length - 6) else zoned
    val offset: ZoneOffset =
      if (zoned.endsWith("Z")) ZoneOffset.UTC
      else if (hasZone) ZoneOffset.of(zoned.substring(zoned.length - 6))
      else null
    val (local: LocalDateTime, precUs: Long) =
      if (body.matches("\\d{4}-\\d{2}-\\d{2}"))
        (LocalDate.parse(body).atStartOfDay(), 86400000000L) // whole day
      else if (body.matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}")) // minutes omitted
        (LocalDateTime.parse(body + ":00:00", DateTimeFormatter.ISO_LOCAL_DATE_TIME),
          3600000000L) // whole hour
      else if (body.matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}")) // seconds omitted
        (LocalDateTime.parse(body + ":00", DateTimeFormatter.ISO_LOCAL_DATE_TIME),
          60000000L) // whole minute
      else
        (LocalDateTime.parse(body, DateTimeFormatter.ISO_LOCAL_DATE_TIME),
          1000000L) // whole second
    val instant =
      if (offset != null) local.toInstant(offset)
      else local.atZone(zone).toInstant
    (toUs(instant), precUs)
  }

  private def toUs(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
}
