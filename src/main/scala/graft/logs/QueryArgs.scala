package graft.logs

import org.apache.spark.sql.DataFrame

/** The pond client's query-argument language (reference
  * doc/index.rst:292-345 — `type=`, `site=`, `host=`, `generator=`,
  * `uri=`, `uri-prefix=`, `since=`/`until=`/`time=`/`date=`/`today`,
  * `duration_longer=DURATION`, `status=BEGIN[:END]`,
  * `method=M[,M...]`, `unsafe_method`, `window=COUNT[@SKIP]`,
  * `group_site=COUNT[@SKIP]`), parsed into a [[LogFilter]] plus the
  * shaping verbs — so a pond user can run their exact query strings
  * against the Spark engine:
  *
  * {{{
  * QueryArgs.parse(Seq("type=http_error", "since=-1h", "status=500:600"), nowUs)
  *   .apply(LogView(spark, dir))
  * }}}
  *
  * Distinct `site=`/`host=`/`generator=` values accumulate into the
  * match set (the wire protocol's repeated filter attributes); exact
  * repeats, `site=` together with `group_site=`, and repeated
  * `window=`/`group_site=` are rejected with the client's error
  * messages (reference client/Main.cxx:109-143).
  */
object QueryArgs {

  case class Parsed(
      filter: LogFilter,
      window: Option[(Int, Int)] = None,     // (count, skip)
      groupSite: Option[(Int, Int)] = None) { // (count, skip)

    /** Apply filter + shaping to a LogView-shaped DataFrame. */
    def apply(log: DataFrame): DataFrame = {
      val filtered = log.filter(filter.predicate)
      (window, groupSite) match {
        case (Some((max, skip)), _) => Shaping.window(filtered, max, skip)
        case (_, Some((max, skip))) => Shaping.groupSite(filtered, max, skip)
        case _ => filtered.orderBy(Shaping.timeOrder: _*)
      }
    }
  }

  private val Duration = "^(\\d+)(us|ms|s|m|h|d)$".r
  private val CountAtSkip = "^(\\d+)(?:@(\\d+))?$".r

  def durationUs(s: String): Long = s match {
    case Duration(n, unit) =>
      n.toLong * (unit match {
        case "us" => 1L
        case "ms" => 1000L
        case "s" => 1000000L
        case "m" => 60000000L
        case "h" => 3600000000L
        case "d" => 86400000000L
      })
    case _ => throw new IllegalArgumentException(s"bad duration: $s")
  }

  def parse(args: Seq[String], nowUs: Long): Parsed = {
    val dayUs = 86400000000L
    args.foldLeft(Parsed(LogFilter())) { (acc, arg) =>
      val f = acc.filter
      arg.split("=", 2) match {
        case Array("type", v) => acc.copy(filter = f.copy(tpe = Some(v)))
        case Array("site", v) =>
          // reference Main.cxx:109-115: site/group_site are mutually
          // exclusive, repeats are an error
          if (acc.groupSite.nonEmpty)
            throw new IllegalArgumentException("site and group_site are mutually exclusive")
          if (f.sites.contains(v))
            throw new IllegalArgumentException("Duplicate site name")
          acc.copy(filter = f.copy(sites = f.sites + v))
        case Array("host", v) =>
          if (f.hosts.contains(v)) // Main.cxx:164-165
            throw new IllegalArgumentException("Duplicate host name")
          acc.copy(filter = f.copy(hosts = f.hosts + v))
        case Array("generator", v) =>
          if (f.generators.contains(v)) // Main.cxx:167-168
            throw new IllegalArgumentException("Duplicate generator name")
          acc.copy(filter = f.copy(generators = f.generators + v))
        case Array("uri", v) => acc.copy(filter = f.copy(uriExact = Some(v)))
        case Array("uri-prefix", v) =>
          acc.copy(filter = f.copy(uriPrefix = Some(v)))
        case Array("since", v) =>
          acc.copy(filter = f.copy(sinceUs = Some(TimeParse.parseUs(v, nowUs))))
        case Array("until", v) =>
          // Main.cxx:172-174: until = instant + its precision width,
          // so until=2024-01-10 includes the whole day (closed compare)
          val (t, p) = TimeParse.parseUsPrec(v, nowUs)
          acc.copy(filter = f.copy(untilUs = Some(t + p)))
        case Array("time", v) =>
          // Main.cxx:175-178: time= spans [t, t + precision]
          val (t, p) = TimeParse.parseUsPrec(v, nowUs)
          acc.copy(filter = f.copy(sinceUs = Some(t), untilUs = Some(t + p)))
        case Array("date", v) =>
          // Main.cxx:179-182: until = date + 24h, inclusive — a record
          // stamped exactly at the next midnight is included
          val t = TimeParse.parseUs(v, nowUs)
          acc.copy(filter =
            f.copy(sinceUs = Some(t), untilUs = Some(t + dayUs)))
        case Array("today") =>
          val t = TimeParse.parseUs("today", nowUs)
          acc.copy(filter =
            f.copy(sinceUs = Some(t), untilUs = Some(t + dayUs)))
        case Array("duration_longer", v) =>
          acc.copy(filter = f.copy(durationLongerUs = Some(durationUs(v))))
        case Array("status", v) =>
          v.split(":", 2) match {
            case Array(b) =>
              // single status: the half-open range [b, b+1)
              acc.copy(filter =
                f.copy(statusBegin = b.toInt, statusEnd = b.toInt + 1))
            case Array(b, e) =>
              acc.copy(filter = f.copy(statusBegin = b.toInt, statusEnd = e.toInt))
          }
        case Array("method", v) =>
          acc.copy(filter = f.copy(methods = f.methods ++ v.split(",")))
        case Array("unsafe_method") =>
          acc.copy(filter = f.copy(unsafeMethod = true))
        case Array("window", CountAtSkip(c, s)) =>
          if (acc.window.nonEmpty) // Main.cxx:142-143
            throw new IllegalArgumentException("Duplicate window")
          acc.copy(window = Some((c.toInt, Option(s).map(_.toInt).getOrElse(0))))
        case Array("group_site", CountAtSkip(c, s)) =>
          if (f.sites.nonEmpty) // Main.cxx:116-118
            throw new IllegalArgumentException("site and group_site are mutually exclusive")
          if (acc.groupSite.nonEmpty)
            throw new IllegalArgumentException("Duplicate group_site")
          acc.copy(groupSite = Some((c.toInt, Option(s).map(_.toInt).getOrElse(0))))
        case _ =>
          throw new IllegalArgumentException(s"unrecognized query argument: $arg")
      }
    }
  }
}
