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
  * Repeated `site=`/`host=`/`generator=`/`method=` accumulate into the
  * match set, like the wire protocol's repeated filter attributes.
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
        case Array("site", v) => acc.copy(filter = f.copy(sites = f.sites + v))
        case Array("host", v) => acc.copy(filter = f.copy(hosts = f.hosts + v))
        case Array("generator", v) =>
          acc.copy(filter = f.copy(generators = f.generators + v))
        case Array("uri", v) => acc.copy(filter = f.copy(uriExact = Some(v)))
        case Array("uri-prefix", v) =>
          acc.copy(filter = f.copy(uriPrefix = Some(v)))
        case Array("since", v) =>
          acc.copy(filter = f.copy(sinceUs = Some(TimeParse.parseUs(v, nowUs))))
        case Array("until", v) =>
          acc.copy(filter = f.copy(untilUs = Some(TimeParse.parseUs(v, nowUs))))
        case Array("time", v) =>
          val t = TimeParse.parseUs(v, nowUs)
          acc.copy(filter = f.copy(sinceUs = Some(t), untilUs = Some(t)))
        case Array("date", v) =>
          val t = TimeParse.parseUs(v, nowUs)
          acc.copy(filter =
            f.copy(sinceUs = Some(t), untilUs = Some(t + dayUs - 1)))
        case Array("today") =>
          val t = TimeParse.parseUs("today", nowUs)
          acc.copy(filter =
            f.copy(sinceUs = Some(t), untilUs = Some(t + dayUs - 1)))
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
          acc.copy(window = Some((c.toInt, Option(s).map(_.toInt).getOrElse(0))))
        case Array("group_site", CountAtSkip(c, s)) =>
          acc.copy(groupSite = Some((c.toInt, Option(s).map(_.toInt).getOrElse(0))))
        case _ =>
          throw new IllegalArgumentException(s"unrecognized query argument: $arg")
      }
    }
  }
}
