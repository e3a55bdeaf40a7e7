package graft.logs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pond's query filter, re-expressed as a single Spark `Column`
  * predicate (reference src/Filter.cxx:64-82 `Filter::operator()` and
  * src/Filter.cxx:37-48 `MatchMore`).
  *
  * Semantics preserved exactly:
  *  - site/host/generator: empty set = pass-all, else exact-match set
  *    (reference src/Filter.cxx:22-26 `MatchFilter`)
  *  - timestamp: CLOSED interval `since <= t <= until`
  *    (reference src/Filter.hxx:42-46)
  *  - http_status: HALF-OPEN `begin <= s < end`
  *    (reference src/Filter.hxx:70-73)
  *  - duration: `d >= longer` (reference src/Filter.hxx:62-65)
  *  - uri: exact equality and/or starts-with
  *    (reference src/Filter.cxx:29-36, 46-47)
  *  - methods: member-of-set (the wire format is a bitmask over the
  *    method enum, reference src/Protocol.hxx FILTER_HTTP_METHODS;
  *    set-of-names is the same predicate)
  *  - unsafe: method present and not safe per RFC 9110 §9.2.1
  *    (reference src/Filter.cxx:42)
  *
  * All predicates are plain `Column` expressions, so Catalyst pushes
  * the sargable ones (equality, ranges, IN, STARTSWITH) into the
  * parquet scan — on a date-partitioned 100 TB table the since/until
  * filter additionally prunes partitions before any IO happens.
  */
final case class LogFilter(
    sites: Set[String] = Set.empty,
    hosts: Set[String] = Set.empty,
    generators: Set[String] = Set.empty,
    tpe: Option[String] = None,
    sinceUs: Option[Long] = None,
    untilUs: Option[Long] = None,
    statusBegin: Int = 0,
    statusEnd: Int = 0xffff,
    durationLongerUs: Option[Long] = None,
    uriExact: Option[String] = None,
    uriPrefix: Option[String] = None,
    methods: Set[String] = Set.empty,
    unsafeMethod: Boolean = false,
    // client-side greps over the optional Datagram attribution fields
    // (http_referer / user_agent, reference client/FormatJson.cxx:57-62);
    // NULL fields never match, like grepping an absent column
    refererPrefix: Option[String] = None,
    userAgentContains: Option[String] = None) {

  /** Exact-match set. For `site` and `host` the EMPTY string member
    * means "records with no value at all" (doc/index.rst documents
    * exactly these two: "Specify an empty site name to filter records
    * with no site", "Specify an empty host to filter records with no
    * host at all") → IS NULL. Other attributes (generator, method)
    * have no such doc, and the reference's MatchFilter
    * (Filter.cxx:22-26) only ever matches a NON-null value — so for
    * them an empty member compares like any other literal and a NULL
    * field never matches.
    */
  private def setFilter(c: Column, s: Set[String],
                        emptyMeansNull: Boolean = false): Option[Column] =
    if (s.isEmpty) None
    else if (emptyMeansNull && s.contains("")) {
      val named = s.filter(_.nonEmpty)
      val base =
        if (named.isEmpty) None
        else if (named.size == 1) Some(c === named.head)
        else Some(c.isin(named.toSeq: _*))
      Some(base.map(_ || c.isNull).getOrElse(c.isNull))
    } else if (s.size == 1) Some(c === s.head)
    else Some(c.isin(s.toSeq: _*))

  /** The conjunction, as one Column; `lit(true)` when unconstrained. */
  def predicate: Column = {
    val parts = Seq(
      setFilter(col("site"), sites, emptyMeansNull = true),
      setFilter(col("host"), hosts, emptyMeansNull = true),
      setFilter(col("generator"), generators),
      tpe.map(col("type") === _),
      sinceUs.map(col("timestamp") >= _),
      untilUs.map(col("timestamp") <= _),
      if (statusBegin != 0 || statusEnd != 0xffff)
        Some(col("status") >= statusBegin && col("status") < statusEnd)
      else None,
      durationLongerUs.map(col("duration_us") >= _),
      uriExact.map(col("uri") === _),
      uriPrefix.map(p => col("uri").startsWith(p)),
      setFilter(col("method"), methods),
      if (unsafeMethod)
        Some(col("method").isNotNull && !col("method").isin(LogFilter.safeMethods.toSeq: _*))
      else None,
      refererPrefix.map(p => col("referer").startsWith(p)),
      userAgentContains.map(s => col("user_agent").contains(s))
    ).flatten
    parts.reduceOption(_ && _).getOrElse(lit(true))
  }
}

object LogFilter {
  /** RFC 9110 §9.2.1 safe methods (referenced by src/Filter.cxx:42 via
    * `IsSafeMethod`). Everything else is "unsafe".
    */
  val safeMethods: Set[String] = Set("GET", "HEAD", "OPTIONS", "TRACE")
}
