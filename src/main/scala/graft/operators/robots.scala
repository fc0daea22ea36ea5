package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * robots.txt evaluation (RFC 9309) — the crawl-politeness gate a web
 * corpus applies before keeping a fetched URL: many published corpora
 * re-filter against robots AFTER the crawl (opt-out honoring), so this
 * is a standing curation operator, not just a fetcher concern.
 *
 * Parser (RFC 9309 semantics):
 *  - groups: consecutive `User-agent:` lines open a group that the
 *    following Allow/Disallow rules belong to; group selection picks
 *    the LONGEST product token that is a case-insensitive prefix of
 *    the caller's user agent, falling back to the `*` group; if no
 *    group applies, everything is allowed;
 *  - rules: `Allow:` / `Disallow:` with path patterns supporting `*`
 *    (any octet run) and a terminal `$` (end anchor); an empty
 *    Disallow value matches nothing (the classic "Disallow:" = allow
 *    all); unknown directives and `#` comments are skipped; CRLF and
 *    header case/whitespace variance tolerated;
 *  - decision: the matching rule with the LONGEST pattern (octet
 *    length) wins; a tie between Allow and Disallow resolves to Allow;
 *    no matching rule means allowed.
 *
 * Spark shape: robots documents are a per-DOMAIN table — tiny next to
 * the URL corpus by construction (one row per registrable domain), so
 * the evaluator parses each robots.txt ONCE, broadcasts the parsed
 * rule sets, and gates the URL corpus in a zero-shuffle projection
 * (broadcast hash join on domain + a codegen'd match kernel). Driver
 * state is O(#domains × rules), the model-sized artifact.
 */
object Robots {

  /** One parsed rule: allow/disallow + the raw path pattern. */
  case class Rule(allow: Boolean, pattern: String)

  /** Parse robots.txt content and return the rule group that applies
    * to `userAgent` (RFC 9309 group selection). */
  def parseFor(content: String, userAgent: String): Vector[Rule] = {
    if (content == null) return Vector.empty
    val ua = userAgent.toLowerCase
    // collect (uaToken, rules) groups in order
    var groups = Vector.empty[(Vector[String], Vector[Rule])]
    var curAgents = Vector.empty[String]
    var curRules = Vector.empty[Rule]
    var agentRun = false // true while consecutive user-agent lines accumulate
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups :+= (curAgents, curRules)
      curAgents = Vector.empty
      curRules = Vector.empty
    }
    content.split("\r?\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (!agentRun) flush()
            curAgents :+= value.toLowerCase
            agentRun = true
          case "allow" =>
            agentRun = false
            if (curAgents.nonEmpty && value.nonEmpty)
              curRules :+= Rule(allow = true, value)
          case "disallow" =>
            agentRun = false
            // empty Disallow matches nothing by spec — drop it
            if (curAgents.nonEmpty && value.nonEmpty)
              curRules :+= Rule(allow = false, value)
          case _ => agentRun = false // crawl-delay, sitemap, unknown: skip
        }
      }
    }
    flush()
    // longest user-agent token that prefixes ours; '*' as fallback
    var bestLen = -1
    var best = Vector.empty[Rule]
    var starSeen = false
    var star = Vector.empty[Rule]
    groups.foreach { case (agents, rules) =>
      agents.foreach { a =>
        if (a == "*") {
          // first '*' group wins among stars (RFC: combine; we take the
          // first, the common implementation choice for fixture clarity)
          if (!starSeen) { star = rules; starSeen = true }
        } else if (ua.startsWith(a) && a.length > bestLen) {
          bestLen = a.length
          best = rules
        }
      }
    }
    if (bestLen >= 0) best else if (starSeen) star else Vector.empty
  }

  /** `pattern` match against `path`: literal octets, `*` = any run,
    * terminal `$` anchors the end. Iterative greedy wildcard walk. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat = if (anchored) pattern.dropRight(1) else pattern
    // classic two-pointer wildcard match over segments split by '*'
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si < path.length) {
      if (pi < pat.length && (pat(pi) == path(si))) { pi += 1; si += 1 }
      else if (pi < pat.length && pat(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (starPi >= 0) { starSi += 1; si = starSi; pi = starPi + 1 }
      else return false
      if (!anchored && pi == pat.length) return true // prefix match done
    }
    while (pi < pat.length && pat(pi) == '*') pi += 1
    pi == pat.length && (!anchored || si == path.length)
  }

  /** RFC 9309 decision over a parsed group: longest matching pattern
    * wins, Allow wins ties, no match = allowed. */
  def allowed(rules: Vector[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (r.pattern.length >= bestLen && matches(r.pattern, path)) {
        if (r.pattern.length > bestLen) {
          bestLen = r.pattern.length
          bestAllow = r.allow
        } else if (r.allow) bestAllow = true // tie: Allow wins
      }
    }
    bestAllow
  }

  /** Path+query of a URL (robots patterns match from the path). For
    * scheme-less inputs ("host/a" or bare "/a") the path starts at the
    * FIRST '/' — matching the whole string would include the host and
    * silently defeat every '/'-anchored Disallow. No '/' at all (bare
    * host) is the root path. */
  def pathOf(url: String): String = {
    val scheme = url.indexOf("://")
    val pathStart =
      if (scheme < 0) url.indexOf('/')
      else url.indexOf('/', scheme + 3)
    if (pathStart < 0) "/" else url.substring(pathStart)
  }

  /**
   * Gate a URL corpus against per-domain robots: `robots(domainCol,
   * contentCol)` is parsed once per domain on the driver (domains are
   * model-sized), broadcast, and each URL's path is decided in a
   * zero-shuffle projection. URLs whose domain has no robots row are
   * allowed (absent robots = no restrictions, per spec).
   */
  def robotsGate(urls: DataFrame, urlCol: Column, domainCol: Column,
                 robots: DataFrame, robotsDomainCol: String,
                 robotsContentCol: String, userAgent: String,
                 maxDomains: Int = 1000000): DataFrame = {
    val spark = urls.sparkSession
    // one action: collect capped at maxDomains + 1 so an oversized rule
    // table fails fast without a separate count job or an uncapped pull
    val rows = robots
      .select(col(robotsDomainCol).cast("string"),
        col(robotsContentCol).cast("string"))
      .limit(maxDomains + 1)
      .collect()
    require(rows.length <= maxDomains,
      s"Robots.robotsGate: robots table exceeds maxDomains=$maxDomains — " +
        "the rule table must stay model-sized (one row per registrable " +
        "domain); raise the knob only with driver memory to match")
    val parsed: Map[String, Vector[Rule]] =
      rows.map(r => r.getString(0) -> parseFor(r.getString(1), userAgent)).toMap
    val bc = spark.sparkContext.broadcast(parsed)
    val allowUdf = udf { (domain: String, url: String) =>
      if (domain == null || url == null) true
      else bc.value.get(domain) match {
        case None => true
        case Some(rules) => allowed(rules, pathOf(url))
      }
    }
    urls.withColumn("robots_allowed", allowUdf(domainCol, urlCol))
  }

  /**
   * CORPUS-SIZED robots: the same gate as [[robotsGate]] with the rule
   * table as DATA instead of driver state — for rule tables past
   * `maxDomains` (a full-web crawl has ~10⁸ registrable domains; no
   * driver holds that). Each robots.txt is parsed ONCE executor-side
   * into the UA-applicable group (a compact `array<string>` column,
   * "+pattern"/"-pattern"), deduped to one row per domain (a duplicate
   * domain would FAN OUT the URL corpus through the join — the dedup
   * is a partial-agg shuffle of the already-parsed compact rules, not
   * the raw robots bodies), then LEFT-joined onto the URL corpus on
   * domain and decided in a projection. Absent domains and null URLs
   * are allowed, identical to the broadcast form (spec-pinned).
   *
   * Scale shape: one shuffle of the parsed rule table + one
   * domain-keyed join (AQE broadcasts it when it's actually small,
   * skew-splits a hot domain when it isn't — rule rows are unique per
   * key so a sort-merge skew split is always legal). Driver state:
   * none. Decision cost is identical to the broadcast form; the rules
   * ride the join instead of a broadcast map.
   */
  def robotsGateJoined(urls: DataFrame, urlCol: Column, domainCol: Column,
                       robots: DataFrame, robotsDomainCol: String,
                       robotsContentCol: String, userAgent: String): DataFrame = {
    val ua = userAgent
    val parseUdf = udf { (content: String) =>
      parseFor(content, ua)
        .map(r => (if (r.allow) "+" else "-") + r.pattern).toArray
    }
    // a domain that appears twice (re-crawl, merged snapshots) must
    // decide IDENTICALLY across runs and partitionings: dropDuplicates
    // keeps an arbitrary row, so pick the lexicographic-min content
    // deterministically before parsing (min_by is a partial-aggregable
    // one-shuffle agg — same cost shape as dropDuplicates)
    val rules = robots
      .select(col(robotsDomainCol).cast("string").as("__robots_domain"),
        col(robotsContentCol).cast("string").as("__robots_content"))
      .groupBy(col("__robots_domain"))
      .agg(org.apache.spark.sql.functions.min(col("__robots_content"))
        .as("__robots_content"))
      .select(col("__robots_domain"),
        parseUdf(col("__robots_content")).as("__rules"))
    val decideUdf = udf { (enc: Seq[String], url: String) =>
      if (url == null || enc == null) true
      else {
        val path = pathOf(url)
        // inline longest-match/Allow-ties decision over the encoded
        // rules — no per-row Vector/Rule allocation on the hot path
        var bestLen = -1
        var bestAllow = true
        enc.foreach { s =>
          val patLen = s.length - 1
          if (patLen >= bestLen && matches(s.substring(1), path)) {
            if (patLen > bestLen) {
              bestLen = patLen
              bestAllow = s.charAt(0) == '+'
            } else if (s.charAt(0) == '+') bestAllow = true
          }
        }
        bestAllow
      }
    }
    urls.join(rules, domainCol === col("__robots_domain"), "left")
      .withColumn("robots_allowed", decideUdf(col("__rules"), urlCol))
      .drop("__robots_domain", "__rules")
  }
}
