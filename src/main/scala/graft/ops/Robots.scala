package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots-exclusion evaluation (public RFC 9309 semantics) — the gate a
  * compliant crawl pipeline applies before any page enters the corpus;
  * CC itself honors it, so a re-crawl/refresh lane needs it too.
  *
  * Semantics implemented: groups of `User-agent` lines followed by
  * `Allow`/`Disallow` rules (comments stripped, a user-agent line after
  * rules starts a NEW group); group selection prefers an exact
  * case-insensitive agent match over `*`; rule patterns are
  * prefix-matched with `*` wildcards and a `$` end anchor; among all
  * matching rules the LONGEST pattern wins, with Allow beating Disallow
  * on ties; empty patterns are no-ops; no matching rule = allowed.
  *
  * Scale shape: the robots side is hosts-sized (tiny vs a page corpus),
  * so [[filterAllowed]] broadcast-joins it and evaluates per page with a
  * per-partition host→parsed-rules cache — robots text parses once per
  * host per task, not once per page, and the match itself is a
  * regex-free NFA walk (no Pattern.compile in the hot path). */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Parse into (agents, rules) groups. */
  def parseGroups(txt: String): Seq[(Seq[String], Seq[Rule])] = {
    val groups = scala.collection.mutable.ArrayBuffer[(Seq[String], Seq[Rule])]()
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += ((agents.reverse, rules.reverse))
      agents = Nil; rules = Nil; inRules = false
    }
    for (raw <- Option(txt).getOrElse("").split("\r?\n")) {
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            agents ::= value.toLowerCase
          case "allow" | "disallow" if agents.nonEmpty =>
            inRules = true
            if (value.nonEmpty) rules ::= Rule(key == "allow", value)
          case _ => () // crawl-delay, sitemap, unknown keys: ignored
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** The rules governing `agent`: exact-match groups if any, else the
    * `*` groups (multiple groups for the same agent concatenate). */
  def rulesFor(txt: String, agent: String): Seq[Rule] = {
    val gs = parseGroups(txt)
    val a = agent.toLowerCase
    val exact = gs.filter(_._1.contains(a))
    val chosen = if (exact.nonEmpty) exact else gs.filter(_._1.contains("*"))
    chosen.flatMap(_._2)
  }

  /** Prefix match with `*` wildcards and an optional `$` end anchor —
    * the greedy segment walk (split on `*`, leftmost `indexOf` per
    * literal segment; greedy-earliest is the classic optimal strategy
    * for glob containment). The first segment must sit at position 0
    * (robots patterns are PATH PREFIXES), and under `$` the last
    * segment must end exactly at the path end, with the middles
    * constrained to finish before it. O(|path|·segments) worst case and
    * linear in practice — the earlier set-NFA walk materialized an
    * integer Set per pattern char, quadratic in |path| for star-heavy
    * rules, which let a hostile robots.txt make the gate CPU-bound. */
  def patMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val segs = pat.split("\\*", -1)
    if (!path.startsWith(segs.head)) return false
    if (segs.length == 1) return if (anchored) path == pat else true
    var pos = segs.head.length
    val last = segs.last
    // under $ the LAST segment is pinned to the suffix, not matched
    // greedily (greedy-earliest could land it mid-path and wrongly fail)
    val limit = if (anchored) {
      if (!path.endsWith(last)) return false
      path.length - last.length
    } else path.length
    val middles = if (anchored) segs.view.slice(1, segs.length - 1)
                  else segs.view.drop(1)
    for (seg <- middles if seg.nonEmpty) {
      val idx = path.indexOf(seg, pos)
      if (idx < 0 || idx + seg.length > limit) return false
      pos = idx + seg.length
    }
    !anchored || pos <= limit
  }

  /** Longest-matching-pattern decision; Allow wins length ties; no
    * match = allowed. */
  def decide(rules: Seq[Rule], path: String): Boolean = {
    val matching = rules.filter(r => patMatches(r.pattern, path))
    if (matching.isEmpty) true
    else {
      val maxLen = matching.iterator.map(_.pattern.length).max
      matching.exists(r => r.pattern.length == maxLen && r.allow)
    }
  }

  /** Pages × per-host robots → (url, host, path, allowed). The robots
    * side broadcasts (hosts-sized); pages never shuffle. A page whose
    * host has no robots row is allowed (the RFC's missing-file
    * default). */
  def filterAllowed(pages: DataFrame, urlCol: String, robots: DataFrame,
      hostCol: String, txtCol: String, agent: String): DataFrame = {
    val s = pages.sparkSession
    import s.implicits._
    // scheme and host are case-insensitive per RFC 3986: a lowercase-only
    // scheme regex or a case-sensitive host join would silently wave
    // "HTTPS://A.com/private" through the gate
    val host = lower(regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1))
    val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/.*)$"
    val path = when(length(regexp_extract(col(urlCol), pathRe, 1)) > 0,
      regexp_extract(col(urlCol), pathRe, 1)).otherwise(lit("/"))
    pages.select(col(urlCol).cast("string").as("url"), host.as("host"), path.as("path"))
      .join(broadcast(robots.select(lower(col(hostCol).cast("string")).as("host"),
        col(txtCol).cast("string").as("robots_txt"))), Seq("host"), "left")
      .select(col("host"), col("url"), col("path"), col("robots_txt"))
      .as[(String, String, String, String)]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap[String, Seq[Rule]]()
        it.map { case (h, u, p, txt) =>
          val allowed =
            if (txt == null) true
            else decide(cache.getOrElseUpdate(h, rulesFor(txt, agent)), p)
          (u, h, p, allowed)
        }
      }
      .toDF("url", "host", "path", "allowed")
  }
}
