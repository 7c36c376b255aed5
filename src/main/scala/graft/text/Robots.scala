package graft.text

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) — the
  * compliance gate a crawl pipeline applies before a fetched page may
  * enter a corpus (and retroactively, when re-filtering an existing crawl
  * against current policies).
  *
  * Semantics per the RFC:
  *  - groups: consecutive `User-agent:` lines share the rule block that
  *    follows; the group whose agent token is the LONGEST match for the
  *    product token wins, with `*` as fallback;
  *  - rule match: `Allow`/`Disallow` patterns match path prefixes with
  *    `*` (any chars) and `$` (end anchor); the LONGEST matching pattern
  *    decides, `Allow` winning length ties;
  *  - empty `Disallow:` matches nothing; no matching rule ⇒ allowed;
  *    unparseable / empty robots ⇒ allowed (the RFC's fail-open posture
  *    for missing files).
  */
object Robots extends Serializable {

  private final case class Group(agents: Seq[String],
      rules: Seq[(Boolean, String)]) // (isAllow, pattern)

  private def parse(content: String): Seq[Group] = {
    if (content == null) return Nil
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    }
    content.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val v = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) { flush(); inRules = false }
            agents += v.toLowerCase
          case "allow" | "disallow" =>
            inRules = true
            if (agents.nonEmpty && v.nonEmpty) rules += ((key == "allow", v))
            else if (agents.nonEmpty && v.isEmpty && key == "disallow") ()
          case _ => inRules = true // sitemap/crawl-delay end the agent run
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** Pattern match per RFC 9309: anchored at path start, `*` wildcards,
    * trailing `$` anchors the end. Returns match length for precedence
    * (-1 = no match); wildcard chars count toward specificity the way
    * pattern LENGTH does in the RFC. */
  private[graft] def matchLen(pattern: String, path: String): Int = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      val isLast = i == parts.length - 1
      if (i == 0) {
        if (!path.startsWith(part)) return -1
        pos = part.length
      } else if (anchored && isLast && part.nonEmpty) {
        // RFC 9309: with a `$` anchor the final literal must match at the
        // END of the path, not at its leftmost occurrence after pos —
        // '/p*x$' matches '/pxax' even though 'x' also occurs earlier.
        if (!path.endsWith(part) || path.length - part.length < pos) return -1
        pos = path.length
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return -1
        pos = at + part.length
      }
      i += 1
    }
    // a trailing * lets the match extend; otherwise pos is the match end
    if (anchored && !(pos == path.length ||
      (parts.last.isEmpty && i > 1))) return -1
    pattern.length
  }

  /** Is `path` fetchable for `userAgent` under this robots.txt? */
  def isAllowed(robotsTxt: String, userAgent: String, path: String): Boolean = {
    val groups = parse(robotsTxt)
    if (groups.isEmpty) return true
    val ua = if (userAgent == null) "" else userAgent.toLowerCase
    // most specific matching agent token; '*' fallback
    val candidates = groups.flatMap { g =>
      g.agents.collect {
        case a if a == "*" => (0, g)
        case a if ua.contains(a) => (a.length, g)
      }
    }
    if (candidates.isEmpty) return true
    val bestLen = candidates.map(_._1).max
    val chosen = candidates.filter(_._1 == bestLen).map(_._2)
    var best = -1
    var allow = true
    chosen.flatMap(_.rules).foreach { case (isAllow, pat) =>
      val m = matchLen(pat, path)
      if (m > best || (m == best && m >= 0 && isAllow && !allow)) {
        if (m >= 0) { best = m; allow = isAllow }
      }
    }
    if (best < 0) true else allow
  }
}
