package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-frontier and corpus dedup — the
  * conservative, always-safe subset of RFC 3986 §6 normalization plus
  * the tracking-parameter strip every crawl pipeline applies: two
  * syntactically different URLs that canonicalize equal are the same
  * fetch ~always, and URL-level dedup kills a double-digit share of a
  * raw crawl before any content pass runs.
  *
  * Rules, in order: drop the fragment; lowercase the scheme+authority
  * (ONLY — paths are case-sensitive); drop default ports (`:80` http,
  * `:443` https); drop `utm_*` query parameters; drop a single trailing
  * slash (not the root's). Deliberately NOT done: percent-decoding and
  * query-param reordering (both can change semantics on real servers).
  *
  * The whole chain is plain `regexp_replace`/`regexp_extract` Columns
  * over RE2-safe patterns (no lookaround), so it fuses into the scan,
  * runs identically at any scale, and replays verbatim in DuckDB
  * (`'g'`-flagged) for the oracle. Non-URL strings pass through. */
object Urls {

  private val AuthPat = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*"

  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val lowered = concat(lower(regexp_extract(noFrag, AuthPat, 0)),
      regexp_replace(noFrag, AuthPat, ""))
    val noPort = regexp_replace(regexp_replace(lowered,
      "^(http://[^/:?]+):80([/?]|$)", "$1$2"),
      "^(https://[^/:?]+):443([/?]|$)", "$1$2")
    val noUtm = regexp_replace(regexp_replace(regexp_replace(noPort,
      "&utm_[^&]*", ""), "\\?utm_[^&]*&", "?"), "\\?utm_[^&]*$", "")
    regexp_replace(noUtm, "([^/])/$", "$1")
  }
}
