package graft.text

/** Zero-dependency HTML text extraction — the first stage of every
  * web-crawl training pipeline (the role trafilatura/justext/
  * BeautifulSoup play in CCNet/RefinedWeb-style recipes), as Spark-free
  * kernels a codegen'd expression can call per row at corpus scale.
  *
  * Scope is the extraction contract those pipelines rely on, not a
  * browser: a single-pass tag scanner that respects quoted attribute
  * values (a `>` inside `title="a>b"` does not end the tag), drops
  * comments / CDATA / doctype / processing instructions, elides the
  * non-visible elements (`script`, `style`, `noscript`, `template`,
  * `title` — title has its own accessor), decodes the common named
  * entities plus all numeric forms, treats NBSP as whitespace, and
  * collapses whitespace runs to single spaces. Malformed input never
  * throws: an unterminated tag or entity passes through as text.
  */
object HtmlLib extends Serializable {

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "hellip" -> "…",
    "mdash" -> "—", "ndash" -> "–", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "deg" -> "°",
    "middot" -> "·", "bull" -> "•", "eacute" -> "é",
    "egrave" -> "è", "agrave" -> "à", "uuml" -> "ü",
    "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß",
    "ccedil" -> "ç", "ntilde" -> "ñ")

  /** Decode `&name;`, `&#123;`, `&#x1f;` entities; unknown or malformed
    * references pass through literally. */
  def decodeEntities(s: String): String = {
    val n = s.length
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val ok = semi > i && semi - i <= 12
        if (!ok) { sb.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val dec: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try {
                val cp = Integer.parseInt(body.substring(2), 16)
                if (Character.isValidCodePoint(cp))
                  new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            } else if (body.startsWith("#")) {
              try {
                val cp = Integer.parseInt(body.substring(1))
                if (Character.isValidCodePoint(cp))
                  new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            } else Named.getOrElse(body, null)
          if (dec == null) { sb.append(c); i += 1 }
          else { sb.append(dec); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  private val Elided = Set("script", "style", "noscript", "template", "title")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == '\u00A0' // NBSP

  /** Lower-case tag name starting at `i` (just past '<' and any '/'). */
  private def tagNameAt(s: String, i0: Int): String = {
    var i = i0
    val sb = new java.lang.StringBuilder(8)
    while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) {
      sb.append(Character.toLowerCase(s.charAt(i)))
      i += 1
    }
    sb.toString
  }

  /** Advance past a tag that starts at `lt` (s(lt) == '<'); returns the
    * index just past the closing '>', honoring quoted attribute values,
    * or -1 when the tag never terminates. */
  private def skipTag(s: String, lt: Int): Int = {
    var i = lt + 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    -1
  }

  /** Visible text: tags stripped (each a whitespace break), non-visible
    * elements elided with their content, entities decoded, whitespace
    * collapsed and trimmed. Null-safe (null → null happens at the
    * expression layer; here empty string in, empty string out). */
  def stripHtml(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') { sb.append(c); i += 1 }
      else if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        sb.append(' ')
        i = if (e < 0) n else e + 3
      } else if (html.startsWith("<![CDATA[", i)) {
        val e = html.indexOf("]]>", i + 9)
        sb.append(' ')
        i = if (e < 0) n else e + 3
      } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        val e = skipTag(html, i) // doctype / processing instruction
        sb.append(' ')
        i = if (e < 0) n else e
      } else {
        val nameStart = if (i + 1 < n && html.charAt(i + 1) == '/') i + 2 else i + 1
        val name = tagNameAt(html, nameStart)
        if (name.isEmpty) { sb.append(c); i += 1 } // bare '<' is text
        else {
          val e = skipTag(html, i)
          sb.append(' ')
          if (e < 0) i = n
          else if (nameStart == i + 1 && Elided(name)) {
            // elide content through the matching close tag
            val close = s"</$name"
            val ci = indexOfIgnoreCase(html, close, e)
            if (ci < 0) i = n
            else {
              val ce = skipTag(html, ci)
              i = if (ce < 0) n else ce
            }
          } else i = e
        }
      }
    }
    collapseWs(decodeEntities(sb.toString))
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Content of the first `<title>` element, entity-decoded and
    * whitespace-collapsed; null when absent or unterminated. */
  def htmlTitle(html: String): String = {
    var i = 0
    while (i >= 0 && i < html.length) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return null
      if (html.regionMatches(true, lt, "<title", 0, 6)) {
        val e = skipTag(html, lt)
        if (e < 0) return null
        val ci = indexOfIgnoreCase(html, "</title", e)
        if (ci < 0) return null
        return collapseWs(decodeEntities(html.substring(e, ci)))
      }
      i = lt + 1
    }
    null
  }

  /** `href` values of `<a>` tags, in document order, entity-decoded
    * (attribute values legally carry `&amp;`), quoted or unquoted. */
  def htmlLinks(html: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return out.toArray
      val isA = lt + 2 <= n - 1 &&
        (html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A') &&
        (lt + 2 >= n || !html.charAt(lt + 2).isLetterOrDigit)
      val e = skipTag(html, lt)
      if (e < 0) return out.toArray
      if (isA) {
        val tag = html.substring(lt, e)
        val h = hrefIn(tag)
        if (h != null) out += decodeEntities(h)
      }
      i = e
    }
    out.toArray
  }

  private def hrefIn(tag: String): String = {
    val hi = indexOfIgnoreCase(tag, "href", 0)
    if (hi < 0) return null
    var i = hi + 4
    while (i < tag.length && isWs(tag.charAt(i))) i += 1
    if (i >= tag.length || tag.charAt(i) != '=') return null
    i += 1
    while (i < tag.length && isWs(tag.charAt(i))) i += 1
    if (i >= tag.length) return null
    val q = tag.charAt(i)
    if (q == '"' || q == '\'') {
      val e = tag.indexOf(q, i + 1)
      if (e < 0) null else tag.substring(i + 1, e)
    } else {
      var e = i
      while (e < tag.length && !isWs(tag.charAt(e)) && tag.charAt(e) != '>') e += 1
      tag.substring(i, e)
    }
  }
}
