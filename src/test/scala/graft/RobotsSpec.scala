package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Robots

class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# policy
      |User-agent: *
      |Disallow: /admin/
      |Allow: /admin/public
      |Disallow: /*.pdf$
      |
      |User-agent: examplebot
      |User-agent: otherbot
      |Disallow: /only-example/
      |Allow:    /
      |""".stripMargin

  test("longest-match precedence, allow on tie, wildcards, end anchor") {
    assert(!Robots.isAllowed(txt, "mozilla", "/admin/secret"))
    // the longer Allow overrides the /admin/ Disallow
    assert(Robots.isAllowed(txt, "mozilla", "/admin/public/x"))
    // wildcard + $ anchors the extension
    assert(!Robots.isAllowed(txt, "mozilla", "/docs/file.pdf"))
    assert(Robots.isAllowed(txt, "mozilla", "/docs/file.pdf.html"))
    // unmatched path defaults to allowed
    assert(Robots.isAllowed(txt, "mozilla", "/open/page"))
  }

  test("agent group selection: shared groups, specificity over star") {
    // both examplebot and otherbot share the second group
    assert(!Robots.isAllowed(txt, "ExampleBot/2.0", "/only-example/x"))
    assert(!Robots.isAllowed(txt, "otherbot", "/only-example/x"))
    // their group allows /admin/ (its own rules replace the star group's)
    assert(Robots.isAllowed(txt, "examplebot", "/admin/secret"))
    // unknown bots fall back to star
    assert(!Robots.isAllowed(txt, "strangerbot", "/admin/secret"))
  }

  test("fail-open posture and malformed input") {
    assert(Robots.isAllowed("", "anybot", "/x"))
    assert(Robots.isAllowed(null, "anybot", "/x"))
    assert(Robots.isAllowed("garbage without colons", "anybot", "/x"))
    // rules before any user-agent line are ignored
    assert(Robots.isAllowed("Disallow: /\nUser-agent: *\nAllow: /", "b", "/x"))
    // empty Disallow matches nothing
    assert(Robots.isAllowed("User-agent: *\nDisallow:", "b", "/anything"))
    // a blanket Disallow: / blocks everything for the star group
    assert(!Robots.isAllowed("User-agent: *\nDisallow: /", "b", "/anything"))
  }

  test("matchLen wildcard mechanics") {
    assert(Robots.matchLen("/a/*/c", "/a/b/c") == 6)
    assert(Robots.matchLen("/a/*/c", "/a/x/y/c") == 6)
    assert(Robots.matchLen("/a$", "/a") == 3)
    assert(Robots.matchLen("/a$", "/ab") == -1)
    assert(Robots.matchLen("/*.php$", "/x/y.php") == 7)
    assert(Robots.matchLen("/*.php$", "/x/y.php?q=1") == -1)
    assert(Robots.matchLen("/p", "/q") == -1)
  }

  test("$-anchored final literal matches at END of path, not leftmost") {
    // '/pxax' ends with 'x' — leftmost-occurrence matching would bind the
    // final 'x' at index 2 and falsely reject (RFC 9309 glob semantics)
    assert(Robots.matchLen("/p*x$", "/pxax") == 5)
    assert(Robots.matchLen("/p*x$", "/pxay") == -1)
    // the final-literal end match must still start at/after the preceding
    // parts' match end — '/ab$' tail can't overlap the '/a' prefix
    assert(Robots.matchLen("/ab*b$", "/ab") == -1)
    assert(Robots.matchLen("/ab*b$", "/abzb") == 6)
    // multi-wildcard with $: middle parts stay leftmost, tail end-anchored
    assert(Robots.matchLen("/a*b*c$", "/aXbYcZc") == 7)
    assert(Robots.matchLen("/a*b*c$", "/aXbYcZd") == -1)
    // trailing * before $ still matches any tail
    assert(Robots.matchLen("/a*$", "/aXYZ") == 4)
  }
}
