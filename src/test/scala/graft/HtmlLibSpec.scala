package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.HtmlLib

class HtmlLibSpec extends AnyFunSuite {

  test("visible text: tags, elision, comments, entities, whitespace") {
    assert(HtmlLib.stripHtml("<p>Hello <b>world</b></p>") == "Hello world")
    assert(HtmlLib.stripHtml(
      "<script>var x = \"<p>no</p>\";</script>after") == "after")
    assert(HtmlLib.stripHtml("<style>p{}</style>a<noscript>no</noscript>b") == "a b")
    assert(HtmlLib.stripHtml("<title>T</title>body") == "body")
    assert(HtmlLib.stripHtml("a<!-- x<p>y -->b") == "a b")
    assert(HtmlLib.stripHtml("a<![CDATA[<raw>]]>b") == "a b")
    assert(HtmlLib.stripHtml("<!DOCTYPE html><?xml v?>t") == "t")
    assert(HtmlLib.stripHtml("x &amp; y &lt;z&gt; &#65;&#x42;") == "x & y <z> AB")
    assert(HtmlLib.stripHtml("a&nbsp;&nbsp;b\n\t c") == "a b c")
    assert(HtmlLib.stripHtml("  <p> padded </p>  ") == "padded")
  }

  test("quoted attributes, malformed input, and non-tag angle brackets") {
    // '>' inside a quoted attribute must not end the tag
    assert(HtmlLib.stripHtml("<p title=\"a>b\">t</p>") == "t")
    assert(HtmlLib.stripHtml("<p title='a>b'>t</p>") == "t")
    // bare '<' that opens no tag is text; unterminated tag drops the tail
    assert(HtmlLib.stripHtml("2 < 3 and 4 > 3") == "2 < 3 and 4 > 3")
    assert(HtmlLib.stripHtml("ok<p unterminated") == "ok")
    // unterminated elided element swallows the tail, no throw
    assert(HtmlLib.stripHtml("a<script>never closed") == "a")
    // unknown/malformed entities pass through
    assert(HtmlLib.stripHtml("&unknown; &#xZZ; &toolongtobeanentity;") ==
      "&unknown; &#xZZ; &toolongtobeanentity;")
    assert(HtmlLib.stripHtml("") == "")
  }

  test("title extraction") {
    assert(HtmlLib.htmlTitle("<head><title> A &amp; B </title></head>") == "A & B")
    assert(HtmlLib.htmlTitle("<TITLE>up</TITLE>") == "up")
    assert(HtmlLib.htmlTitle("<p>no title</p>") == null)
    assert(HtmlLib.htmlTitle("<title>unterminated") == null)
  }

  test("link extraction: quoted, unquoted, entities, order, non-anchors") {
    val html = """<a href="http://a/1">x</a><A HREF='http://a/2'>y</A>
      |<a class="z" href=http://a/3>u</a><area href="http://no">
      |<a name="no-href">v</a><a href="http://a/4?x=1&amp;y=2">w</a>""".stripMargin
    assert(HtmlLib.htmlLinks(html).toSeq == Seq(
      "http://a/1", "http://a/2", "http://a/3", "http://a/4?x=1&y=2"))
    assert(HtmlLib.htmlLinks("no links").isEmpty)
  }
}
