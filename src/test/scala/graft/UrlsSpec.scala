package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Urls

/** URL canonicalization: each rule on its own adversarial case, plus the
  * pass-through and no-false-merge guarantees. */
class UrlsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u")))
      .collect().map(_.getString(0)).toSeq

  test("each rule normalizes its own case") {
    assert(canon("http://ex.com/p#frag") == Seq("http://ex.com/p"))
    assert(canon("HTTP://EX.com/Path") == Seq("http://ex.com/Path"))
    assert(canon("http://ex.com:80/p") == Seq("http://ex.com/p"))
    assert(canon("https://ex.com:443/p") == Seq("https://ex.com/p"))
    assert(canon("http://ex.com:8080/p") == Seq("http://ex.com:8080/p"))
    assert(canon("http://ex.com/p?utm_source=a&q=1") ==
      Seq("http://ex.com/p?q=1"))
    assert(canon("http://ex.com/p?q=1&utm_campaign=z") ==
      Seq("http://ex.com/p?q=1"))
    assert(canon("http://ex.com/p?utm_only=x") == Seq("http://ex.com/p"))
    assert(canon("http://ex.com/dir/") == Seq("http://ex.com/dir"))
    // the root slash survives (':80' strip happens first, then '/' is
    // preceded by the authority, not '/')
    assert(canon("http://ex.com/") == Seq("http://ex.com"))
  }

  test("variants of one resource collapse; distinct resources never merge") {
    val variants = Seq(
      "HTTP://Blog.Example.COM:80/post/42/?utm_source=tw#top",
      "http://blog.example.com/post/42?utm_medium=x",
      "http://blog.example.com/post/42/")
    assert(canon(variants: _*).distinct.size == 1)
    val distinct = Seq(
      "http://ex.com/a", "http://ex.com/A", // path case is significant
      "http://ex.com/a?q=1", "http://ex.com/a?q=2",
      "https://ex.com/a", "http://other.com/a")
    assert(canon(distinct: _*).distinct.size == distinct.size)
  }

  test("non-URL strings pass through unchanged") {
    val odd = Seq("not a url", "", "just/path/", "mailto:x@y.z")
    assert(canon(odd: _*) == Seq("not a url", "", "just/path", "mailto:x@y.z"))
  }
}
