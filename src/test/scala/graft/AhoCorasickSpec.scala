package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.AhoCorasick

class AhoCorasickSpec extends AnyFunSuite {

  test("classic overlap set: he/she/his/hers") {
    val ac = new AhoCorasick(Array("he", "she", "his", "hers"))
    // 'ushers' contains she, he, hers — the canonical failure-link case
    assert(ac.findAll("ushers").toSeq == Seq(0, 1, 3))
    assert(ac.findAll("this").toSeq == Seq(2))
    assert(ac.findAll("xyz").isEmpty)
    assert(ac.containsAny("ushers") && !ac.containsAny("xyz"))
  }

  test("nested and repeated patterns, brute-force agreement") {
    val pats = Array("a", "ab", "bab", "bc", "bca", "c", "caa")
    val ac = new AhoCorasick(pats)
    val rnd = new scala.util.Random(9)
    (0 until 300).foreach { _ =>
      val t = (0 until rnd.nextInt(25)).map(_ => "abc" (rnd.nextInt(3))).mkString
      val expect = pats.indices.filter(i => t.contains(pats(i)))
      assert(ac.findAll(t).toSeq == expect, s"text '$t'")
      assert(ac.containsAny(t) == expect.nonEmpty)
    }
  }

  test("survives java serialization (the broadcast-model path)") {
    val ac = new AhoCorasick(Array("spark", "park", "ark row"))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(ac); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[AhoCorasick]
    assert(back.findAll("the spark row of ark rows").toSeq == Seq(0, 1, 2))
    assert(!back.containsAny("nothing here"))
  }

  test("null text, empty-pattern validation") {
    val ac = new AhoCorasick(Array("x"))
    assert(ac.findAll(null).isEmpty && !ac.containsAny(null))
    intercept[IllegalArgumentException](new AhoCorasick(Array.empty))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a", "")))
  }
}
