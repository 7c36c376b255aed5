package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.QualityRules

/** Gopher / C4 quality-rule batteries: per-rule verdicts on authored
  * documents that exercise each rule's negative side (the oracled gates
  * t48/t49 cover the corpus-wide arithmetic; these pin MEANING — which
  * document class trips which rule). */
class QualityRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gopherRow(text: String) =
    QualityRules.gopher(Seq(text).toDF("text")).collect().head

  test("gopher: a clean 60-word doc with stop-words passes every rule") {
    val body = (1 to 58).map(i => s"word$i").mkString(" ")
    val r = gopherRow(s"the quick $body and")
    assert(r.getAs[Long]("n_words") == 61)
    assert(r.getAs[Int]("pass") == 1, r.toString)
  }

  test("gopher: each rule trips on its own adversarial document") {
    // too short
    assert(gopherRow("the and tiny doc").getAs[Int]("g_words") == 0)
    // mean word length out of [3,10]: single-char words
    val shorts = (1 to 60).map(_ => "a b").mkString(" ")
    assert(gopherRow(shorts).getAs[Int]("g_mean") == 0)
    // symbol ratio: > 1 mark per 10 words
    val symy = (1 to 50).map(_ => "word #").mkString(" ")
    assert(gopherRow(symy).getAs[Int]("g_sym") == 0)
    // bullet lines > 10%
    val bullets = (1 to 20).map(i => s"- item $i word$i").mkString("\n")
    assert(gopherRow(bullets).getAs[Int]("g_bullet") == 0)
    // ellipsis lines > 30%
    val ellip = (1 to 10).map(i => s"line $i trails...").mkString("\n")
    assert(gopherRow(ellip).getAs[Int]("g_ellip") == 0)
    // < 80% alphabetic words
    val nums = (1 to 60).map(i => s"$i").mkString(" ")
    assert(gopherRow(nums).getAs[Int]("g_alpha") == 0)
    // < 2 stop-words
    val nostop = (1 to 60).map(i => s"word$i").mkString(" ")
    assert(gopherRow(nostop).getAs[Int]("g_stop") == 0)
  }

  test("gopher: evidence counts are exact on a hand-built doc") {
    val text = "- first bullet line\nthe words go on and on here...\n# mark"
    val r = gopherRow(text)
    assert(r.getAs[Long]("n_lines") == 3)
    assert(r.getAs[Long]("n_bullet") == 1)
    assert(r.getAs[Long]("n_ellip") == 1)
    assert(r.getAs[Long]("n_sym") == 2) // one '#', one '...'
    assert(r.getAs[Long]("n_stop") == 2) // the, and
  }

  test("c4: line keep predicate, lorem/brace verdicts, clean reassembly") {
    val good = "one two three four five six.\nsecond line with words here!\n" +
      "third full sentence right here?"
    val df = QualityRules.c4(Seq(
      (1L, good),                                   // keeps all 3 lines
      (2L, "short line.\n" + good),                 // <5-word line dropped
      (3L, good + "\nLorem Ipsum dolor sit amet."), // lorem kill
      (4L, good + "\ncode { x }."),                 // brace kill
      (5L, "no terminal punctuation at all\nanother bare line")
    ).toDF("doc_id", "text"))
    val rows = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_kept") == 3 &&
      rows(1L).getAs[Int]("keep") == 1)
    assert(rows(1L).getAs[String]("clean_text") == good)
    assert(rows(2L).getAs[Long]("n_kept") == 3) // the short line fell out
    assert(rows(3L).getAs[Int]("c_lorem") == 0 &&
      rows(3L).getAs[Int]("keep") == 0)
    assert(rows(4L).getAs[Int]("c_brace") == 0 &&
      rows(4L).getAs[Int]("keep") == 0)
    assert(rows(5L).getAs[Long]("n_kept") == 0 &&
      rows(5L).getAs[Int]("c_sentences") == 0)
  }

  test("the word/line arrays are shared, not re-split per rule") {
    val df = QualityRules.gopher(spark.range(8)
      .withColumn("text", concat(lit("the be to of words here "), col("id")))
      .drop("id"))
    val plan = df.queryExecution.executedPlan.toString
    // one words split, one lines split — NOT one per evidence column /
    // flag (the single-struct form re-derived filter(split(...)) ~15x)
    val splits = "split\\(".r.findAllIn(plan).size
    assert(splits <= 2, s"text must be tokenized once, saw $splits:\n$plan")
    // and the whole battery stays a map-only plan
    assert(!plan.contains("Exchange"), plan)
  }
}
