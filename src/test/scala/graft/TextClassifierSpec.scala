package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.text.TextClassifier

/** Hashed-n-gram logistic regression (the fastText/CCNet quality-classifier
  * shape): featurization portability, separable-corpus convergence, and the
  * broadcast-model scoring expression. */
class TextClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("featurize: md5 hex-prefix buckets match the SQL-side arithmetic") {
    // bucket of a token = leading hexChars nibbles of md5 as a base-16 int
    def ref(tok: String, hexChars: Int): Int =
      Integer.parseInt(org.apache.commons.codec.digest.DigestUtils.md5Hex(tok)
        .substring(0, hexChars), 16)
    for (tok <- Seq("spark", "hash join", "qgood3", "ümlaut");
         hc <- Seq(1, 2, 3)) {
      assert(TextClassifier.md5Bucket(tok, hc) == ref(tok, hc), s"$tok/$hc")
    }
    // unigrams then adjacent bigrams, whitespace split, empties dropped
    val f = TextClassifier.featurize("a  b c", 3, bigrams = true)
    assert(f.length == 5)
    assert(f(0) == ref("a", 3) && f(2) == ref("c", 3))
    assert(f(3) == ref("a b", 3) && f(4) == ref("b c", 3))
    assert(TextClassifier.featurize("a b", 3, bigrams = false).length == 2)
    assert(TextClassifier.featurize("", 3, bigrams = true).isEmpty)
    assert(TextClassifier.featurize(null, 3, bigrams = true).isEmpty)
  }

  test("train separates a planted corpus; expression scores agree with model") {
    // 200 docs of shared filler plus one class-determining marker token
    val docs = (0 until 200).map { i =>
      val y = i % 2
      val filler = s"the quick brown fox ${i % 7} jumps over the lazy dog"
      val marker = (if (y == 1) "qgood" else "qbad") + (i % 5)
      (i.toLong, y, s"$filler $marker")
    }.toDF("doc_id", "label", "text")
    val m = TextClassifier.train(docs, "text", "label",
      nBuckets = 4096, bigrams = true, epochs = 40)
    val scored = docs.select(col("label"),
      classifier_score(col("text"), m).as("z")).collect()
    // expression path == model.score path
    docs.collect().zip(scored).foreach { case (d, s) =>
      assert(math.abs(m.score(d.getString(2)) - s.getDouble(1)) < 1e-12)
    }
    // perfect ranking separation on the planted markers
    val pos = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val neg = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
    assert(pos.min > neg.max,
      s"separable corpus must separate: min-pos ${pos.min} max-neg ${neg.max}")
    // and therefore AUC = 1 through the oracled AUC arithmetic
    val auc = graft.operators.Eval.auc(
      docs.select(classifier_score(col("text"), m).as("s"),
        col("label").as("y")), "s", "y")
      .select("auc").head().getDouble(0)
    assert(auc >= 0.999, s"auc $auc")
  }

  test("null/empty rows are skipped in training and null-safe in scoring") {
    val docs = Seq[(java.lang.Long, java.lang.Integer, String)](
      (1L, 1, "qgood a b"), (2L, 0, "qbad a b"), (3L, null, "dropped"),
      (4L, 1, null), (5L, 0, "qbad c d"), (6L, 1, "qgood c d"))
      .toDF("doc_id", "label", "text")
    val m = TextClassifier.train(docs, "text", "label",
      nBuckets = 256, bigrams = false, epochs = 30)
    val out = docs.select(classifier_score(col("text"), m).as("z")).collect()
    assert(out.count(_.isNullAt(0)) == 1) // null text → null score
    assert(m.score("qgood") > m.score("qbad"))
  }

  test("scoring plan is a map-only scan (no shuffle, no UDF)") {
    val docs = Seq((1L, 1, "qgood x"), (2L, 0, "qbad x")).toDF("doc_id", "label", "text")
    val m = TextClassifier.train(docs, "text", "label",
      nBuckets = 256, bigrams = false, epochs = 5)
    val plan = docs.select(classifier_score(col("text"), m).as("z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
