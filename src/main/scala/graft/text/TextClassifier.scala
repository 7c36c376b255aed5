package graft.text

import org.apache.spark.sql.DataFrame

/** fastText-shape quality classifier: logistic regression over hashed
  * n-gram features — the trainable stage CCNet / LLaMA-class pipelines use
  * to score web documents against a quality target (wiki-vs-crawl labels)
  * before importance filtering. Joulin et al. 2016 ("Bag of Tricks for
  * Efficient Text Classification") is the model family; Wenzek et al. 2019
  * (CCNet) is the pipeline role. The reference engine has no counterpart
  * (extension surface beyond marklit/gis-etl).
  *
  * Features are the portable md5-hex hashed unigram(+bigram) buckets of
  * [[graft.operators.TrainingData.dsirWeights]] — whitespace tokens, md5
  * hex prefix as the bucket id — so a trained model's SCORING replays
  * exactly in any SQL engine given the weight table: the score is
  * `z = bias + Σ_occurrences w[bucket(tok)]` (raw tf bag, the fastText
  * linear layer with hashed features).
  *
  * Scale shape: training input is BOUNDED by construction (quality
  * classifiers train on ~100k-1M labeled docs — wiki positives vs crawl
  * negatives — never the corpus itself), so the featurized set is cached
  * and each epoch is one map-only pass + a single combinable
  * per-partition gradient accumulation ([[graft.vector.Pca.fit]]'s
  * shape): `nBuckets+3` doubles of state per partition, reduced on the
  * driver, AdaGrad update driver-side. No shuffle at any epoch. The
  * 100 TB-scale step is SCORING, a broadcast-model codegen expression
  * ([[graft.functions.ClassifierScore]]) — map-only, fuses into the scan.
  */
object TextClassifier {

  /** Trained model: `weights(b)` per hash bucket plus a bias; scoring and
    * featurization are deterministic functions of the text. */
  final case class ClfModel(nBuckets: Int, hexChars: Int, bigrams: Boolean,
      weights: Array[Double], bias: Double) extends Serializable {
    /** Raw logit `bias + Σ w[bucket]` over the token/bigram bag. */
    def score(text: String): Double = {
      val bks = featurize(text, hexChars, bigrams)
      var z = bias
      var i = 0
      while (i < bks.length) { z += weights(bks(i)); i += 1 }
      z
    }
    def probability(text: String): Double = sigmoid(score(text))
  }

  @inline private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + math.exp(-z))
    else { val e = math.exp(z); e / (1.0 + e) }

  /** Whitespace unigrams (+ adjacent bigrams joined by one space), each
    * hashed to `hexChars` leading md5 hex nibbles — bit-compatible with
    * the SQL-side bucket arithmetic (`substr(md5(tok), 1, hexChars)` as a
    * base-16 number), so SQL replays of scoring agree bucket-for-bucket. */
  private[graft] def featurize(text: String, hexChars: Int,
      bigrams: Boolean): Array[Int] = {
    if (text == null) return Array.emptyIntArray
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    val out = new Array[Int](if (bigrams && n > 1) 2 * n - 1 else n)
    var i = 0
    while (i < n) { out(i) = md5Bucket(toks(i), hexChars); i += 1 }
    if (bigrams) {
      var j = 0
      while (j < n - 1) {
        out(n + j) = md5Bucket(toks(j) + " " + toks(j + 1), hexChars)
        j += 1
      }
    }
    out
  }

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[graft] def md5Bucket(tok: String, hexChars: Int): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0
    var i = 0
    while (i < hexChars) {
      val nib = if ((i & 1) == 0) (h(i >> 1) >> 4) & 0xf else h(i >> 1) & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Train by full-batch gradient descent with per-coordinate AdaGrad
    * steps (Duchi et al. 2011) — the adaptive rate is what lets rare but
    * decisive features (one marker token among ~100 common ones) reach
    * useful weight in tens of epochs instead of thousands.
    *
    * `labelCol` must be 0/1 (numeric). Featurization happens ONCE into a
    * cached RDD; each epoch is one combinable aggregate (per-partition
    * `nBuckets+3` doubles: gradient, bias gradient, count, loss) and a
    * driver-side update. `nBuckets` must be a power of 16 (md5 hex
    * prefix) and is capped at 16^5 so the driver state stays bounded. */
  def train(df: DataFrame, textCol: String = "text", labelCol: String = "label",
      nBuckets: Int = 4096, bigrams: Boolean = true, epochs: Int = 60,
      lr: Double = 0.5, l2: Double = 1e-6): ClfModel = {
    val hexChars = (math.log(nBuckets.toDouble) / math.log(16)).toInt
    require(nBuckets == math.pow(16, hexChars).toInt && hexChars >= 1 &&
      hexChars <= 5, s"nBuckets must be 16^k, k in [1,5]: $nBuckets")
    require(epochs >= 1 && epochs <= 10000, s"epochs: $epochs")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.storage.StorageLevel
    val feats = df.select(col(labelCol).cast("double"), col(textCol))
      .rdd.flatMap { row =>
        val y = if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
        val t = if (row.isNullAt(1)) null else row.getString(1)
        if (y.isNaN || t == null) None
        else Some((y, featurize(t, hexChars, bigrams)))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    val sc = df.sparkSession.sparkContext
    val w = new Array[Double](nBuckets)
    var bias = 0.0
    // AdaGrad accumulators (driver state, nBuckets+1 doubles)
    val gsq = new Array[Double](nBuckets + 1)
    var epoch = 0
    var n = 0L
    while (epoch < epochs) {
      val bw = sc.broadcast((w.clone(), bias))
      // slots: [0,nBuckets) feature grads, nBuckets bias grad,
      // nBuckets+1 doc count, nBuckets+2 summed loss
      val acc = feats.mapPartitions { it =>
        val (ww, b) = bw.value
        val g = new Array[Double](nBuckets + 3)
        it.foreach { case (y, bks) =>
          var z = b
          var i = 0
          while (i < bks.length) { z += ww(bks(i)); i += 1 }
          val p = sigmoid(z)
          val e = p - y
          i = 0
          while (i < bks.length) { g(bks(i)) += e; i += 1 }
          g(nBuckets) += e
          g(nBuckets + 1) += 1
          g(nBuckets + 2) +=
            (if (y > 0.5) -math.log(math.max(p, 1e-15))
             else -math.log(math.max(1.0 - p, 1e-15)))
        }
        Iterator.single(g)
      }.reduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      bw.destroy()
      n = acc(nBuckets + 1).toLong
      require(n >= 2, s"classifier needs >= 2 labeled docs, got $n")
      var j = 0
      while (j < nBuckets) {
        val gj = acc(j) / n + l2 * w(j)
        gsq(j) += gj * gj
        w(j) -= lr * gj / math.sqrt(gsq(j) + 1e-8)
        j += 1
      }
      val gb = acc(nBuckets) / n
      gsq(nBuckets) += gb * gb
      bias -= lr * gb / math.sqrt(gsq(nBuckets) + 1e-8)
      epoch += 1
    }
    feats.unpersist(blocking = false)
    ClfModel(nBuckets, hexChars, bigrams, w, bias)
  }
}
