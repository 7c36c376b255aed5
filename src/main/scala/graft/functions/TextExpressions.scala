package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.{HtmlLib, TextLib}
import graft.vector.VectorLib

/** Catalyst expressions for the text-dedup / quality / similarity surface
  * (training-data-pipeline operators extending the reference, SURVEY.md §7.6).
  * All delegate to the Spark-free kernels [[graft.text.TextLib]] /
  * [[graft.vector.VectorLib]].
  *
  * Every expression generates code (a static call into the kernel via
  * `defineCodeGen`) rather than mixing in CodegenFallback: fallback nodes
  * split WholeStageCodegen spans and pay per-row boxing + InternalRow
  * construction, which is the difference between a fused scan→project
  * pipeline and an interpreted one on the corpus-wide per-row passes these
  * kernels sit in (token counts, shingles, fingerprints, signatures).
  */

private object TextCodegen {
  val GAD = "new org.apache.spark.sql.catalyst.util.GenericArrayData"
  val UTF8 = "org.apache.spark.unsafe.types.UTF8String"
}
import TextCodegen._

/** shingle_hashes(text, n) → sorted distinct 64-bit hashes of word n-grams. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  protected override def nullSafeEval(text: Any, n: Any): Any =
    new GenericArrayData(
      TextLib.shingleHashes(text.asInstanceOf[UTF8String].toString, n.asInstanceOf[Number].intValue))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"$GAD(graft.text.TextLib.shingleHashes($t.toString(), $n))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** minhash_signature(elem_hashes, k, seed) → k-long MinHash signature. */
case class MinHashSignature(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), IntegerType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  protected override def nullSafeEval(arr: Any, k: Any, seed: Any): Any =
    new GenericArrayData(TextLib.minHashSignature(
      arr.asInstanceOf[ArrayData].toLongArray(), k.asInstanceOf[Number].intValue, seed.asInstanceOf[Number].longValue))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, k, s) =>
      s"$GAD(graft.text.TextLib.minHashSignature($a.toLongArray(), $k, $s))")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** jaccard_sorted(a, b) → exact Jaccard similarity of two sorted-distinct
  * hash arrays (merge-scan, no set allocation). */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_sorted"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    TextLib.jaccard(a.asInstanceOf[ArrayData].toLongArray(), b.asInstanceOf[ArrayData].toLongArray())
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.TextLib.jaccard($a.toLongArray(), $b.toLongArray())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** simhash64(elem_hashes) → 64-bit SimHash. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  protected override def nullSafeEval(arr: Any): Any =
    TextLib.simHash64(arr.asInstanceOf[ArrayData].toLongArray())
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.text.TextLib.simHash64($a.toLongArray())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** winnow_fingerprint(text, k, w) → winnowing fingerprint hash set. */
case class WinnowFingerprint(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"
  protected override def nullSafeEval(text: Any, k: Any, w: Any): Any =
    new GenericArrayData(TextLib.winnowFingerprint(
      text.asInstanceOf[UTF8String].toString, k.asInstanceOf[Number].intValue, w.asInstanceOf[Number].intValue))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) =>
      s"$GAD(graft.text.TextLib.winnowFingerprint($t.toString(), $k, $w))")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** bpeish_token_count(text) → Int: LLM-token-shaped count (letters runs /
  * digits / symbols pre-tokenizer regex). */
case class BpeIshTokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpeish_token_count"
  protected override def nullSafeEval(text: Any): Any =
    TextLib.bpeIshTokenCount(text.asInstanceOf[UTF8String].toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.TextLib.bpeIshTokenCount($t.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** quality_score(text) → [0,1] heuristic document quality. */
case class QualityScore(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quality_score"
  protected override def nullSafeEval(text: Any): Any =
    TextLib.qualityScore(text.asInstanceOf[UTF8String].toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.TextLib.qualityScore($t.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** detect_lang(text) → best-guess ISO language code ("und" if unknown). */
case class DetectLang(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "detect_lang"
  protected override def nullSafeEval(text: Any): Any =
    UTF8String.fromString(TextLib.detectLang(text.asInstanceOf[UTF8String].toString))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"$UTF8.fromString(graft.text.TextLib.detectLang($t.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** cosine_similarity(a, b) over array<float> embeddings (double accumulate). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorLib.cosine(
      a.asInstanceOf[ArrayData].toFloatArray(), b.asInstanceOf[ArrayData].toFloatArray())
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.vector.VectorLib.cosine($a.toFloatArray(), $b.toFloatArray())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** nearest_cells(vec) → the `n` codebook centroid indices with the highest
  * dot product, ties toward the lower index (the IVF cell-assignment /
  * probe kernel). The codebook is a plan-time constant carried as a
  * reference object rather than a child expression: it crosses to
  * executors once inside the serialized plan, and both the interpreted and
  * generated paths call the tight no-allocation kernel — a lambda-HOF
  * formulation (transform + zip_with + aggregate over a literal array)
  * allocates an intermediate array per centroid per row. */
case class NearestCells(child: Expression, centroids: Array[Array[Float]], n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells"
  protected override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorLib.nearestCells(
      v.asInstanceOf[ArrayData].toFloatArray(), centroids, n))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"$GAD(graft.vector.VectorLib.nearestCells($v.toFloatArray(), $cRef, $n))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nearest_centroid2(x, y) → index of the squared-distance-nearest planar
  * centroid, ties to the lowest index (the k-means assignment kernel).
  * Like [[NearestCells]], the centroid arrays are plan-time constants
  * carried as reference objects: one serialization to executors, a tight
  * no-allocation loop on both the interpreted and generated paths —
  * measured against column-expression forms at 10M rows × k=64, the
  * flat least/when chain fell out of codegen (interpreted, ~12 s/scan)
  * and an array-column argmin boxed 64 doubles per row (~38 s/scan);
  * this kernel scans in well under a second. */
case class NearestCentroid2(left: Expression, right: Expression,
    cxs: Array[Double], cys: Array[Double])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid2"
  protected override def nullSafeEval(x: Any, y: Any): Any =
    VectorLib.nearestCentroid2(x.asInstanceOf[Double], y.asInstanceOf[Double],
      cxs, cys)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xRef = ctx.addReferenceObj("cxs", cxs, "double[]")
    val yRef = ctx.addReferenceObj("cys", cys, "double[]")
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.vector.VectorLib.nearestCentroid2($x, $y, $xRef, $yRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** rhp_signature(vec, bits, seed) → random-hyperplane LSH signature (ANN
  * bucketing key). */
case class RhpSignature(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), IntegerType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rhp_signature"
  protected override def nullSafeEval(v: Any, bits: Any, seed: Any): Any =
    VectorLib.rhpSignature(
      v.asInstanceOf[ArrayData].toFloatArray(), bits.asInstanceOf[Number].intValue, seed.asInstanceOf[Number].longValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, s) =>
      s"graft.vector.VectorLib.rhpSignature($v.toFloatArray(), $b, $s)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** bpe_encode(text) → BPE token array under a trained merge table
  * ([[graft.text.BpeModel]]). The model is a constructor parameter, not a
  * child expression: it rides to executors inside the serialized expression
  * (and codegen embeds it via `addReferenceObj`, the [[NearestCells]]
  * pattern), so encoding is a map-only broadcast-model pass — the correct
  * shape for tokenizing a 100 TB corpus. */
case class BpeEncode(child: Expression, model: graft.text.BpeModel)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"
  protected override def nullSafeEval(text: Any): Any =
    new GenericArrayData(BpeEncode.toUtf8(
      model.encode(text.asInstanceOf[UTF8String].toString)).asInstanceOf[Array[Any]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeModel", model, "graft.text.BpeModel")
    defineCodeGen(ctx, ev, t =>
      s"$GAD(graft.functions.BpeEncode.toUtf8($mRef.encode($t.toString())))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeEncode {
  /** codegen helper: String[] → UTF8String[] (generated Java can't map). */
  def toUtf8(tokens: Array[String]): Array[UTF8String] =
    tokens.map(UTF8String.fromString)
}

/** classifier_score(text) → raw logit of a trained hashed-n-gram quality
  * classifier ([[graft.text.TextClassifier.ClfModel]]). Broadcast-model
  * shape: the model rides inside the serialized expression (codegen embeds
  * it via `addReferenceObj`, the [[BpeEncode]] pattern), so scoring a
  * 100 TB corpus is a map-only pass that fuses into the scan. */
case class ClassifierScore(child: Expression,
    model: graft.text.TextClassifier.ClfModel)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "classifier_score"
  protected override def nullSafeEval(text: Any): Any =
    model.score(text.asInstanceOf[UTF8String].toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("clfModel", model,
      "graft.text.TextClassifier.ClfModel")
    defineCodeGen(ctx, ev, t => s"$mRef.score($t.toString())")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** robots_allowed(robots_txt, user_agent, path) → RFC 9309 fetchability:
  * longest-match allow/disallow under the most specific agent group. */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_allowed"
  protected override def nullSafeEval(r: Any, ua: Any, p: Any): Any =
    graft.text.Robots.isAllowed(r.asInstanceOf[UTF8String].toString,
      ua.asInstanceOf[UTF8String].toString, p.asInstanceOf[UTF8String].toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, ua, p) =>
      s"graft.text.Robots.isAllowed($r.toString(), $ua.toString(), $p.toString())")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** fix_mojibake(text) → undo UTF-8-mis-decoded-as-CP1252 mangling
  * (the ftfy core repair); clean text passes through unchanged. */
case class FixMojibake(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fix_mojibake"
  protected override def nullSafeEval(text: Any): Any =
    UTF8String.fromString(
      TextLib.fixMojibake(text.asInstanceOf[UTF8String].toString))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"$UTF8.fromString(graft.text.TextLib.fixMojibake($t.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** compress_ratio(text) → deflate bytes / raw bytes (zlib level 6): the
  * cheap junk detector — boilerplate compresses far below prose, random
  * blobs sit near 1.0. */
case class CompressRatio(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "compress_ratio"
  protected override def nullSafeEval(text: Any): Any =
    TextLib.compressRatio(text.asInstanceOf[UTF8String].toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.TextLib.compressRatio($t.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pca_project(vec) → k-dim (optionally whitened) PCA projection under a
  * trained [[graft.vector.Pca.PcaModel]] — the [[BpeEncode]]
  * broadcast-model shape: map-only, codegen, no shuffle. */
case class PcaProject(child: Expression, model: graft.vector.Pca.PcaModel)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pca_project"
  protected override def nullSafeEval(vec: Any): Any =
    new GenericArrayData(PcaProject.box(
      model.project(vec.asInstanceOf[ArrayData].toFloatArray())))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pcaModel", model,
      "graft.vector.Pca.PcaModel")
    defineCodeGen(ctx, ev, v =>
      s"$GAD(graft.functions.PcaProject.box($mRef.project($v.toFloatArray())))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PcaProject {
  /** codegen helper: float[] → Object[] for GenericArrayData. */
  def box(a: Array[Float]): Array[Any] = a.map(f => f: Any)
}

/** Order-statistic cut table for [[CutRank]]: parallel arrays sorted
  * best-first (score DESC, id ASC). Serializable — rides the expression
  * to executors like the other broadcast models. */
case class CutTable(scores: Array[Double], ids: Array[Long]) {
  require(scores.length == ids.length, "parallel cut arrays must align")
  /** Number of cuts the row (s, id) sorts strictly AFTER in best-first
    * order — `after` is monotone along the sorted cuts, so this is an
    * allocation-free O(log n) binary search. */
  def rank(s: Double, id: Long): Int = {
    var lo = 0
    var hi = scores.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (s < scores(mid) || (s == scores(mid) && id > ids(mid))) lo = mid + 1
      else hi = mid
    }
    lo
  }
}

/** cut_rank(score, id) → how many order-statistic cuts the row has passed
  * in best-first (score DESC, id ASC) order — the bucket index used by
  * quantile-style partitioners ([[graft.operators.TrainingData
  * .tokenBudgetSelect]]). A reduced when-chain over the cuts overflows
  * Catalyst past ~1k entries and a zip_with HOF allocates a struct array
  * per row; this is one codegen'd binary search per row. */
case class CutRank(left: Expression, right: Expression, table: CutTable)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cut_rank"
  protected override def nullSafeEval(s: Any, id: Any): Any =
    table.rank(s.asInstanceOf[Double], id.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("cutTable", table,
      "graft.functions.CutTable")
    defineCodeGen(ctx, ev, (s, id) => s"$tRef.rank($s, $id)")
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** url_host(url) → lowercased authority host (userinfo/port stripped);
  * null for non-URL strings. */
case class UrlHost(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_host"
  protected override def nullSafeEval(url: Any): Any = {
    val h = TextLib.urlHost(url.asInstanceOf[UTF8String].toString)
    if (h == null) null else UTF8String.fromString(h)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => {
      val tmp = ctx.freshName("host")
      s"""
        java.lang.String $tmp = graft.text.TextLib.urlHost($u.toString());
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $UTF8.fromString($tmp); }
      """
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** url_domain(url) → registrable (pay-level) domain of the URL's host —
  * the key domain caps and temperature mixes group on. */
case class UrlDomain(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_domain"
  protected override def nullSafeEval(url: Any): Any = {
    val d = TextLib.registrableDomain(
      TextLib.urlHost(url.asInstanceOf[UTF8String].toString))
    if (d == null) null else UTF8String.fromString(d)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => {
      val tmp = ctx.freshName("dom")
      s"""
        java.lang.String $tmp = graft.text.TextLib.registrableDomain(
          graft.text.TextLib.urlHost($u.toString()));
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $UTF8.fromString($tmp); }
      """
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ac_contains(text) → does ANY blocklist pattern occur? The
  * [[graft.text.AhoCorasick]] automaton rides inside the serialized
  * expression (the [[BpeEncode]] broadcast-model shape): one O(text) scan
  * per row regardless of pattern count — the term-blocklist filter at
  * 10k+ patterns where an alternation regex dies. */
case class AcContains(child: Expression, model: graft.text.AhoCorasick)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ac_contains"
  protected override def nullSafeEval(text: Any): Any =
    model.containsAny(text.asInstanceOf[UTF8String].toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("acModel", model, "graft.text.AhoCorasick")
    defineCodeGen(ctx, ev, t => s"$mRef.containsAny($t.toString())")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ac_find(text) → ascending distinct indexes of the blocklist patterns
  * occurring in the text (which rules fired, for triage/reporting). */
case class AcFind(child: Expression, model: graft.text.AhoCorasick)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ac_find"
  protected override def nullSafeEval(text: Any): Any =
    new GenericArrayData(
      AcFind.box(model.findAll(text.asInstanceOf[UTF8String].toString)))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("acModel", model, "graft.text.AhoCorasick")
    defineCodeGen(ctx, ev, t => s"$GAD(graft.functions.AcFind.box($mRef.findAll($t.toString())))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object AcFind {
  /** codegen helper: int[] → Object[] for GenericArrayData. */
  def box(a: Array[Int]): Array[Any] = a.map(i => i: Any)
}

/** unigram_encode(text) → unigram-LM token array under a trained
  * [[graft.text.UnigramModel]] — the [[BpeEncode]] broadcast-model shape
  * (model inside the serialized expression, `addReferenceObj` codegen,
  * map-only, per-executor Viterbi cache). */
case class UnigramEncode(child: Expression, model: graft.text.UnigramModel)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_encode"
  protected override def nullSafeEval(text: Any): Any =
    new GenericArrayData(BpeEncode.toUtf8(
      model.encode(text.asInstanceOf[UTF8String].toString)).asInstanceOf[Array[Any]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("unigramModel", model, "graft.text.UnigramModel")
    defineCodeGen(ctx, ev, t =>
      s"$GAD(graft.functions.BpeEncode.toUtf8($mRef.encode($t.toString())))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ivfpq_encode(vec) → struct(cell INT, codes BINARY): the IVF-PQ index
  * entry. Coarse centroid assignment + per-subspace residual codeword
  * bytes in one per-row pass ([[VectorLib.ivfPqAssign]]). The trained
  * model (coarse centroids + PQ codebooks) rides inside the serialized
  * expression ([[NearestCells]] pattern) — map-only encode, no shuffle.
  * The index retains m bytes per vector instead of 4·dim: the memory
  * contract that lets a 100 TB embedding corpus fit an ANN tier. */
case class IvfPqEncode(child: Expression, centroids: Array[Array[Float]],
    codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivfpq_encode"
  protected override def nullSafeEval(v: Any): Any =
    IvfPqEncode.assignRow(v.asInstanceOf[ArrayData].toFloatArray(), centroids, codebooks)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCentroids", centroids, "float[][]")
    val bRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.IvfPqEncode.assignRow($v.toFloatArray(), $cRef, $bRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IvfPqEncode {
  /** shared eval/codegen helper: kernel tuple → InternalRow(cell, codes). */
  def assignRow(v: Array[Float], centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]]): org.apache.spark.sql.catalyst.InternalRow = {
    val (cell, codes) = VectorLib.ivfPqAssign(v, centroids, codebooks)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cell, codes))
  }
}

/** pq_lut(vec) → the query's ADC lookup table (array<float>, m·ksub wide):
  * ⟨q̂ subvector, codeword⟩ for every (subspace, codeword). Computed once
  * per query row; every candidate afterwards scores in m table adds
  * ([[PqAdc]]) instead of a dim-length dot. */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"
  protected override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorLib.pqLut(v.asInstanceOf[ArrayData].toFloatArray(), codebooks))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, v =>
      s"$GAD(graft.vector.VectorLib.pqLut($v.toFloatArray(), $bRef))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_adc(lut, codes) → Σ_s lut[s·ksub + code_s]: the per-candidate ADC
  * residual term — m byte-indexed table adds, no vector math. */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  protected override def nullSafeEval(lut: Any, codes: Any): Any =
    VectorLib.pqAdc(lut.asInstanceOf[ArrayData].toFloatArray(), ksub,
      codes.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) =>
      s"graft.vector.VectorLib.pqAdc($l.toFloatArray(), $ksub, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cell_dot(vec, cell) → ⟨q̂, centroids(cell)⟩: the coarse term of the ADC
  * score (codebooks quantize residuals off the cell centroid). */
case class CellDot(left: Expression, right: Expression, centroids: Array[Array[Float]])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_dot"
  protected override def nullSafeEval(v: Any, cell: Any): Any =
    VectorLib.cellDot(v.asInstanceOf[ArrayData].toFloatArray(), centroids,
      cell.asInstanceOf[Number].intValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCentroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.vector.VectorLib.cellDot($v.toFloatArray(), $cRef, $c)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** unicode_normalize(text, form) → UAX #15 normalization (NFC/NFD/NFKC/
  * NFKD). Per-row codegen'd map — the canonical pre-dedup cleanup pass. */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"
  protected override def nullSafeEval(text: Any, form: Any): Any =
    UTF8String.fromString(TextLib.unicodeNormalize(
      text.asInstanceOf[UTF8String].toString, form.asInstanceOf[UTF8String].toString))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, f) =>
      s"$UTF8.fromString(graft.text.TextLib.unicodeNormalize($t.toString(), $f.toString()))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** strip_html(html) → visible text: tags stripped, script/style/title
  * elided, entities decoded, whitespace collapsed ([[graft.text.HtmlLib]]
  * — the web-crawl extraction pass). */
case class StripHtml(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "strip_html"
  protected override def nullSafeEval(html: Any): Any =
    UTF8String.fromString(HtmlLib.stripHtml(html.asInstanceOf[UTF8String].toString))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h =>
      s"$UTF8.fromString(graft.text.HtmlLib.stripHtml($h.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** html_title(html) → first title element's text, or null. */
case class HtmlTitle(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_title"
  protected override def nullSafeEval(html: Any): Any = {
    val t = HtmlLib.htmlTitle(html.asInstanceOf[UTF8String].toString)
    if (t == null) null else UTF8String.fromString(t)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val t = ctx.freshName("title")
      s"""String $t = graft.text.HtmlLib.htmlTitle($h.toString());
         |if ($t == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $UTF8.fromString($t); }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** html_links(html) → href values of anchor tags, in document order. */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_links"
  protected override def nullSafeEval(html: Any): Any =
    new GenericArrayData(
      HtmlCodegenHelpers.linksUtf8(html.asInstanceOf[UTF8String].toString))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h =>
      s"$GAD(graft.functions.HtmlCodegenHelpers.linksUtf8($h.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static bridge for generated code: UTF8String-ify the kernel's link
  * array once, outside the Spark-free [[graft.text.HtmlLib]]. */
object HtmlCodegenHelpers {
  def linksUtf8(html: String): Array[AnyRef] =
    graft.text.HtmlLib.htmlLinks(html).map(s => UTF8String.fromString(s): AnyRef)
}
