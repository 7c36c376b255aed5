package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._

/** SQL-callable PNG pixel accessors over [[graft.multimodal.PngCodec]] —
  * the scalar face of the multimodal decode path (`png_width`,
  * `png_height`, `png_pixel_sum`), null for anything that is not a
  * decodable PNG. Each accessor decodes independently (scalar-function
  * semantics); pipelines needing all stats at once use
  * `Multimodal.pngPixelStats`, which decodes once per row. */
abstract class PngAccessorExpression extends UnaryExpression
    with ImplicitCastInputTypes with WkbStaticCodegen {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
}

case class PngWidth(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "png_width"
  override def dataType: DataType = IntegerType
  override def staticMethod: String = "graft.multimodal.PngCodec.width"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.PngCodec.width(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PngHeight(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "png_height"
  override def dataType: DataType = IntegerType
  override def staticMethod: String = "graft.multimodal.PngCodec.height"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.PngCodec.height(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class PngPixelSum(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "png_pixel_sum"
  override def dataType: DataType = LongType
  override def staticMethod: String = "graft.multimodal.PngCodec.pixelSum"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.PngCodec.pixelSum(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Baseline-JPEG luma accessors over [[graft.multimodal.JpegCodec]]. */
case class JpegLumaWidth(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "jpeg_luma_width"
  override def dataType: DataType = IntegerType
  override def staticMethod: String = "graft.multimodal.JpegCodec.lumaWidth"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.JpegCodec.lumaWidth(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class JpegLumaHeight(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "jpeg_luma_height"
  override def dataType: DataType = IntegerType
  override def staticMethod: String = "graft.multimodal.JpegCodec.lumaHeight"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.JpegCodec.lumaHeight(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class JpegLumaSum(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "jpeg_luma_sum"
  override def dataType: DataType = LongType
  override def staticMethod: String = "graft.multimodal.JpegCodec.lumaSum"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.JpegCodec.lumaSum(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Lossless-JPEG (SOF3) accessors over [[graft.multimodal.JpegLossless]]
  * — up-to-16-bit sample planes, so sums ride their own expressions
  * rather than the byte-plane luma path (which 8-bit SOF3 also joins). */
case class JpegLosslessPrecision(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "jpeg_lossless_precision"
  override def dataType: DataType = IntegerType
  override def staticMethod: String = "graft.multimodal.JpegLossless.precisionOf"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.JpegLossless.precisionOf(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class JpegLosslessSum(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "jpeg_lossless_sum"
  override def dataType: DataType = LongType
  override def staticMethod: String = "graft.multimodal.JpegLossless.sampleSum"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.JpegLossless.sampleSum(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 12-bit extended-sequential (SOF1) accessors over
  * [[graft.multimodal.Jpeg12]]. */
case class Jpeg12Precision(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "jpeg12_precision"
  override def dataType: DataType = IntegerType
  override def staticMethod: String = "graft.multimodal.Jpeg12.precisionOf"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.Jpeg12.precisionOf(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Jpeg12Sum(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "jpeg12_sum"
  override def dataType: DataType = LongType
  override def staticMethod: String = "graft.multimodal.Jpeg12.sampleSum"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.Jpeg12.sampleSum(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** tar_entries(payload) / zip_entries(payload) — enumerate + extract an
  * archive blob's members: (path, size, content). Directories and
  * unsupported members carry null content; corrupt tails yield the
  * parsed prefix. */
abstract class ArchiveEntriesExpression extends UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true))), containsNull = false)
  protected def run(p: Array[Byte]): Array[graft.sources.Archives.Entry]
  protected override def nullSafeEval(p: Any): Any = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    new GenericArrayData(run(p.asInstanceOf[Array[Byte]]).map { e =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.path), e.size, e.content))
    }.asInstanceOf[Array[Any]])
  }
}

case class TarEntries(child: Expression) extends ArchiveEntriesExpression {
  override def prettyName: String = "tar_entries"
  protected def run(p: Array[Byte]): Array[graft.sources.Archives.Entry] =
    graft.sources.Archives.tarEntries(p)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ZipEntries(child: Expression) extends ArchiveEntriesExpression {
  override def prettyName: String = "zip_entries"
  protected def run(p: Array[Byte]): Array[graft.sources.Archives.Entry] =
    graft.sources.Archives.zipEntries(p)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** warc_records(payload) — parse a .warc / .warc.gz blob (ISO 28500, the
  * Common Crawl container) into its records: type, target URI, HTTP
  * status/content-type, and the entity body bytes. One per-blob kernel;
  * corrupt tails yield the good prefix. */
case class WarcRecords(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_records"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("body", BinaryType, nullable = false))), containsNull = false)
  protected override def nullSafeEval(p: Any): Any = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val recs = graft.sources.Warc.parse(p.asInstanceOf[Array[Byte]])
    new GenericArrayData(recs.map { r =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(r.warcType),
          UTF8String.fromString(r.targetUri), r.httpStatus,
          UTF8String.fromString(r.httpContentType), r.body))
    }.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** audio_fingerprint(payload) — 64-bit peak-constellation fingerprint of
  * a PCM WAV (amplitude-invariant; the audio twin of image_dhash). */
case class AudioFingerprint(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "audio_fingerprint"
  override def dataType: DataType = LongType
  override def staticMethod: String = "graft.multimodal.AudioLib.fingerprintDefault"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.AudioLib.fingerprint(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** image_dhash(payload) — 64-bit perceptual difference hash over the
  * from-spec still-image decoders (PNG/JPEG/GIF/BMP): the visual SimHash
  * for image near-dup joins. Null for undecodable bytes. */
case class ImageDhash(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "image_dhash"
  override def dataType: DataType = LongType
  override def staticMethod: String = "graft.multimodal.ImageHash.dhash"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.ImageHash.dhash(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Content-defined-chunking accessors over [[graft.multimodal.Cdc]]
  * (FastCDC) — binary-level dedup signals for blob columns. */
case class CdcNChunks(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "cdc_n_chunks"
  override def dataType: DataType = IntegerType
  override def staticMethod: String = "graft.multimodal.Cdc.nChunks"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.Cdc.nChunks(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CdcFingerprint(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "cdc_fingerprint"
  override def dataType: DataType = StringType
  override def staticMethod: String = "graft.multimodal.Cdc.fingerprint"
  protected override def nullSafeEval(p: Any): Any = {
    val s = graft.multimodal.Cdc.fingerprint(p.asInstanceOf[Array[Byte]])
    if (s == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(s)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** webp_meta(payload) — RIFF chunk-walk metadata of a WebP blob as a
  * struct (format lossy/lossless/extended, canvas dims, alpha/animation
  * flags, chunk count); null for non-WebP bytes. Header-only contract —
  * no pixel decode ([[graft.multimodal.WebP.webpMeta]]). */
case class WebpMetaExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "webp_meta"
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("has_alpha", BooleanType, nullable = false),
    StructField("has_anim", BooleanType, nullable = false),
    StructField("n_chunks", IntegerType, nullable = false)))
  protected override def nullSafeEval(p: Any): Any = {
    val m = graft.multimodal.WebP.webpMeta(p.asInstanceOf[Array[Byte]])
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(m.format),
        m.width, m.height, m.has_alpha, m.has_anim, m.n_chunks))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** webp_pixel_sum(payload) — Σ(alpha+red+green+blue) over the fully
  * decoded VP8L (lossless) pixels; null when the blob has no decodable
  * VP8L payload. The decode-proving probe (png_pixel_sum's WebP twin). */
case class WebpPixelSum(child: Expression) extends PngAccessorExpression {
  override def prettyName: String = "webp_pixel_sum"
  override def dataType: DataType = LongType
  override def staticMethod: String = "graft.multimodal.WebP.vp8lPixelSum"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.WebP.vp8lPixelSum(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** geotiff_meta(payload) — raster + georeferencing metadata of a GeoTIFF
  * binary column as a struct; null for non-TIFF bytes. One IFD walk per
  * row, no pixel decode (header-only contract, like the audio/video
  * container parses). */
case class GeoTiffMeta(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "geotiff_meta"
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bands", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("sample_format", IntegerType, nullable = false),
    StructField("compression", IntegerType, nullable = false),
    StructField("tiled", BooleanType, nullable = false),
    StructField("epsg", IntegerType, nullable = false),
    StructField("model_type", IntegerType, nullable = false),
    StructField("px_scale_x", DoubleType, nullable = false),
    StructField("px_scale_y", DoubleType, nullable = false),
    StructField("origin_x", DoubleType, nullable = false),
    StructField("origin_y", DoubleType, nullable = false)))
  protected override def nullSafeEval(p: Any): Any = {
    val m = graft.sources.GeoTiff.readMeta(p.asInstanceOf[Array[Byte]])
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m.width, m.height, m.bands, m.bitsPerSample, m.sampleFormat,
        m.compression, m.tiled, m.epsg, m.modelType, m.pixelScaleX,
        m.pixelScaleY, m.originX, m.originY))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** geotiff_band_stats(payload, band) — (n, min, max, sum) over the decoded
  * samples of one band; null when the payload is not a decodable GeoTIFF
  * or the band is out of range. Full pixel decode per call. */
case class GeoTiffBandStats(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def nullable: Boolean = true
  override def prettyName: String = "geotiff_band_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("min", DoubleType, nullable = false),
    StructField("max", DoubleType, nullable = false),
    StructField("sum", DoubleType, nullable = false)))
  protected override def nullSafeEval(p: Any, b: Any): Any = {
    val st = graft.sources.GeoTiff.bandStats(p.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Number].intValue)
    if (st == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](st(0).toLong, st(1), st(2), st(3)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** geotiff_pixels(payload, band) — one struct per pixel of `band` with the
  * pixel-center model coordinates from the GeoTIFF geotransform
  * (lon = origin_x + (x+0.5)·scale_x, lat = origin_y − (y+0.5)·scale_y —
  * tiepoint is the top-left corner, north-up) and the sample value. The
  * raster→vector bridge: explode it and every downstream vector operator
  * (spatial join, H3 heatmap, zonal aggregation) applies unchanged. Null
  * for undecodable payloads, out-of-range bands, or untagged rasters
  * (no pixel scale — there is no model space to place pixels in). */
case class GeoTiffPixels(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def nullable: Boolean = true
  override def prettyName: String = "geotiff_pixels"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)
  protected override def nullSafeEval(p: Any, b: Any): Any = {
    val bytes = p.asInstanceOf[Array[Byte]]
    val band = b.asInstanceOf[Number].intValue
    val m = graft.sources.GeoTiff.readMeta(bytes)
    if (m == null || band < 0 || band >= m.bands) return null
    if (m.pixelScaleX == 0.0 || m.pixelScaleY == 0.0) return null
    val s = graft.sources.GeoTiff.readSamples(bytes)
    if (s == null) return null
    val out = new Array[Any](m.width * m.height)
    var y = 0
    var k = 0
    while (y < m.height) {
      var x = 0
      while (x < m.width) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](
            m.originX + (x + 0.5) * m.pixelScaleX,
            m.originY - (y + 0.5) * m.pixelScaleY,
            s((y * m.width + x) * m.bands + band)))
        k += 1
        x += 1
      }
      y += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** wav_rms(payload) — RMS level over every first-channel sample of a
  * 16-bit PCM WAV; null for undecodable payloads. */
case class WavRms(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with WkbStaticCodegen {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_rms"
  override def dataType: DataType = DoubleType
  override def staticMethod: String = "graft.multimodal.AudioLib.wavRms"
  protected override def nullSafeEval(p: Any): Any =
    graft.multimodal.AudioLib.wavRms(p.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** wav_spectrum(payload, nfft) — normalized power-spectrum fractions
  * (bins 0..nfft/2) of the first nfft first-channel samples, via the
  * from-spec radix-2 FFT; null for undecodable payloads, non-power-of-two
  * nfft, or clips shorter than nfft. */
case class WavSpectrum(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_spectrum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  protected override def nullSafeEval(p: Any, n: Any): Any = {
    val s = graft.multimodal.AudioLib.wavSpectrum(
      p.asInstanceOf[Array[Byte]], n.asInstanceOf[Number].intValue)
    if (s == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(s)
  }
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (p, n) => {
      val tmp = ctx.freshName("spec")
      s"""double[] $tmp = graft.multimodal.AudioLib.wavSpectrum($p, $n);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp); }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** geotiff_ifd_count(payload) — number of IFDs in the chain (COG overview
  * levels / pages); null for non-TIFF payloads. */
case class GeoTiffIfdCount(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "geotiff_ifd_count"
  override def dataType: DataType = IntegerType
  protected override def nullSafeEval(p: Any): Any = {
    val n = graft.sources.GeoTiff.ifdCount(p.asInstanceOf[Array[Byte]])
    if (n == 0) null else n
  }
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      val n = ctx.freshName("nifd")
      s"""int $n = graft.sources.GeoTiff.ifdCount($p);
         |if ($n == 0) { ${ev.isNull} = true; } else { ${ev.value} = $n; }
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** geotiff_band_stats_at(payload, band, level) — band stats of the
  * `level`-th IFD: reading a COG overview level instead of full
  * resolution is how a raster lake answers decimated queries cheaply. */
case class GeoTiffBandStatsAt(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType, IntegerType)
  override def nullable: Boolean = true
  override def prettyName: String = "geotiff_band_stats_at"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("min", DoubleType, nullable = false),
    StructField("max", DoubleType, nullable = false),
    StructField("sum", DoubleType, nullable = false)))
  protected override def nullSafeEval(p: Any, b: Any, l: Any): Any = {
    val st = graft.sources.GeoTiff.bandStats(p.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Number].intValue, l.asInstanceOf[Number].intValue)
    if (st == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](st(0).toLong, st(1), st(2), st(3)))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}
