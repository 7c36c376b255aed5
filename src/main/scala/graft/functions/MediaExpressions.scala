package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.{ImplicitCastInputTypes, UnaryExpression}
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
