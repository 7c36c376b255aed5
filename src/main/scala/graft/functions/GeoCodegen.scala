package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Codegen for unary WKB expressions backed by a static GeomLib method.
  *
  * CodegenFallback would split whole-stage codegen at every geometry
  * expression (interpreted dispatch + an InternalRow hand-off per row);
  * emitting a direct static call keeps the enclosing stage as one generated
  * function. The static methods return boxed/reference results whose null
  * means "broken or empty geometry", which maps onto the codegen null flag.
  */
trait WkbStaticCodegen extends UnaryExpression {

  /** Fully-qualified static method taking byte[] (a GeomLib forwarder). */
  def staticMethod: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val tmp = ctx.freshName("geoRes")
    val (resultType, assign) = dataType match {
      case DoubleType  => ("java.lang.Double", s"${ev.value} = $tmp.doubleValue();")
      case LongType    => ("java.lang.Long", s"${ev.value} = $tmp.longValue();")
      case IntegerType => ("java.lang.Integer", s"${ev.value} = $tmp.intValue();")
      case BinaryType  => ("byte[]", s"${ev.value} = $tmp;")
      case StringType  =>
        ("java.lang.String", s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($tmp);")
      case other => throw new IllegalStateException(s"unsupported codegen type $other")
    }
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${ev.isNull}) {
          $resultType $tmp = $staticMethod(${c.value});
          if ($tmp == null) {
            ${ev.isNull} = true;
          } else {
            $assign
          }
        }""")
  }
}
