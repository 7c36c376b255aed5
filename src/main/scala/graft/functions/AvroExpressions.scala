package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** avro_schema(payload) — the writer-schema JSON of an Avro object
  * container blob ([[graft.sources.Avro]]); null for non-Avro input.
  * Reads only the header bytes — the schema-discovery probe. */
case class AvroSchemaOf(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {
  override def prettyName: String = "avro_schema"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  protected override def nullSafeEval(p: Any): Any = {
    val s = graft.sources.Avro.schemaOf(p.asInstanceOf[Array[Byte]])
    if (s == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(s)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** avro_records(payload, 'schema json') — decode an Avro object
  * container blob into an array of typed rows. The schema is a PLAN-TIME
  * constant (it fixes the expression's dataType); `Avro.read` discovers
  * it from one file header and threads it here. Blobs whose embedded
  * schema fails to parse, non-Avro blobs, and corrupt tails yield the
  * rows decoded so far (possibly empty) — the crawl posture. A blob
  * whose embedded writer schema maps to a different Catalyst shape than
  * the plan-time schema yields an EMPTY array: a mixed-schema glob
  * degrades to the matching files instead of mis-typed rows. */
case class AvroRecords(child: Expression, schemaJson: String)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def prettyName: String = "avro_records"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override val dataType: DataType =
    ArrayType(graft.sources.Avro.sparkSchema(schemaJson),
      containsNull = false)
  protected override def nullSafeEval(p: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.sources.Avro.records(p.asInstanceOf[Array[Byte]], schemaJson)
        .asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
