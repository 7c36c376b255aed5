package graft.functions

import java.util.{ArrayList => JArrayList}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp

import graft.geom.GeomLib

/** st_union_agg(geom) — aggregate geometry union ("dissolve"; the DuckDB
  * spatial `ST_Union_Agg` / PostGIS `ST_Union(geom)` aggregate).
  *
  * Scale shape: a [[TypedImperativeAggregate]], so Spark's partial/final
  * split applies — each map task unions its local geometries down to ONE
  * geometry before the shuffle (serialize() compacts the buffer), and the
  * reduce side unions the per-partition results. A group with millions of
  * input polygons ships one WKB per upstream partition, not the inputs.
  * The in-memory buffer self-compacts every `CompactAt` geometries via
  * JTS UnaryUnionOp (cascaded union — pairwise-union of sorted inputs is
  * quadratic; the cascade is the published fix), bounding buffer size
  * regardless of group cardinality.
  *
  * Broken WKB rows are skipped (the engine's decode-null posture); a group
  * with no valid geometry yields null.
  */
case class StUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JArrayList[Geometry]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  private val CompactAt = 64

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_union_agg"

  override def createAggregationBuffer(): JArrayList[Geometry] =
    new JArrayList[Geometry]()

  private def compact(buf: JArrayList[Geometry]): Unit =
    if (buf.size > 1) {
      val merged = UnaryUnionOp.union(buf)
      buf.clear()
      if (merged != null) buf.add(merged)
    }

  override def update(buf: JArrayList[Geometry], input: InternalRow): JArrayList[Geometry] = {
    val wkb = child.eval(input)
    if (wkb != null) {
      val g = GeomLib.readOrNull(wkb.asInstanceOf[Array[Byte]])
      if (g != null && !g.isEmpty) {
        buf.add(g)
        if (buf.size >= CompactAt) compact(buf)
      }
    }
    buf
  }

  override def merge(buf: JArrayList[Geometry], other: JArrayList[Geometry]): JArrayList[Geometry] = {
    buf.addAll(other)
    if (buf.size >= CompactAt) compact(buf)
    buf
  }

  override def eval(buf: JArrayList[Geometry]): Any = {
    if (buf.isEmpty) return null
    compact(buf)
    GeomLib.write(buf.get(0))
  }

  /** Partial-aggregation wire format: compact to one geometry, ship its
    * WKB — this is where the map-side combine pays off. */
  override def serialize(buf: JArrayList[Geometry]): Array[Byte] = {
    if (buf.isEmpty) return Array.emptyByteArray
    compact(buf)
    GeomLib.write(buf.get(0))
  }

  override def deserialize(bytes: Array[Byte]): JArrayList[Geometry] = {
    val buf = new JArrayList[Geometry]()
    if (bytes.nonEmpty) {
      val g = GeomLib.readOrNull(bytes)
      if (g != null && !g.isEmpty) buf.add(g)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): StUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): StUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
