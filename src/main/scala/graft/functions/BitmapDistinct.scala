package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** bitmap_distinct(id bigint) → bigint: EXACT distinct count over a
  * bounded non-negative id domain, accumulated in a bitmap — the classic
  * OLAP accelerator (Doris/ClickHouse `bitmap` types, Druid's
  * committed-bitmap columns) for dimensions whose ids are dense surrogate
  * keys. Against `count(DISTINCT x)`'s expand-or-two-phase plan, the
  * bitmap is a fixed-width mergeable buffer: partial aggregation ORs
  * bitmaps map-side, the shuffle carries one bitmap per group instead of
  * one row per distinct value — at 100 TB that's the difference between
  * shuffling the distinct keyspace and shuffling |groups| × (maxId/8)
  * bytes.
  *
  * This is the repo's [[TypedImperativeAggregate]] exemplar: a custom
  * aggregation BUFFER type (java.util.BitSet) with update / merge /
  * serialize hooks — the extension point the scalar expressions in
  * [[ArrayExprs]] don't exercise.
  *
  * Domain contract: ids must be in [0, 2^31). Out-of-range input fails
  * loudly (a silent modulo would return a wrong count). NULL ids are
  * ignored, like every Spark aggregate.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] {

  override def children: Seq[Expression] = Seq(child)

  // integral children only, validated at ANALYSIS time — a non-integral
  // id would otherwise surface as a raw ClassCastException mid-job with
  // no mention of the function or its contract (ImplicitCastInputTypes
  // is off-limits here: AbstractDataType is private[sql])
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bitmap_distinct: id must be an integral type, got ${dt.simpleString}")
    }

  // width-specific extractor resolved once at plan time, not per row
  private lazy val toLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
  }
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet()

  override def update(buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = toLong(v)
      if (id < 0 || id > Int.MaxValue)
        throw new IllegalArgumentException(
          s"bitmap_distinct: id $id outside the bitmap domain [0, 2^31)")
      buf.set(id.toInt)
    }
    buf
  }

  override def merge(buf: java.util.BitSet, other: java.util.BitSet): java.util.BitSet = {
    buf.or(other)
    buf
  }

  override def eval(buf: java.util.BitSet): Any = buf.cardinality().toLong

  override def serialize(buf: java.util.BitSet): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
