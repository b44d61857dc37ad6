package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

import scala.collection.mutable

/** `collect_list_capped(expr, cap)` — collect_list whose aggregation
  * buffer never holds more than `cap` elements.
  *
  * Why a custom Catalyst aggregate: the candidate generators (LSH band
  * buckets, inverted-index posting groups — Dedup.minhashLsh /
  * ngramJaccard) group a corpus-sized stream by a key whose groups are
  * *discarded* whenever they exceed a size bound (stop-shingles,
  * boilerplate buckets). Built-in `collect_list` must buffer the whole
  * group before the bound can be checked, so one pathological key
  * (df in the millions at 100 TB) holds a partition's whole aggregation
  * hash map hostage. Capping inside the aggregate keeps every buffer —
  * map-side partials and the reduce-side merge alike — bounded by `cap`,
  * making the single-shuffle grouped-pairs plan skew-proof.
  *
  * Semantics: groups whose true size is ≤ cap get their COMPLETE list
  * (order unspecified, as with collect_list); larger groups get an
  * arbitrary cap-sized subset — pair callers always compute the exact
  * group size with a sibling `count(*)` and filter `> cap` groups out,
  * so the truncated lists are never observed. Nulls are skipped, like
  * collect_list.
  *
  * (Reference analog: hadron caps nothing — its reduce-side join buffers
  * n−1 datasets per key in an unbounded HashMap,
  * /root/reference/src/Hadron/Join.hs:60-66. This is the part you fix
  * when the key distribution has a heavy tail.)
  */
@ExpressionDescription(
  usage = "_FUNC_(expr, cap) - Collects at most `cap` elements per group into a list.")
case class CollectListCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(
      b1: mutable.ArrayBuffer[Any], b2: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = cap - b1.length
    if (room > 0) b1 ++= b2.view.take(room)
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, true)))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    mutable.ArrayBuffer.from(row.getArray(0).toObjectArray(child.dataType))
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectListCapped =
    copy(child = newChild)

  override def prettyName: String = "collect_list_capped"
}
