package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** `topk_by(id, score, k)` — the k best DISTINCT ids by
  * (score desc, id asc), returned as `array<struct<id, score>>` in rank
  * order. If an id appears more than once, its highest score wins
  * (argmax-k semantics).
  *
  * Why a custom Catalyst aggregate: every similarity operator
  * (Similarity.bruteForceTopK / lshTopK / ivfTopK) ends with "rank the
  * scored (query, candidate) pairs per query, keep k". The window
  * formulation (`row_number().over(partitionBy(query))`) shuffles EVERY
  * scored row to its query's rank partition — at a 100 TB corpus the
  * |corpus|x|queries| score stream IS the job, and that shuffle is the
  * bottleneck. As a bounded aggregate the top-k runs map-side first
  * (ObjectHashAggregate partial), so only k-row partials per (partition,
  * query) reach the exchange: the shuffle volume drops from |scores| to
  * |partitions| x |queries| x k.
  *
  * The distinct-by-id fold also subsumes the candidate `DISTINCT` that
  * multi-table LSH needs (the same pair surfaces in several hash tables
  * with an identical, deterministic score) — one aggregation replaces a
  * full-width distinct shuffle plus the rank shuffle.
  *
  * Buffer contract: at most `max(2k, k+16)` entries between trims, k
  * after; merge concatenates partials (each already ≤ trim bound) and
  * re-trims — constant memory per group at every stage. Null ids and
  * null scores are skipped, like the builtin aggregates.
  *
  * (Reference analog: hadron has no ANN surface; this serves graft's
  * LLM-pipeline extension, SURVEY §2 similarity family.)
  */
@ExpressionDescription(
  usage = "_FUNC_(id, score, k) - Top k distinct ids by (score DESC, id ASC) as array<struct<id,score>>.")
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Any, Double)]]
  with BinaryLike[Expression] {

  require(k > 0, s"topk_by k must be positive, got $k")

  override def left: Expression = idExpr
  override def right: Expression = scoreExpr

  /** Fail at analysis time, not task runtime: the id is both sorted (tie
    * break) and hashed (distinct fold), so it must be an orderable type —
    * a map-typed id would otherwise blow up inside a task via the lazy
    * interpreted ordering.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(idExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_by id must be an orderable type, got ${idExpr.dataType.catalogString}")
    else if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by score must be double, got ${scoreExpr.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idExpr.dataType)

  /** rank order: score desc, id asc — the same total order as the window
    * formulation's `orderBy(sim.desc, id.asc)`.
    */
  @transient private lazy val rankOrdering: Ordering[(Any, Double)] =
    new Ordering[(Any, Double)] {
      def compare(a: (Any, Double), b: (Any, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else idOrdering.compare(a._1, b._1)
      }
    }

  private val trimAt = math.max(2 * k, k + 16)

  /** Sort by rank, keep each id's first (= best) occurrence, take k. */
  private def trim(
      buf: mutable.ArrayBuffer[(Any, Double)]): mutable.ArrayBuffer[(Any, Double)] = {
    if (buf.length <= k) return buf
    val sorted = buf.sorted(rankOrdering)
    val seen = new mutable.HashSet[Any]()
    val out = new mutable.ArrayBuffer[(Any, Double)](k)
    val it = sorted.iterator
    while (it.hasNext && out.length < k) {
      val e = it.next()
      if (seen.add(e._1)) out += e
    }
    out
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Any, Double)] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[(Any, Double)],
      input: InternalRow): mutable.ArrayBuffer[(Any, Double)] = {
    val id = idExpr.eval(input)
    val s = scoreExpr.eval(input)
    if (id != null && s != null) {
      buf += ((InternalRow.copyValue(id), s.asInstanceOf[Double]))
      if (buf.length >= trimAt) trim(buf) else buf
    } else buf
  }

  override def merge(
      b1: mutable.ArrayBuffer[(Any, Double)],
      b2: mutable.ArrayBuffer[(Any, Double)]): mutable.ArrayBuffer[(Any, Double)] =
    trim(b1 ++= b2)

  override def eval(buf: mutable.ArrayBuffer[(Any, Double)]): Any = {
    // final trim also handles the ≤-k-but-with-duplicates case trim()
    // short-circuits past: sort + dedup unconditionally here
    val sorted = buf.sorted(rankOrdering)
    val seen = new mutable.HashSet[Any]()
    val out = new mutable.ArrayBuffer[InternalRow](k)
    val it = sorted.iterator
    while (it.hasNext && out.length < k) {
      val e = it.next()
      if (seen.add(e._1)) out += new GenericInternalRow(Array[Any](e._1, e._2))
    }
    new GenericArrayData(out.toArray[Any])
  }

  @transient private lazy val elementType = StructType(Seq(
    StructField("id", idExpr.dataType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def nullable: Boolean = false

  // @transient like the orderings: a codegen'd projection must never ride
  // Java serialization if the initialized expression instance is shipped
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.ArrayBuffer[(Any, Double)]): Array[Byte] = {
    val rows = buf.map(e =>
      new GenericInternalRow(Array[Any](e._1, e._2)): Any).toArray
    projection.apply(InternalRow(new GenericArrayData(rows))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Any, Double)] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val out = new mutable.ArrayBuffer[(Any, Double)](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      val st = arr.getStruct(i, 2)
      out += ((InternalRow.copyValue(st.get(0, idExpr.dataType)), st.getDouble(1)))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(idExpr = newLeft, scoreExpr = newRight)

  override def prettyName: String = "topk_by"
}
