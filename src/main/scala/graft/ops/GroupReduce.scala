package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

/** What to do when a per-group reducer throws — port of
  * `ReduceErrorStrategy` (/root/reference/src/Hadron/Types.hs:56-60).
  * `ReSkip` drops the failing key's output (reference: skip key);
  * `ReThrow` propagates (reference: rethrow / default Hadoop behavior).
  * The reference's `ReRetry` re-runs the attempt; on Spark task retries
  * already re-run failed groups, so retry collapses into `ReThrow`.
  */
sealed trait ReduceErrorStrategy
case object ReThrow extends ReduceErrorStrategy
case object ReSkip extends ReduceErrorStrategy

/** The grouped-reduce family — the Spark-native port of hadron's reduce
  * stage (`Reducer k a r`, /root/reference/src/Hadron/Types.hs:40-53, driven
  * by the group splitter in Basic.hs:231-268).
  *
  * Hadron's contract: records sharing a key prefix (`partSegs` segments of a
  * tab-joined composite key) arrive at one reducer, iterated in full-key
  * sorted order (Hadoop sorts map output on all `keySegs` segments —
  * Run/Hadoop.hs:129-166). That is exactly Spark's "secondary sort" pattern:
  * repartition on the group columns, sort within partitions on group + order
  * columns, then stream each partition splitting on group-key change.
  *
  * Scale notes: this never materializes a whole group in memory (unlike
  * `groupByKey(...).flatMapGroups` + in-memory sort) — the shuffle writes
  * sorted runs, `sortWithinPartitions` merges them, and the iterator streams
  * — the same constant-memory property the reference gets from conduits over
  * Hadoop's sorted stream. Use `aggregate`/`reduceGroups` instead whenever
  * the reduction is a commutative monoid: Catalyst then adds a map-side
  * partial aggregate (hadron's `combiner`, Basic.hs:163-174) automatically.
  */
object GroupReduce {

  /** Order-preserving grouped reduce with secondary sort.
    *
    * @param groupCols  key-prefix columns (hadron's first `partSegs` key segments)
    * @param sortCols   in-group ordering (hadron's remaining key segments)
    * @param reduce     streaming per-group reducer: (group key row, rows in
    *                   sorted order) → output rows. The iterator is
    *                   single-pass, like the reference's conduit.
    */
  def secondarySort[R: Encoder](
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      onError: ReduceErrorStrategy = ReThrow)(
      reduce: (Row, Iterator[Row]) => Iterator[R]): Dataset[R] = {
    val keyed = df.repartition(groupCols.map(col): _*)
      .sortWithinPartitions(groupCols.map(col) ++ sortCols: _*)
    val gidx = groupCols.map(df.schema.fieldIndex)
    keyed.mapPartitions { rows =>
      new GroupIterator(rows, (r: Row) => gidx.map(r.get)).flatMap {
        case (key, group) =>
          try reduce(key, group)
          catch {
            case e: Throwable if onError == ReSkip =>
              group.foreach(_ => ()) // drain so the stream stays aligned
              Iterator.empty
          }
      }
    }
  }

  /** Split a partition-sorted row stream into per-key sub-iterators — the
    * port of hadron's `sameKey` group detector (Basic.hs:255-268), which
    * compares the first `eqSegs` key segments and starts a fresh conduit per
    * group. Groups must be consumed in order (single pass), as in the
    * reference.
    */
  private final class GroupIterator(
      rows: Iterator[Row],
      keyOf: Row => Seq[Any])
      extends Iterator[(Row, Iterator[Row])] {
    private val buf = rows.buffered
    private var current: BufferedIterator[Row] = _

    def hasNext: Boolean = {
      if (current != null) { while (current.hasNext) current.next() } // drain
      buf.hasNext
    }

    def next(): (Row, Iterator[Row]) = {
      if (!hasNext) throw new NoSuchElementException
      val head = buf.head
      val key = keyOf(head)
      val group = new Iterator[Row] {
        def hasNext: Boolean = buf.hasNext && keyOf(buf.head) == key
        def next(): Row =
          if (hasNext) buf.next() else throw new NoSuchElementException
      }.buffered
      current = group
      (head, group)
    }
  }
}
