package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

/** What to do when a per-group reducer throws — port of
  * `ReduceErrorStrategy` (/root/reference/src/Hadron/Types.hs:56-60; note
  * the reference only DECLARES the type — no code path in hadron ever
  * reads `_mroReduceError`, so all three strategies are implemented here
  * from the declared semantics).
  *
  * `ReThrow` propagates (default Hadoop behavior — the task fails and
  * Spark's task retry re-runs the whole partition). `ReSkip` drops the
  * failing key's output; a reducer that fails AFTER yielding some rows
  * truncates at the failure point (streamed rows cannot be recalled —
  * reducers needing all-or-nothing skip should be pure until first
  * yield). `ReRetry` re-runs the failing key up to `attempts` times and
  * then applies `onExhausted` — for transiently-failing reducers (e.g.
  * external lookups), where a full task retry would needlessly repeat
  * every healthy group in the partition.
  */
sealed trait ReduceErrorStrategy extends Serializable
case object ReThrow extends ReduceErrorStrategy
case object ReSkip extends ReduceErrorStrategy

/** Bounded per-key replay. The failing group's rows (and each attempt's
  * output) are buffered to make the replay possible — the one strategy
  * that trades the streaming constant-memory property for retryability,
  * so choose it only when single groups fit in executor memory.
  */
final case class ReRetry(
    attempts: Int,
    onExhausted: ReduceErrorStrategy = ReThrow) extends ReduceErrorStrategy {
  require(attempts >= 1, s"attempts must be >= 1, got $attempts")
  require(!onExhausted.isInstanceOf[ReRetry],
    "onExhausted must be ReThrow or ReSkip")
}

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
          onError match {
            case ReThrow => reduce(key, group)
            case ReSkip =>
              // NonFatal only: task kills (InterruptedException), OOM and
              // other VM errors must fail the task, not masquerade as a
              // skipped key
              try skipGuard(group, reduce(key, group))
              catch {
                case scala.util.control.NonFatal(_) =>
                  group.foreach(_ => ()) // drain so the stream stays aligned
                  Iterator.empty
              }
            case ReRetry(attempts, onExhausted) =>
              val buffered = group.toVector // replayable copy of the group
              def attempt(): Either[Throwable, Vector[R]] =
                try Right(reduce(key, buffered.iterator).toVector)
                catch { case scala.util.control.NonFatal(e) => Left(e) }
              var res = attempt()
              var tries = 1
              while (res.isLeft && tries < attempts) {
                res = attempt(); tries += 1
              }
              res match {
                case Right(out) => out.iterator
                case Left(_) if onExhausted == ReSkip => Iterator.empty
                case Left(e) => throw e
              }
          }
      }
    }
  }

  /** ReSkip's mid-stream guard: a reducer may fail while its OUTPUT is
    * being consumed, not just when it is constructed. Rows already
    * yielded are downstream and stay; from the failure on, the key's
    * remaining output is dropped and its input drained so the partition
    * stream stays key-aligned.
    */
  private def skipGuard[R](group: Iterator[Row], out: Iterator[R]): Iterator[R] =
    new Iterator[R] {
      private var pending: Option[R] = None
      private var failed = false
      private def advance(): Unit =
        if (!failed && pending.isEmpty)
          try { if (out.hasNext) pending = Some(out.next()) }
          catch {
            case scala.util.control.NonFatal(_) =>
              failed = true; pending = None
              group.foreach(_ => ())
          }
      def hasNext: Boolean = { advance(); pending.nonEmpty }
      def next(): R = {
        advance()
        val r = pending.getOrElse(throw new NoSuchElementException)
        pending = None
        r
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
