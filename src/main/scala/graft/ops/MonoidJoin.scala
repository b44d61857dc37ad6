package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import scala.reflect.ClassTag

/** Per-input join requirement — port of `JoinType`
  * (/root/reference/src/Hadron/Join.hs:48-49): `JRequired` ≈ inner,
  * `JOptional` ≈ outer with monoid-`empty` (not NULL) for the missing side.
  */
sealed trait JoinSide extends Serializable
case object JRequired extends JoinSide
case object JOptional extends JoinSide

/** Monoid over the payload type, matching the `Monoid b` constraint of
  * hadron's `joinStep` (/root/reference/src/Hadron/Controller.hs:1165-1222).
  * `empty` plays `mempty` for missing optional sides (Join.hs:96-100).
  */
trait Monoid[A] extends Serializable {
  def empty: A
  def combine(x: A, y: A): A
}
object Monoid {
  def apply[A](zero: A)(f: (A, A) => A): Monoid[A] = new Monoid[A] {
    val empty: A = zero
    def combine(x: A, y: A): A = f(x, y)
  }
  implicit val stringConcat: Monoid[String] = apply("")(_ + _)
  implicit val longSum: Monoid[Long] = apply(0L)(_ + _)
  implicit val doubleSum: Monoid[Double] = apply(0.0)(_ + _)
  implicit def seqConcat[A]: Monoid[Seq[A]] = apply(Seq.empty[A])(_ ++ _)
}

/** Multi-way monoidal join — the Spark-native port of hadron's `joinStep`
  * (/root/reference/src/Hadron/Controller.hs:1165-1222, state machine in
  * Join.hs:60-195).
  *
  * Semantics (`bufToStr`, Join.hs:81-111): per key, each dataset contributes
  * the LIST of its rows for that key; output = the cross-product across
  * datasets of those lists, each combination folded with `mconcat`. A
  * missing OPTIONAL dataset contributes `[mempty]`; a missing REQUIRED
  * dataset eliminates the key. This is NOT a SQL outer join — no NULL
  * padding, `mempty` substitution instead — so it is provided as a typed
  * operator and property-tested against the reference truth table.
  *
  * Implementation: tag each input with its dataset index, union, group by
  * key, and fold the per-key lists. The reference does exactly this with a
  * reducer that buffers datasets 1..n−1 in a HashMap and streams the nth
  * (Join.hs:60-66); Spark's shuffle + `flatMapGroups` reproduces it with
  * spillable group buffers. When the payload is relational (columns, not an
  * opaque monoid), prefer plain `DataFrame` joins — Catalyst then picks
  * broadcast/sort-merge, pushes filters below the join, and handles skew
  * via AQE, none of which the reference can do.
  */
object MonoidJoin {

  /** One input: a (key, payload) dataset plus its required/optional flag. */
  final case class Input[K, A](ds: Dataset[(K, A)], side: JoinSide)

  /** N-way monoidal join. Output: one (key, mconcat'ed payload) row per
    * cross-product combination, matching Join.hs:81-111 exactly.
    */
  def joinStep[K: Encoder, A](inputs: Seq[Input[K, A]])(implicit
      m: Monoid[A],
      tagEnc: Encoder[(K, Int, A)],
      outEnc: Encoder[(K, A)]): Dataset[(K, A)] = {
    require(inputs.nonEmpty, "joinStep of zero inputs")
    val n = inputs.size
    val sides = inputs.map(_.side).toArray
    val tagged = inputs.zipWithIndex
      .map { case (in, i) => in.ds.map { case (k, a) => (k, i, a) } }
      .reduce(_ union _)

    tagged
      .groupByKey(_._1)
      .flatMapGroups { (key: K, rows: Iterator[(K, Int, A)]) =>
        // Buffer per-dataset input lists. The reference buffers n−1 and
        // streams the nth from its sorted reducer input (Join.hs:60-66);
        // flatMapGroups delivers the group in arbitrary tag order, so all
        // n input lists are buffered — but that is O(Σ inputs) per key,
        // matching the reference's HashMap. What must NOT be buffered is
        // the O(∏) cross-product; see the stems/stream emit below.
        val buf = Array.fill(n)(List.newBuilder[A])
        rows.foreach { case (_, i, a) => buf(i) += a }
        val lists: Array[List[A]] = buf.map(_.result())
        if (lists.zipWithIndex.exists { case (l, i) =>
              l.isEmpty && sides(i) == JRequired
            }) Iterator.empty
        else {
          // cross product of per-dataset lists, missing optional ⇒ [empty].
          val effective =
            lists.map(l => if (l.isEmpty) List(m.empty) else l)
          // `emitStream` analog (Join.hs:109-111,164-195): hadron buffers
          // datasets 1..n−1 and STREAMS the nth, emitting `mappend stem x`
          // per arriving row. Same shape here: the first n−1 lists fold
          // into pre-combined stems — each a single A, built in the exact
          // left-reduce order a strict combo would use, so no law beyond
          // what `reduce` already used is assumed — and the nth list
          // streams through them via a lazy iterator. Per-key memory is
          // O(∏ sizes of the first n−1 lists) values (put the big dataset
          // LAST, as in hadron); the cross-product never materializes.
          if (n == 1) effective(0).iterator.map((key, _))
          else {
            val stems = effective.view.slice(1, n - 1)
              .foldLeft(effective(0)) { (acc, l) =>
                for (s <- acc; x <- l) yield m.combine(s, x)
              }
            effective(n - 1).iterator.flatMap { x =>
              stems.iterator.map(s => (key, m.combine(s, x)))
            }
          }
        }
      }
  }

  /** 2-way inner monoidal join — port of `joinMR`
    * (Controller.hs:1325-1354): reducer caches the left rows per key, emits
    * `mappend l r` for each right row. Relationally that is exactly an
    * inner equi-join followed by a combine map, which Spark executes as a
    * streaming sort-merge (or broadcast) join — constant memory, spillable,
    * strictly better than the reference's per-key cache.
    */
  def joinMR[K, A](left: Dataset[(K, A)], right: Dataset[(K, A)])(implicit
      m: Monoid[A],
      tripleEnc: Encoder[(K, A, A)],
      outEnc: Encoder[(K, A)]): Dataset[(K, A)] = {
    val l = left.toDF("k", "lv")
    val r = right.toDF("k", "rv")
    l.join(r, Seq("k"))
      .as[(K, A, A)]
      .map { case (k, lv, rv) => (k, m.combine(lv, rv)) }
  }
}
