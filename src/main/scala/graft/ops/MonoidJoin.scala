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
        // Buffer per-dataset lists (reference buffers n−1 and streams the
        // last; at Spark's group granularity buffering all n is equivalent —
        // per-key fan-in is small by the same assumption the reference makes
        // with its in-memory HashMap, Join.hs:60-66).
        val buf = Array.fill(n)(List.newBuilder[A])
        rows.foreach { case (_, i, a) => buf(i) += a }
        val lists: Array[List[A]] = buf.map(_.result())
        if (lists.zipWithIndex.exists { case (l, i) =>
              l.isEmpty && sides(i) == JRequired
            }) Iterator.empty
        else {
          // cross product of per-dataset lists, missing optional ⇒ [empty]
          val effective =
            lists.map(l => if (l.isEmpty) List(m.empty) else l)
          val combos = effective.foldLeft(List(List.empty[A])) { (acc, l) =>
            for (stem <- acc; x <- l) yield stem :+ x
          }
          combos.iterator.map(c => (key, c.reduce(m.combine)))
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
