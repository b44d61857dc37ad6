package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators — the port of hadron's combiner-compatible fold
  * reducers (/root/reference/src/Hadron/Basic.hs:163-174 `combiner`;
  * fold idiom in examples/WordCount.hs:27-29).
  *
  * A hadron `Reducer` used with a combiner must be associative (the same
  * conduit runs map-side and reduce-side); Spark's `Aggregator[IN,BUF,OUT]`
  * makes that contract explicit: `reduce` runs map-side (partial
  * aggregation), `merge` combines partials after the shuffle — exactly the
  * combiner/reducer split, managed by HashAggregateExec.
  */
object Aggregators {

  /** Generic monoid fold over a projection — the `C.fold` idiom. */
  def foldAggregator[IN, B: Encoder](m: Monoid[B])(f: IN => B)
      : Aggregator[IN, B, B] =
    new Aggregator[IN, B, B] {
      def zero: B = m.empty
      def reduce(b: B, a: IN): B = m.combine(b, f(a))
      def merge(x: B, y: B): B = m.combine(x, y)
      def finish(b: B): B = b
      def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
      def outputEncoder: Encoder[B] = implicitly[Encoder[B]]
    }

  /** Long-sum aggregator over a projection (exact, order-independent). */
  def sumLong[IN](f: IN => Long): Aggregator[IN, Long, Long] =
    foldAggregator[IN, Long](Monoid.longSum)(f)(Encoders.scalaLong)

  /** Streaming-friendly top-k: keeps the k largest keys seen (bounded
    * buffer — the constant-memory property hadron gets from conduits).
    */
  def topK[IN](k: Int)(f: IN => Long): Aggregator[IN, Seq[Long], Seq[Long]] =
    new Aggregator[IN, Seq[Long], Seq[Long]] {
      def zero: Seq[Long] = Seq.empty
      private def trim(s: Seq[Long]): Seq[Long] =
        s.sorted(Ordering[Long].reverse).take(k)
      def reduce(b: Seq[Long], a: IN): Seq[Long] = trim(b :+ f(a))
      def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)
      def finish(b: Seq[Long]): Seq[Long] = b
      def bufferEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
      def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
    }
}
