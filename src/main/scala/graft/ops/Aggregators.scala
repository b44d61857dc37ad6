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

  /** Exact mean of float vectors (group centroids): coordinates
    * quantize to 2^20 fixed-point longs (half-away-from-zero, the
    * NOTES.md convention) and sum EXACTLY, so the mean is
    * partition-order-independent and engine-reproducible — a plain
    * double sum would vary with partitioning and break any oracle.
    * Same determinism device as Similarity.trainKmeans, here as a
    * reusable typed Aggregator (map-side partials + post-shuffle merge
    * via HashAggregate, like every Aggregator). Ragged inputs fold at
    * the min dimension; empty groups yield an empty vector.
    */
  val fixedPointMeanVec: Aggregator[Seq[Float], (Seq[Long], Long), Seq[Double]] =
    new Aggregator[Seq[Float], (Seq[Long], Long), Seq[Double]] {
      private val Scale = 1L << 20
      private def quantize(a: Seq[Float]): Array[Long] = {
        val out = new Array[Long](a.length)
        var i = 0
        while (i < a.length) {
          val x = a(i).toDouble * Scale
          out(i) =
            (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
          i += 1
        }
        out
      }
      private def zipSum(x: Seq[Long], y: Seq[Long]): Seq[Long] =
        if (x.isEmpty) y else if (y.isEmpty) x
        else {
          val n = math.min(x.length, y.length)
          val out = new Array[Long](n)
          var i = 0
          while (i < n) { out(i) = x(i) + y(i); i += 1 }
          out.toIndexedSeq
        }
      def zero: (Seq[Long], Long) = (Seq.empty, 0L)
      // null AND empty vectors are skipped entirely — counting an empty
      // vector in the denominator while adding nothing to the sums would
      // silently scale centroids toward zero
      def reduce(b: (Seq[Long], Long), a: Seq[Float]): (Seq[Long], Long) =
        if (a == null || a.isEmpty) b
        else (zipSum(b._1, quantize(a).toIndexedSeq), b._2 + 1)
      def merge(x: (Seq[Long], Long), y: (Seq[Long], Long)): (Seq[Long], Long) =
        (zipSum(x._1, y._1), x._2 + y._2)
      def finish(b: (Seq[Long], Long)): Seq[Double] =
        if (b._2 == 0) Seq.empty
        else b._1.map(_.toDouble / b._2 / Scale.toDouble)
      def bufferEncoder: Encoder[(Seq[Long], Long)] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

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
