package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, as codegen'd builtin
  * compositions (`zip_with`/`aggregate`) — no UDF, no driver collection.
  *
  * Determinism: elements are cast to double BEFORE any arithmetic and
  * accumulation is a sequential left fold in array order, so results are
  * bit-identical across engines and partitionings (a float32 multiply
  * would round differently than float64, and tree-reduction would be
  * order-dependent).
  */
object Vectors {

  private def asDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
}
