package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntropySpec extends SparkSpec {

  private val S = 1L << 20

  test("uniform distributions at power-of-two sizes are exactly k bits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),          // 4 distinct, uniform -> exactly 2.0 bits
      (2L, "a b a b a b a b"),  // 2 distinct, uniform -> exactly 1.0 bit
      (3L, "x x x x"),          // single token -> 0
      (4L, ""),                 // empty -> 0 tokens, 0
      (5L, "w x y z w x y z")   // 4 distinct uniform over 8 -> 2.0 bits
    ).toDF("doc_id", "text")
    val got = Entropy.tokenEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((4L, 2 * S)))
    assert(got(2L) == ((8L, 1 * S)))
    assert(got(3L) == ((4L, 0L)))
    assert(got(4L) == ((0L, 0L)))
    assert(got(5L) == ((8L, 2 * S)))
  }

  test("kernel matches a plain-Scala model of the definition on " +
      "non-uniform counts, and is within 2^-19-per-term of float entropy") {
    import spark.implicits._
    val text = "a a a a b b c d" // counts 4,2,1,1 over n=8
    val got = Entropy.tokenEntropy(
      Seq((1L, text)).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect().head
    val counts = Seq(4L, 2L, 1L, 1L)
    val n = counts.sum
    val model = Dsir.ilog2Fx(n) -
      counts.map(c => c * Dsir.ilog2Fx(c)).sum / n
    assert(got.getLong(2) == model)
    val float = -counts.map { c =>
      val p = c.toDouble / n; p * math.log(p) / math.log(2)
    }.sum
    assert(math.abs(got.getLong(2).toDouble / S - float) < 1e-4)
  }

  test("null text scores as empty") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, "a b")).toDF("doc_id", "text")
    val got = Entropy.tokenEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got(1L) == 0L && got(2L) == S)
  }
}
