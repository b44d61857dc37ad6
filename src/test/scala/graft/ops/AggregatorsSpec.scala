package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

class AggregatorsSpec extends SparkSpec {

  private def meanVec = udaf(Aggregators.fixedPointMeanVec,
    ExpressionEncoder[Seq[Float]]())

  test("fixedPointMeanVec: hand-checked mean, exact at 2^20 grid points") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(1.0f, -2.0f)),
      (1, Seq(3.0f, 4.0f)),
      (2, Seq(0.5f, 0.25f))).toDF("g", "v")
    val out = df.groupBy("g").agg(meanVec(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    // grid-exact inputs: mean is exact
    assert(out(1) == Seq(2.0, 1.0))
    assert(out(2) == Seq(0.5, 0.25))
  }

  test("fixedPointMeanVec is partition-order independent (bit-exact)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map(i =>
      (i % 7, Seq.fill(16)(rng.nextFloat() * 2 - 1)))
    def run(parts: Int): Map[Int, Seq[Double]] =
      rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(meanVec(col("v")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    // exact long sums: ANY partitioning gives the identical doubles —
    // the property a naive double sum does not have
    assert(run(1) == run(13))
  }

  test("fixedPointMeanVec degenerate inputs") {
    import spark.implicits._
    val df = Seq(
      (1, null.asInstanceOf[Seq[Float]]),
      (1, Seq(2.0f)),
      (2, Seq.empty[Float])).toDF("g", "v")
    val out = df.groupBy("g").agg(meanVec(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(out(1) == Seq(2.0)) // null rows don't count toward the mean
    assert(out(2) == Seq.empty)
  }

  test("empty vectors are skipped, not counted into the denominator") {
    import spark.implicits._
    val df = Seq(
      (1, Seq.empty[Float]), (1, Seq(2.0f, 4.0f)), (1, Seq(4.0f, 8.0f)))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(meanVec(col("v")).as("m"))
      .collect().map(_.getSeq[Double](1).toSeq).head
    // mean of the two real vectors — an empty row must not scale it down
    assert(out == Seq(3.0, 6.0))
  }
}
