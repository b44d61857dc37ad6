package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  /** Plain-Scala model: grid cell then bit interleave. */
  private def model(
      rows: Seq[Seq[Long]], bits: Int): Seq[Long] = {
    val d = rows.head.size
    val grid = (1L << bits) - 1
    val mns = (0 until d).map(i => rows.map(_(i)).min)
    val mxs = (0 until d).map(i => rows.map(_(i)).max)
    rows.map { r =>
      val cells = (0 until d).map { i =>
        if (mxs(i) == mns(i)) 0L
        else (r(i) - mns(i)) * grid / (mxs(i) - mns(i))
      }
      (0 until bits).flatMap(j => (0 until d).map(i =>
        ((cells(i) >> j) & 1L) << (j * d + i))).sum
    }
  }

  test("zval matches the Morton model on a 2-d grid") {
    import spark.implicits._
    val rows = for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)
    val got = ZOrder.withZValue(rows.toDF("x", "y"), Seq("x", "y"), bits = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val exp = rows.zip(model(rows.map(t => Seq(t._1, t._2)), 4)).toMap
    assert(got == exp)
    // spot checks of the classic curve: (0,0)->0, (1,0)->1, (0,1)->2,
    // (1,1)->3, (15,15)->255 (full 4-bit grid maps to itself)
    assert(got((0L, 0L)) == 0L && got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L && got((1L, 1L)) == 3L)
    assert(got((15L, 15L)) == 255L)
  }

  test("constant columns collapse to cell 0; 3-d interleave works") {
    import spark.implicits._
    val rows = Seq((1L, 7L, 0L), (2L, 7L, 3L), (3L, 7L, 1L))
    val got = ZOrder.withZValue(
      rows.toDF("a", "b", "c"), Seq("a", "b", "c"), bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val exp = rows.zip(model(rows.map(t => Seq(t._1, t._2, t._3)), 2))
      .map { case (r, z) => (r._1, z) }.toMap
    assert(got == exp)
  }

  test("clusterByZOrder tightens per-partition bounding boxes vs a " +
      "single-column range layout") {
    import spark.implicits._
    val rows = for (x <- 0L to 31L; y <- 0L to 31L) yield (x, y)
    val df = rows.toDF("x", "y")
    def spans(d: org.apache.spark.sql.DataFrame): Long =
      d.groupBy(spark_partition_id())
        .agg((max("x") - min("x") + max("y") - min("y")).as("s"))
        .agg(sum("s")).collect().head.getLong(0)
    val z = spans(ZOrder.clusterByZOrder(df, Seq("x", "y"), 16))
    val linear = spans(df.repartitionByRange(16, col("x")))
    // z-order: every partition is a square-ish tile, so both x and y
    // spans are bounded; a 1-d range layout leaves y unconstrained
    assert(z < linear, s"z=$z linear=$linear")
  }

  test("guards") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException](ZOrder.withZValue(df, Seq("x")))
    intercept[IllegalArgumentException](
      ZOrder.withZValue(df, Seq("x", "y"), bits = 32))
  }
}
