package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("kmvDistinct is exact below k and within KMV error above it") {
    import spark.implicits._
    // 50 distinct values, k=64: sketch holds everything -> exact
    val small = (1 to 200).map(i => s"v${i % 50}").toDF("x")
    val (n1, e1) = Sketch.kmvDistinct(small, col("x"), k = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    assert(n1 == 50L && e1 == 50.0)

    // 5000 distinct values, k=256: estimation arm; standard error
    // ~1/sqrt(k-2) ~ 6%, assert a generous 4-sigma band
    val big = (1 to 5000).map(i => s"value-$i").toDF("x")
    val (n2, e2) = Sketch.kmvDistinct(big, col("x"), k = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    assert(n2 == 256L)
    assert(math.abs(e2 - 5000) / 5000.0 < 0.25, s"estimate off: $e2")
  }

  test("kmvDistinct is bit-identical across partitionings and " +
      "insensitive to duplication") {
    import spark.implicits._
    val base = (1 to 3000).map(i => s"d-${i % 1000}")
    def run(parts: Int, dup: Int): (Long, Double) =
      Sketch.kmvDistinct(
          (1 to dup).flatMap(_ => base).toDF("x").repartition(parts),
          col("x"), k = 128)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    val a = run(2, 1)
    assert(a == run(11, 1))   // partitioning
    assert(a == run(5, 3))    // duplication: same distinct set, same sketch
  }

  test("degenerate inputs") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sketch.kmvDistinct(Seq("a").toDF("x"), col("x"), k = 1)
    }
    val empty = Seq.empty[String].toDF("x")
    val r = Sketch.kmvDistinct(empty, col("x"), k = 8).collect().head
    assert(r.getLong(0) == 0L && r.getDouble(1) == 0.0)
  }
}
