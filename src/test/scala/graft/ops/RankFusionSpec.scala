package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankFusionSpec extends SparkSpec {

  private val S = RankFusion.Scale

  test("fuses two rankings by exact reciprocal-rank contributions, " +
      "missing items contribute nothing, ties break by id") {
    import spark.implicits._
    val a = Seq(("q", 10L, 1L), ("q", 20L, 2L), ("q", 30L, 3L))
      .toDF("qid", "id", "rank")
    val b = Seq(("q", 20L, 1L), ("q", 10L, 2L), ("q", 40L, 3L))
      .toDF("qid", "id", "rank")
    def c(r: Long): Long = S / (60L + r)
    val got = RankFusion.rrfTopK(Seq(a, b), kk = 60, k = 4)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // 10 and 20 both score c(1)+c(2) — exact tie, id asc puts 10 first;
    // 30 and 40 both score c(3), id asc again
    assert(got == Set(
      (10L, c(1) + c(2), 1L), (20L, c(1) + c(2), 2L),
      (30L, c(3), 3L), (40L, c(3), 4L)))
  }

  test("k truncates per query independently") {
    import spark.implicits._
    val a = Seq(("x", 1L, 1L), ("x", 2L, 2L), ("y", 9L, 1L))
      .toDF("qid", "id", "rank")
    val got = RankFusion.rrfTopK(Seq(a), k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("x", 1L), ("y", 9L)))
  }

  test("guards") {
    intercept[IllegalArgumentException](RankFusion.rrfTopK(Seq.empty))
  }
}
