package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencesSpec extends SparkSpec {

  private val events = Seq(
    // user 1: v c p v c p  — two "v c p" runs
    (1L, 1L, "v"), (1L, 2L, "c"), (1L, 3L, "p"),
    (1L, 4L, "v"), (1L, 5L, "c"), (1L, 6L, "p"),
    // user 2: v c v — one "v c", one "c v"
    (2L, 1L, "v"), (2L, 2L, "c"), (2L, 3L, "v"))

  test("counts consecutive per-user n-grams; runs never cross users") {
    import spark.implicits._
    val df = events.toDF("u", "t", "e")
    val tri = Sequences.frequentTypeNgrams(
      df, col("u"), col("e"), Seq(col("t")), n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // user 1 trigrams: vcp, cpv, pvc, vcp; user 2: vcv
    assert(tri == Seq(("v c p", 2L), ("c p v", 1L), ("p v c", 1L),
      ("v c v", 1L)))
    val bi = Sequences.frequentTypeNgrams(
      df, col("u"), col("e"), Seq(col("t")), n = 2, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // across users: vc x3, cp x2, pv x1 (dropped), cv x1 (dropped)
    assert(bi == Seq(("v c", 3L), ("c p", 2L)))
  }

  test("rank ties break on gram text; k truncates") {
    import spark.implicits._
    val df = events.toDF("u", "t", "e")
    val top1 = Sequences.frequentTypeNgrams(
      df, col("u"), col("e"), Seq(col("t")), n = 3, k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("v c p", "c p v")) // 2 first, then tie c<p<v
  }

  test("guards") {
    import spark.implicits._
    val df = events.toDF("u", "t", "e")
    intercept[IllegalArgumentException](Sequences.frequentTypeNgrams(
      df, col("u"), col("e"), Seq(col("t")), n = 1))
    intercept[IllegalArgumentException](Sequences.frequentTypeNgrams(
      df, col("u"), col("e"), Seq.empty, n = 2))
  }
}
