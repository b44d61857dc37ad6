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

  // ---- transitionCounts ----------------------------------------------

  test("transitionCounts: hand-computed table — counts per consecutive " +
      "pair, per-prev totals, exact floor p_fx, rank ties break on " +
      "next asc; runs never cross keys; single-event keys contribute " +
      "nothing") {
    import spark.implicits._
    // user 1: a b a b a  → ab x2, ba x2
    // user 2: a c        → ac x1 (NOT b→...: runs don't cross users)
    // user 3: a          → nothing
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (1L, 5L, "a"),
      (2L, 1L, "a"), (2L, 2L, "c"),
      (3L, 1L, "a"))
    val got = Sequences.transitionCounts(
        rows.toDF("u", "t", "e").repartition(3),
        col("u"), col("e"), Seq(col("t")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    val S = 1L << 20
    assert(got == Set(
      // prev a: total 3 → ab p = floor(2·S/3), rank by count desc
      ("a", "b", 2L, 3L, 2 * S / 3, 1L),
      ("a", "c", 1L, 3L, S / 3, 2L),
      ("b", "a", 2L, 2L, S, 1L)))
  }

  test("transitionCounts guards: orderCols must be non-empty") {
    import spark.implicits._
    val df = Seq((1L, 1L, "a")).toDF("u", "t", "e")
    intercept[IllegalArgumentException](
      Sequences.transitionCounts(df, col("u"), col("e"), Seq.empty))
  }
}
