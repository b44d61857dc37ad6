package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  private val names = Seq(
    (1L, "kitten"), (2L, "sitten"), (3L, "sitting"),
    (4L, "kitten"), (5L, "zzzzzz"))

  test("emits blocked pairs at the distance threshold with exact " +
      "Levenshtein, ia < ib") {
    import spark.implicits._
    val got = FuzzyJoin.editDistancePairs(
      names.toDF("id", "name"), col("id"), col("name"),
      maxDist = 2, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // kitten~sitten d=1, kitten~kitten d=0, sitten~sitting d=2
    // (sub e->i + insert g); kitten~sitting d=3 is a candidate but
    // fails the threshold; zzzzzz has only df-1 grams -> never blocks
    assert(got == Set((1L, 2L, 1), (1L, 4L, 0), (2L, 4L, 1), (2L, 3L, 2)))
  }

  test("stop-grams above maxDf cannot be the only block; pairs " +
      "sharing no kept gram are not emitted") {
    import spark.implicits._
    // "ab" appears in every row (df=4 > maxDf=3): rows 1/2 share ONLY
    // stop-grams, so despite distance 1 the pair is blocked away
    val rows = Seq((1L, "abx"), (2L, "aby"), (3L, "abzq"), (4L, "abzr"))
    val got = FuzzyJoin.editDistancePairs(
      rows.toDF("id", "name"), col("id"), col("name"),
      maxDist = 1, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rows 3/4 share "bz" (df=2, kept) and are at distance 1
    assert(got == Set((3L, 4L)))
  }

  test("deterministic across partitionings") {
    import spark.implicits._
    val rows = (1L to 60L).map(i => (i, f"item#$i%03d"))
    def run(parts: Int) = FuzzyJoin.editDistancePairs(
      rows.toDF("id", "name").repartition(parts),
      col("id"), col("name"), maxDist = 1, maxDf = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(13) && run(1).nonEmpty)
  }

  test("plan never degrades to a cartesian or nested-loop join") {
    import spark.implicits._
    val plan = FuzzyJoin.editDistancePairs(
      names.toDF("id", "name"), col("id"), col("name"), 2, 10)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case b: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins
        .CartesianProductExec => c
    }
    assert(bad.isEmpty, s"unexpected join strategy:\n$plan")
  }

  test("guards reject degenerate configuration") {
    import spark.implicits._
    val df = names.toDF("id", "name")
    intercept[IllegalArgumentException](
      FuzzyJoin.editDistancePairs(df, col("id"), col("name"), -1, 10))
    intercept[IllegalArgumentException](
      FuzzyJoin.editDistancePairs(df, col("id"), col("name"), 1, 1))
    intercept[IllegalArgumentException](
      FuzzyJoin.editDistancePairs(df, col("id"), col("name"), 1, 10, 0))
  }
}
