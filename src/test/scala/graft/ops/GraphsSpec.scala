package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long)], minWeight: Long = 1L,
      cap: Int = 200): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Graphs.coOccurrenceEdges(rows.toDF("g", "it").repartition(3),
        col("g"), col("it"), minWeight = minWeight,
        maxItemsPerGroup = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  test("coOccurrenceEdges equals the brute pair count: canonical a < b, " +
      "duplicate memberships collapse, weight = shared groups, " +
      "minWeight filters") {
    // group 1: {1,2,3}; group 2: {2,3,4} (3 twice — dup membership);
    // group 3: {1,2}
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 2L), (2L, 3L), (2L, 3L), (2L, 4L),
      (3L, 2L), (3L, 1L))
    val all = run(rows)
    assert(all == Set(
      (1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 2L),
      (2L, 4L, 1L), (3L, 4L, 1L)))
    assert(run(rows, minWeight = 2L) == Set((1L, 2L, 2L), (2L, 3L, 2L)))
  }

  test("maxItemsPerGroup bounds the emission: a capped group " +
      "contributes pairs only among its kept items; guards") {
    // group 1 has 5 items, cap 3 → C(3,2)=3 pairs, not C(5,2)=10
    val rows = (1L to 5L).map(i => (1L, i))
    assert(run(rows, cap = 3).size == 3)
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("g", "it")
    intercept[IllegalArgumentException](
      Graphs.coOccurrenceEdges(df, col("g"), col("it"), minWeight = 0L))
    intercept[IllegalArgumentException](
      Graphs.coOccurrenceEdges(df, col("g"), col("it"),
        maxItemsPerGroup = 1))
  }
}
