package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelPropSpec extends SparkSpec {

  /** Plain-Scala model of the synchronous definition. */
  private def model(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var lbl = nodes.map(x => x -> x).toMap
    for (_ <- 1 to iters) {
      val votes = edges.groupBy(_._2).map { case (v, es) =>
        val counts = es.groupBy(e => lbl(e._1)).map { case (l, xs) =>
          (l, xs.size)
        }
        val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        v -> best
      }
      lbl = lbl.map { case (v, old) => v -> votes.getOrElse(v, old) }
    }
    lbl
  }

  private def undirected(es: (Long, Long)*): Seq[(Long, Long)] =
    es.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("two triangles joined by a bridge converge to one label each") {
    import spark.implicits._
    val es = undirected((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val got = LabelProp.labelPropagation(
      es.toDF("src", "dst"), col("src"), col("dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == model(es, 4))
    // density check: each triangle is internally uniform by round 4
    assert(Set(got(1L), got(2L)).size == 1 || got(1L) == got(2L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
  }

  test("matches the synchronous model on a directed graph with " +
      "tie-breaks and an isolated-source node keeping its label") {
    import spark.implicits._
    // node 10 votes into 1 but receives nothing: keeps label 10
    val es = Seq((1L, 2L), (2L, 1L), (3L, 2L), (10L, 1L))
    for (iters <- 1 to 3) {
      val got = LabelProp.labelPropagation(
        es.toDF("src", "dst"), col("src"), col("dst"), iters)
      val m = model(es, iters)
      assert(got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        == m, s"iters=$iters")
      assert(m(10L) == 10L)
    }
  }

  test("broadcast and shuffle arms agree") {
    import spark.implicits._
    val es = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L))
    val b = LabelProp.labelPropagation(
      es.toDF("src", "dst"), col("src"), col("dst"), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val s = LabelProp.labelPropagation(
      es.toDF("src", "dst"), col("src"), col("dst"), iters = 3,
      broadcastNodesUpTo = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(b.sameElements(s))
  }

  test("guards: empty graph and bad iters") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      LabelProp.labelPropagation(
        Seq((1L, 2L)).toDF("src", "dst"), col("src"), col("dst"), 0)
    }
    intercept[IllegalArgumentException] {
      LabelProp.labelPropagation(
        Seq.empty[(Long, Long)].toDF("src", "dst"),
        col("src"), col("dst"), 1)
    }
  }
}
