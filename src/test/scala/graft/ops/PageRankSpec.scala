package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  /** Sequential reference with the same fixed-point floors. */
  private def ref(
      edges: Seq[(Long, Long)], iters: Int,
      num: Long = 85, den: Long = 100): Map[Long, Long] = {
    val S = PageRank.Scale
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (den - num) * S / (den * n)
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (u, v) => v -> r(u) / deg(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(id => id -> (base + num * contrib.getOrElse(id, 0L) / den))
        .toMap
    }
    r
  }

  test("matches the fixed-point reference on a small directed graph") {
    import spark.implicits._
    // a hub (1 -> everyone), a cycle (2->3->4->2), a dangling sink (5)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 3L), (3L, 4L), (4L, 2L))
    val got = PageRank.pageRank(edges.toDF("s", "d"), col("s"), col("d"),
        iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref(edges, 4))
    // the cycle members accumulate more than the rank source
    assert(got(2L) > got(1L) && got(5L) < got(2L))
  }

  test("bit-identical across partitionings and iteration-monotone " +
      "node set") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    def run(parts: Int) = PageRank.pageRank(
        edges.toDF("s", "d").repartition(parts), col("s"), col("d"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(2)
    assert(a == run(9))
    assert(a == ref(edges, 3))
  }

  test("guards: empty graph and bad damping") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      PageRank.pageRank(Seq((1L, 2L)).toDF("s", "d"), col("s"), col("d"),
        iters = 2, dampingNum = 101)
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(
        Seq.empty[(Long, Long)].toDF("s", "d"), col("s"), col("d"), 1)
    }
  }
}
