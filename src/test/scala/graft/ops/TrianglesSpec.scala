package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], k: Int = 50)
      : Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Triangles.triangleCounts(
        edges.toDF("src", "dst").repartition(3),
        col("src"), col("dst"), k = k)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
  }

  private def bruteTriangles(edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) =>
      if (a == b) Nil
      else Seq((math.min(a, b), math.max(a, b)))
    }.distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tri = for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      l <- (j + 1) until nodes.length
      a = nodes(i); b = nodes(j); c = nodes(l)
      if und((a, b)) && und((a, c)) && und((b, c))
    } yield Seq(a, b, c)
    tri.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("triangleCounts equals a brute-force triple enumeration on a " +
      "mixed graph (cliques, bridges, hubs), with exact deg/wedges; " +
      "duplicate/reversed/self-loop edges are normalized away") {
    // K4 on 1-4, a triangle 5-6-7 bridged to the clique, a star hub 10
    // with no triangles, plus duplicate/reversed/self-loop noise
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L), (4L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (2L, 1L), (1L, 2L), (3L, 3L))
    val got = run(edges)
    val want = bruteTriangles(edges)
    assert(got.keySet == want.keySet) // zero-triangle nodes absent
    got.foreach { case (n, (tri, degN, wedges)) =>
      assert(tri == want(n), s"node $n")
      assert(wedges == degN * (degN - 1) / 2, s"node $n wedges")
    }
    // K4 corners: 3 triangles each; deg checks the undirected dedup
    assert(got(1L) == ((3L, 3L, 3L)))
    assert(got(4L)._1 == 3L && got(4L)._2 == 4L) // 4 also bridges to 5
    assert(got(5L)._1 == 1L)
    assert(!got.contains(10L) && !got.contains(11L))
  }

  test("triangle-free graphs report nothing; k caps by (tri desc, " +
      "node asc)") {
    // bipartite square: no triangles
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
    // two disjoint triangles; k=3 keeps the lower node ids on the tie
    val two = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L))
    val capped = run(two, k = 3)
    assert(capped.keySet == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      run(Seq((1L, 2L)), k = 0)
    }
  }
}
