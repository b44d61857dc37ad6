package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomWalkSpec extends SparkSpec {

  private def hash52(s: String): BigInt = {
    val d = java.security.MessageDigest.getInstance("MD5")
    BigInt(d.digest(s.getBytes("UTF-8")).map(b => f"$b%02x")
      .mkString.take(13), 16)
  }

  test("walks match a plain-Scala hash replay, stop at dead ends, and " +
      "are partitioning-invariant") {
    import spark.implicits._
    // 1 and 2 in a dense cluster; 5 -> 6 -> (dead end)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (2L, 3L),
      (3L, 1L), (4L, 1L), (5L, 6L))
    def model(start: Long, steps: Int): Seq[(Long, Long, Long)] = {
      val adj = edges.distinct.groupBy(_._1)
        .map { case (u, es) => u -> es.map(_._2).sorted }
      var cur = start
      val out = Seq.newBuilder[(Long, Long, Long)]
      out += ((start, 0L, start))
      var t = 1
      var alive = true
      while (t <= steps && alive) {
        adj.get(cur) match {
          case Some(ns) =>
            cur = ns(((hash52(s"$start#$t:rw") % ns.length).toLong).toInt)
            out += ((start, t.toLong, cur))
          case None => alive = false
        }
        t += 1
      }
      out.result()
    }
    val starts = Seq(1L, 2L, 5L)
    val expected = starts.flatMap(model(_, 4)).toSet
    for (parts <- Seq(1, 5)) {
      val got = RandomWalk.walks(
          edges.toDF("s", "d").repartition(parts), col("s"), col("d"),
          starts.toDF("w"), col("w"), steps = 4, salt = "rw")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"parts=$parts")
    }
    // the dead-end walk emits start + exactly one hop
    val w5 = expected.filter(_._1 == 5L)
    assert(w5 == Set((5L, 0L, 5L), (5L, 1L, 6L)))
    intercept[IllegalArgumentException] {
      RandomWalk.walks(edges.toDF("s", "d"), col("s"), col("d"),
        starts.toDF("w"), col("w"), steps = 0, salt = "rw")
    }
  }

  test("per-step frontier checkpoint: the returned union plans no " +
      "joins (each step executed exactly once, round-17 shape pin)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L))
    val out = RandomWalk.walks(
      edges.toDF("s", "d"), col("s"), col("d"),
      Seq(1L, 2L).toDF("w"), col("w"), steps = 6, salt = "rw")
    // Before the round-17 fix the lazily-chained frontiers re-planned
    // every earlier step per union arm: steps=6 carried O(steps^2)
    // joins (q148's plan had 83 Exchanges). With the per-step eager
    // cut, the final plan is s0 ∪ checkpointed scans — join-free.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }
}
