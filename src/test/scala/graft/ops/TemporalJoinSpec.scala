package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalJoinSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("asofJoin picks the latest prior right row, inclusive on ties") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "l-a"), // after two right rows -> matches ts(5)
      (1L, ts(3), "l-b"),  // after one -> matches ts(1)
      (1L, ts(0), "l-c"),  // before all -> no match
      (2L, ts(5), "l-d"),  // equal ts tie -> inclusive match
      (3L, ts(5), "l-e")   // key with no right rows -> no match
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(1), 10.0), (1L, ts(5), 20.0), (2L, ts(5), 30.0)
    ).toDF("k", "t", "rv")
    val out = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
        Seq("rv"))
      .select("lv", "matched_ts", "rv").collect()
      .map(r => (r.getString(0), Option(r.getTimestamp(1)),
        Option(r.get(2)))).toSet
    assert(out == Set(
      ("l-a", Some(ts(5)), Some(20.0)),
      ("l-b", Some(ts(1)), Some(10.0)),
      ("l-c", None, None),
      ("l-d", Some(ts(5)), Some(30.0)),
      ("l-e", None, None)))
  }

  test("asofJoin tolerance nulls out stale matches but keeps fresh ones") {
    import spark.implicits._
    val left = Seq((1L, ts(10), "x"), (1L, ts(2), "y")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(1), 5.0)).toDF("k", "t", "rv")
    val out = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
        Seq("rv"), toleranceMicros = Some(120L * 1000000))
      .select("lv", "rv").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    // ts(10) is 9 min after the match — out of the 2-min tolerance;
    // ts(2) is 1 min after — kept.
    assert(out == Set(("x", None), ("y", Some(5.0))))
  }

  test("asofJoin carries a null right payload VALUE without skipping") {
    import spark.implicits._
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(1), Some(7.0)), (1L, ts(5), None)
    ).toDF("k", "t", "rv")
    val out = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("rv")).select("matched_ts", "rv").collect()
    // the ts(5) row IS the match even though its payload is null —
    // a null value must not fall back to the older ts(1) row
    assert(out.head.getTimestamp(0) == ts(5) && out.head.isNullAt(1))
  }

  test("asofJoin matches a window-function reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(50), rnd.nextInt(60)), i))
      .toDF("k", "t", "i")
    val right = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(50), rnd.nextInt(60)),
        i.toDouble))
      .distinct
      .toDF("k", "t", "rv")
      // unique (k, ts): keep max rv — the documented precondition
      .groupBy("k", "t").agg(max("rv").as("rv"))
    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
        Seq("rv"))
      .select("k", "t", "i", "rv").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2),
        Option(r.get(3)))).toSet
    // reference: correlated max-prior lookup via a join + groupBy
    val rRows = right.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val want = left.collect().map { lr =>
      val (k, t, i) = (lr.getLong(0), lr.getTimestamp(1), lr.getInt(2))
      val prior = rRows.filter(r => r._1 == k && !r._2.after(t))
      val m = if (prior.isEmpty) None
        else Some(prior.maxBy(_._2.getTime)._3)
      (k, t, i, m)
    }.toSet
    assert(got == want)
  }

  test("asofJoin forward picks the earliest following right row, " +
    "inclusive, with forward tolerance") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(3), "a"),  // next right is ts(5)
      (1L, ts(5), "b"),  // equal ts -> inclusive
      (1L, ts(20), "c"), // after all -> no match
      (2L, ts(0), "d")   // next right ts(30) but out of 10-min tolerance
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(1), 1.0), (1L, ts(5), 2.0), (2L, ts(30), 3.0)
    ).toDF("k", "t", "rv")
    val out = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
        Seq("rv"), toleranceMicros = Some(600L * 1000000),
        direction = "forward")
      .select("lv", "rv").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(out == Set(
      ("a", Some(2.0)), ("b", Some(2.0)), ("c", None), ("d", None)))
  }

  test("asofJoin forward matches a reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val left = (1 to 200).map(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(50), rnd.nextInt(60)), i))
      .toDF("k", "t", "i")
    val right = (1 to 150).map(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(50), rnd.nextInt(60)),
        i.toDouble))
      .toDF("k", "t", "rv")
      .groupBy("k", "t").agg(max("rv").as("rv"))
    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
        Seq("rv"), direction = "forward")
      .select("k", "t", "i", "rv").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2),
        Option(r.get(3)))).toSet
    val rRows = right.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val want = left.collect().map { lr =>
      val (k, t, i) = (lr.getLong(0), lr.getTimestamp(1), lr.getInt(2))
      val later = rRows.filter(r => r._1 == k && !r._2.before(t))
      val m = if (later.isEmpty) None
        else Some(later.minBy(_._2.getTime)._3)
      (k, t, i, m)
    }.toSet
    assert(got == want)
  }

  test("rangeJoin pairs each point with every containing interval " +
    "exactly once, across bucket boundaries") {
    import spark.implicits._
    val points = Seq((100L, "p1"), (999L, "p2"), (1000L, "p3"),
      (2500L, "p4"), (10L, "p5")).toDF("v", "pid")
    val intervals = Seq(
      (0L, 1000L, "i1"),    // [0,1000): p1,p2,p5 — NOT p3 (hi exclusive)
      (900L, 2600L, "i2"),  // spans 3 buckets at width 1000
      (999L, 1000L, "i3"),  // single-point interval: p2 only
      (3000L, 3000L, "i4"), // empty — matches nothing
      (2500L, 2501L, "i5")  // p4
    ).toDF("lo", "hi", "iid")
    val out = TemporalJoin.rangeJoin(points, "v", intervals, "lo", "hi",
        bucketWidth = 1000L)
      .select("pid", "iid").collect()
      .map(r => (r.getString(0), r.getString(1))).toList
    assert(out.size == out.toSet.size, "duplicate pairs")
    assert(out.toSet == Set(
      ("p1", "i1"), ("p2", "i1"), ("p5", "i1"),
      ("p2", "i2"), ("p3", "i2"), ("p4", "i2"),
      ("p2", "i3"), ("p4", "i5")))
  }

  test("rangeJoin matches a brute-force reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 500).map(i => (rnd.nextInt(10000).toLong, i))
      .toDF("v", "pid")
    val intervals = (1 to 100).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (lo, lo + rnd.nextInt(800).toLong, i)
    }.toDF("lo", "hi", "iid")
    val got = TemporalJoin.rangeJoin(points, "v", intervals, "lo", "hi",
        bucketWidth = 256L)
      .select("pid", "iid").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toList
    assert(got.size == got.toSet.size, "duplicate pairs")
    val ps = points.collect().map(r => (r.getLong(0), r.getInt(1)))
    val ivs = intervals.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2)))
    val want = (for {
      (v, pid) <- ps; (lo, hi, iid) <- ivs
      if v >= lo && v < hi
    } yield (pid, iid)).toSet
    assert(got.toSet == want)
  }

  test("plan shape: asofJoin is ONE window over ONE exchange; rangeJoin " +
    "never plans a nested-loop or cartesian join") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val left = Seq((1L, ts(1), "x")).toDF("k", "t", "lv")
      val right = Seq((1L, ts(0), 1.0)).toDF("k", "t", "rv")
      val asofPlan = TemporalJoin.asofJoin(left, right, Seq("k"), "t",
        "t", Seq("rv")).queryExecution.executedPlan
      assert(asofPlan.collect { case w: WindowExec => w }.size == 1,
        s"expected exactly one window:\n$asofPlan")
      assert(asofPlan.collect { case e: ShuffleExchangeExec => e }.size == 1,
        s"as-of must cost exactly one shuffle:\n$asofPlan")

      val points = Seq((5L, "p")).toDF("v", "pid")
      val intervals = Seq((0L, 10L, "i")).toDF("lo", "hi", "iid")
      val rangePlan = TemporalJoin.rangeJoin(points, "v", intervals,
        "lo", "hi", 10L).queryExecution.executedPlan
      val bad = rangePlan.collect {
        case b: BroadcastNestedLoopJoinExec => b
        case c: CartesianProductExec => c
      }
      assert(bad.isEmpty,
        s"range join degenerated to a nested loop/cartesian:\n$rangePlan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("rangeJoin hard-errors on an interval spanning too many buckets") {
    import spark.implicits._
    val points = Seq((5L, "p")).toDF("v", "pid")
    val intervals = Seq((0L, 100000L, "huge")).toDF("lo", "hi", "iid")
    val ex = intercept[Exception] {
      TemporalJoin.rangeJoin(points, "v", intervals, "lo", "hi",
        bucketWidth = 10L, maxBucketsPerInterval = 100).collect()
    }
    assert(ex.getMessage != null)
  }
}
