package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("funnel counts only in-order completions; ties do not advance") {
    import spark.implicits._
    val events = Seq(
      // user 1: full funnel in order
      (1L, ts(0), "a"), (1L, ts(5), "b"), (1L, ts(9), "c"),
      // user 2: b BEFORE a — reaches step a only
      (2L, ts(3), "b"), (2L, ts(4), "a"),
      // user 3: a then b, no c
      (3L, ts(1), "a"), (3L, ts(2), "b"),
      // user 4: a and b at the SAME timestamp — strict order, no advance
      (4L, ts(7), "a"), (4L, ts(7), "b"),
      // user 5: never does a
      (5L, ts(0), "b"), (5L, ts(1), "c")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("a", "b", "c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1, "a", 4L), (2, "b", 2L), (3, "c", 1L)))
  }

  test("conversion window excludes a slow converter; boundary event at " +
      "exactly maxGap still counts") {
    import spark.implicits._
    val events = Seq(
      // user 1: converts within 2 min — inside a 3-min window
      (1L, ts(0), "a"), (1L, ts(2), "b"),
      // user 2: converts after 10 min — outside the window
      (2L, ts(0), "a"), (2L, ts(10), "b"),
      // user 3: b at EXACTLY maxGap after a — (prev, prev+gap] includes it
      (3L, ts(0), "a"), (3L, ts(3), "b")
    ).toDF("user_id", "ts", "event_type")
    val windowed = Funnel.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("a", "b"), maxGapSeconds = Some(180L))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(windowed == Set((1, 3L), (2, 2L)))
    // without a window all three convert
    val open = Funnel.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("a", "b"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(open == Set((1, 3L), (2, 3L)))
  }

  test("first-touch attribution: a lapsed window does NOT re-open on a " +
      "later previous-step event") {
    import spark.implicits._
    // a at :00 (window lapses), a again at :08, b at :09 — first-touch
    // anchors on the :00 a, so the user does not convert
    val events = Seq(
      (1L, ts(0), "a"), (1L, ts(8), "a"), (1L, ts(9), "b")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("a", "b"), maxGapSeconds = Some(120L))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(out == Set((1, 1L), (2, 0L)))
  }

  test("later same-type events can still advance a funnel (min-chaining)") {
    import spark.implicits._
    // b happens before AND after a: the later b must count
    val events = Seq(
      (1L, ts(0), "b"), (1L, ts(2), "a"), (1L, ts(4), "b")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("a", "b"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(out == Set((1, 1L), (2, 1L)))
  }
}
