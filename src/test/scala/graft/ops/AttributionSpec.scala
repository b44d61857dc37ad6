package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {

  private val W = 1000L // lookback micros for the fixtures

  // (user, ts_micros, id, type)
  private def run(rows: Seq[(Long, Long, Long, String)],
      lookback: Long = W): Map[String, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "t", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("t")))
    Attribution.multiTouch(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"),
        convType = "buy", touchTypes = Seq("click", "view"),
        lookbackMicros = lookback)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("per-conversion credit is exact: first/last get 10000, linear " +
      "floors with the remainder on the last touch; order is " +
      "(ts, id); rollup sums per channel") {
    // user 1: buy at t=5000 (id 50), three touches inside [4000, 5000):
    //   click id=10 t=4100, view id=11 t=4200, click id=12 t=4300
    // linear: 3333 each + remainder 1 on the LAST (id=12, click)
    val got = run(Seq(
      (1L, 4100L, 10L, "click"),
      (1L, 4200L, 11L, "view"),
      (1L, 4300L, 12L, "click"),
      (1L, 5000L, 50L, "buy")))
    // click: first (10000) + last (10000), linear 3333 + 3334
    assert(got("click") == ((2L, 1L, 10000L, 10000L, 6667L)))
    assert(got("view") == ((1L, 1L, 0L, 0L, 3333L)))
    // total linear credit conserves the 10000 bp exactly
    assert(got.values.map(_._5).sum == 10000L)
  }

  test("window boundaries: a touch exactly at cts − lookback is in, " +
      "at cts is out; conversions with no in-window touches vanish; " +
      "a same-tick touch (t == cts) is excluded") {
    val got = run(Seq(
      (1L, 4000L, 10L, "click"), // == cts − W: IN
      (1L, 5000L, 11L, "view"),  // == cts: OUT
      (1L, 5000L, 50L, "buy"),
      (2L, 1000L, 20L, "click"), // user 2's buy is far later: no touch
      (2L, 9000L, 51L, "buy")))
    assert(got == Map("click" -> ((1L, 1L, 10000L, 10000L, 10000L))))
  }

  test("bucket-grid seam: a (touch, conversion) pair whose window " +
      "crosses a bucket boundary joins exactly once, and an aligned " +
      "window (conversion on a bucket edge) does not double-join") {
    // W = 1000. conv at t=2000 (bucket edge: window [1000, 2000) is
    // exactly bucket 1); touch at 1500 sits in bucket 1. conv at 2500:
    // window [1500, 2500) spans buckets 1 and 2; same touch matches
    // through the bucket-1 arm only.
    val got = run(Seq(
      (1L, 1500L, 10L, "click"),
      (1L, 2000L, 50L, "buy"),
      (1L, 2500L, 51L, "buy")))
    // one touch row per (touch, conv) pair → n_touches = 2 exactly
    assert(got("click") == ((2L, 2L, 20000L, 20000L, 20000L)))
  }

  test("touches from other users never attach, and the conversion " +
      "event itself is never a touch") {
    val got = run(Seq(
      (1L, 4500L, 10L, "click"),
      (2L, 4600L, 11L, "click"), // other user, inside the window
      (1L, 4700L, 12L, "buy"),   // conversions are not touches
      (1L, 5000L, 50L, "buy")))
    // the click serves BOTH of user 1's conversions (sole touch of
    // each); the buy at 4700 is inside conv-5000's window but is a
    // conversion, never a touch; user 2's click attaches to nothing
    assert(got("click") == ((2L, 2L, 20000L, 20000L, 20000L)))
    assert(got.values.map(_._1).sum == 2L)
  }
}
