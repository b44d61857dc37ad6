package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ResampleSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val hour = 3600L * 1000000L

  test("gap rows materialize with n=0; aggs null unless forward-filled") {
    import spark.implicits._
    val df = Seq(
      ("a", ts(1, 10), 1.0), ("a", ts(1, 20), 2.0), // hour 1: two rows
      ("a", ts(4, 0), 10.0),                        // hours 2,3 are gaps
      ("b", ts(2, 0), 5.0)                          // single-bucket key
    ).toDF("k", "t", "v")
    val out = Resample.resample(df, Seq("k"), col("t"), hour,
        aggs = Seq(sum(col("v")).as("sv")))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        Option(r.get(3)))).toSet
    assert(out == Set(
      ("a", ts(1), 2L, Some(3.0)),
      ("a", ts(2), 0L, None),
      ("a", ts(3), 0L, None),
      ("a", ts(4), 1L, Some(10.0)),
      ("b", ts(2), 1L, Some(5.0))))

    val filled = Resample.resample(df, Seq("k"), col("t"), hour,
        aggs = Seq(sum(col("v")).as("sv")), ffill = Seq("sv"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.get(3))).toSet
    assert(filled.contains(("a", ts(2), 3.0)) &&
      filled.contains(("a", ts(3), 3.0)) &&
      filled.contains(("a", ts(4), 10.0)))
  }

  test("no aggs: pure occupancy grid; bucket edges are exact") {
    import spark.implicits._
    val df = Seq(("a", ts(0, 59)), ("a", ts(1, 0))).toDF("k", "t")
    val out = Resample.resample(df, Seq("k"), col("t"), hour)
      .orderBy("bucket_start").collect()
      .map(r => (r.getTimestamp(1), r.getLong(2)))
    assert(out.toSeq == Seq((ts(0), 1L), (ts(1), 1L)))
  }

  test("span cap hard-errors instead of exploding") {
    import spark.implicits._
    val df = Seq(("a", ts(0)), ("a", ts(23))).toDF("k", "t")
    intercept[Exception] {
      Resample.resample(df, Seq("k"), col("t"), hour,
        maxBucketsPerKey = 10).collect()
    }
  }

  test("agg name collision with n is rejected") {
    import spark.implicits._
    val df = Seq(("a", ts(0), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      Resample.resample(df, Seq("k"), col("t"), hour,
        aggs = Seq(sum(col("v")).as("n"))).collect()
    }
  }
}
