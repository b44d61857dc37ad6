package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RollingSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 10): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("rollingDistinct == a brute per-day set model; multi-activity " +
      "inside one window counts once; window ends clamp to the span; " +
      "NULL keys excluded") {
    import spark.implicits._
    val rows = Seq(
      (Some(1L), ts(1)), (Some(1L), ts(1, 23)), // same user+day twice
      (Some(2L), ts(2)),
      (Some(1L), ts(3)),                        // user 1 again in-window
      (Some(3L), ts(9)),
      (None, ts(5)))                            // NULL key: excluded
      .toDF("k", "t").repartition(3)
    val got = Rolling.rollingDistinct(rows, col("k"), col("t"), 3)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    // brute: for each day in [jan 1, jan 9], distinct keys active in
    // [d-2, d]; empty windows absent
    val act = Seq(1L -> 1, 1L -> 1, 2L -> 2, 1L -> 3, 3L -> 9)
    val expected = (1 to 9).flatMap { d =>
      val ks = act.collect { case (k, ad) if ad <= d && ad >= d - 2 => k }
        .toSet
      if (ks.isEmpty) None
      else Some(f"2024-01-$d%02d" -> ks.size.toLong)
    }.toMap
    assert(got == expected)
    // the span clamp: user 3's activity on day 9 (the max day) must
    // not fabricate windows for days 10/11
    assert(!got.contains("2024-01-10") && !got.contains("2024-01-11"))
    intercept[IllegalArgumentException](
      Rolling.rollingDistinct(rows, col("k"), col("t"), 0))
  }
}
