package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 12): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      f"1970-01-${day}%02d $hour%02d:00:00") // day 1..28, UTC session

  test("retention triangle == hand model; offset 0 is exactly 2^20; " +
      "duplicate activity within a period collapses") {
    import spark.implicits._
    // 7-day periods from the epoch: days 1-7 = period 0, 8-14 = 1,
    // 15-21 = 2. u1: periods 0,1,2; u2: 0,2; u3: 0 only (twice in
    // period 0 — must count once); u4: 1,2 (cohort 1).
    val rows = Seq(
      (1L, ts(2)), (1L, ts(9)), (1L, ts(16)),
      (2L, ts(3)), (2L, ts(17)),
      (3L, ts(4)), (3L, ts(5)),
      (4L, ts(10)), (4L, ts(18)))
    val got = Cohort.retention(rows.toDF("u", "t"), col("u"), col("t"),
        periodDays = 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val S = 1048576L
    assert(got == Map(
      (0L, 0L) -> (3L, 3L, S),            // u1,u2,u3
      (0L, 1L) -> (1L, 3L, S / 3),        // u1
      (0L, 2L) -> (2L, 3L, 2L * S / 3),   // u1,u2
      (1L, 0L) -> (1L, 1L, S),            // u4
      (1L, 1L) -> (1L, 1L, S)))           // u4
  }

  test("guards: pre-epoch timestamps and bad periodDays are loud; " +
      "null users/timestamps are excluded") {
    import spark.implicits._
    val ok = Seq((1L, ts(2))).toDF("u", "t")
    intercept[IllegalArgumentException](
      Cohort.retention(ok, col("u"), col("t"), periodDays = 0))
    val pre = Seq((1L,
      java.sql.Timestamp.valueOf("1969-12-30 00:00:00"))).toDF("u", "t")
    intercept[Exception](
      Cohort.retention(pre, col("u"), col("t")).collect())
    val withNulls = Seq(
      (java.lang.Long.valueOf(1L), ts(2)),
      (null.asInstanceOf[java.lang.Long], ts(3)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("u", "t")
    assert(Cohort.retention(withNulls, col("u"), col("t"))
      .collect().length == 1)
  }
}
