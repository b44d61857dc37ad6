package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class Scd2Spec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
  private def us(min: Int): Long = ts(min).getTime * 1000L

  test("buildIntervals: consecutive duplicates collapse, intervals " +
      "chain exactly, the last interval is current, null attr values " +
      "compare equal, keys are independent") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, ts(0), Some("a")),
      (1L, 2L, ts(5), Some("a")),   // unchanged: collapses
      (1L, 3L, ts(10), Some("b")),  // change
      (1L, 4L, ts(15), None),       // change to null
      (1L, 5L, ts(20), None),       // null == null: collapses
      (1L, 6L, ts(25), Some("a")),  // change back
      (2L, 7L, ts(1), Some("x")))
      .toDF("k", "id", "t", "v").repartition(3)
    val got = Scd2.buildIntervals(rows, col("k"), col("t"),
        Seq(col("t"), col("id")), attrs = Seq("v" -> col("v")))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4)))
      .toSet
    assert(got == Set(
      (1L, Some("a"), us(0), Some(us(10)), false),
      (1L, Some("b"), us(10), Some(us(15)), false),
      (1L, None, us(15), Some(us(25)), false),
      (1L, Some("a"), us(25), None, true),
      (2L, Some("x"), us(1), None, true)))
    // intervals must CHAIN: each valid_to equals the key's next
    // valid_from (no gaps, no overlaps)
    val k1 = got.filter(_._1 == 1L).toSeq.sortBy(_._3)
    k1.sliding(2).foreach {
      case Seq(a, b) => assert(a._4.contains(b._3), s"gap between $a and $b")
      case _ =>
    }
    intercept[IllegalArgumentException](
      Scd2.buildIntervals(rows, col("k"), col("t"), Seq.empty,
        Seq("v" -> col("v"))))
    intercept[IllegalArgumentException](
      Scd2.buildIntervals(rows, col("k"), col("t"), Seq(col("t")),
        Seq.empty))
  }

  test("buildIntervals: multi-attribute change detection — a change in " +
      "ANY tracked column opens an interval") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, ts(0), "a", 10L),
      (1L, 2L, ts(5), "a", 20L),  // second attr changed: new interval
      (1L, 3L, ts(10), "a", 20L)) // unchanged: collapses
      .toDF("k", "id", "t", "v1", "v2")
    val got = Scd2.buildIntervals(rows, col("k"), col("t"),
        Seq(col("t"), col("id")),
        attrs = Seq("v1" -> col("v1"), "v2" -> col("v2")))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)
    assert(got.toSeq == Seq(("a", 10L, us(0)), ("a", 20L, us(5))))
  }
}
