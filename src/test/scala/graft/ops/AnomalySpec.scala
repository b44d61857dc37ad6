package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {

  private def model(vs: Seq[Long], z: Long): Seq[Boolean] = {
    val n = BigInt(vs.length); val s = BigInt(vs.sum)
    val q = vs.map(v => BigInt(v) * BigInt(v)).sum
    vs.map { v =>
      val dev = n * BigInt(v) - s
      dev * dev > BigInt(z * z) * (n * q - s * s)
    }
  }

  test("flags exactly the rows the integer inequality flags") {
    import spark.implicits._
    // 19 flat points + one spike: with few points a spike inflates σ
    // enough to mask itself (at n=10 this very spike does NOT flag —
    // the integer inequality reproduces that faithfully)
    val a = Seq.fill(19)(10L) :+ 60L
    val b = Seq(5L, 5L, 5L, 5L)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("k", "v")
    val got = Anomaly.zScoreFlags(df, Seq("k"), col("v"), z = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    val expA = a.zip(model(a, 3)).toSet
    val expB = b.zip(model(b, 3)).toSet
    assert(got.filter(_._1 == "a").map(t => (t._2, t._3)).toSet == expA)
    assert(got.filter(_._1 == "b").map(t => (t._2, t._3)).toSet == expB)
    // the spike is caught, the zero-variance group is quiet
    assert(expA.contains((60L, true)) && expB.forall(!_._2))
    assert(got.forall(r => r._1 != "b" || !r._3))
  }

  test("single-row groups and exact-boundary values do not flag") {
    import spark.implicits._
    // v = {0, 2}: dev² = 4, z=1 → rhs = 1·(2·4 − 4) = 4 → NOT > → quiet
    val df = Seq(("solo", 7L), ("pair", 0L), ("pair", 2L)).toDF("k", "v")
    val got = Anomaly.zScoreFlags(df, Seq("k"), col("v"), z = 1)
      .collect().map(r => r.getBoolean(3))
    assert(got.forall(_ == false))
  }

  test("guards") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException](
      Anomaly.zScoreFlags(df, Seq.empty, col("v")))
    intercept[IllegalArgumentException](
      Anomaly.zScoreFlags(df, Seq("k"), col("v"), 0))
  }

  // ---- cusumAlarms ---------------------------------------------------

  /** Sequential scalar replay of the documented recurrence. */
  private def cusumModel(vs: Seq[(Long, Long)], target: Long, slack: Long,
      thresh: Long): Seq[(Long, Long, Long)] = {
    var s = 0L
    var seq = 0L
    vs.flatMap { case (id, v) =>
      s = math.max(0L, s + v - target - slack)
      if (s >= thresh) {
        seq += 1
        val out = (id, s, seq)
        s = 0L
        Some(out)
      } else None
    }
  }

  private def runCusum(rows: Seq[(Long, Long, Long, Long)], target: Long,
      slack: Long, thresh: Long): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("k", "id", "t", "v").repartition(4)
    Anomaly.cusumAlarms(df, col("k"), col("id"), Seq(col("t"), col("id")),
        col("v"), target, slack, thresh)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
  }

  test("cusumAlarms replays the sequential recurrence exactly per key: " +
      "sub-threshold drift accumulates across rows no single point " +
      "would flag, s resets after each alarm, keys are independent, " +
      "row order is (t, id) not input order") {
    // key 1: drift of +6 per row over target+slack=10+2=12... values 20
    // each: s climbs 8 per row, alarm at s>=30 on the 4th (s=32), then
    // resets and alarms again on the 8th. key 2: one huge spike alarms
    // alone. key 3: stays below threshold forever.
    val k1 = (1L to 8L).map(i => (1L, i, i, 20L))
    val k2 = Seq((2L, 100L, 1L, 50L), (2L, 101L, 2L, 1L))
    val k3 = (1L to 20L).map(i => (3L, 100 + i, i, 12L)) // v == drop: s=0
    val rows = scala.util.Random.shuffle(k1 ++ k2 ++ k3)
    val got = runCusum(rows, target = 10L, slack = 2L, thresh = 30L)
    val want =
      (cusumModel(k1.map(r => (r._2, r._4)), 10, 2, 30).map {
        case (id, s, q) => (1L, id, s, q) } ++
       cusumModel(k2.map(r => (r._2, r._4)), 10, 2, 30).map {
        case (id, s, q) => (2L, id, s, q) }).sorted
    assert(got == want)
    assert(got.nonEmpty && got.forall(_._3 >= 30L))
    assert(!got.exists(_._1 == 3L))
    // the k1 cascade fired exactly twice, at rows 4 and 8
    assert(got.filter(_._1 == 1L).map(_._2) == Seq(4L, 8L))
  }

  // ---- ewmaSmooth ----------------------------------------------------

  test("ewmaSmooth replays the scalar recurrence exactly per key — " +
      "first value seeds, floor at every step, keys independent, " +
      "(t, id) order — and rejects negative values loudly") {
    import spark.implicits._
    def model(vs: Seq[Long], alpha: Int): Seq[Long] =
      vs.tail.scanLeft(vs.head << 8)((s, v) =>
        (alpha * (v << 8) + (16 - alpha) * s) >> 4)
    val k1 = Seq(100L, 0L, 37L, 999L, 1L)
    val k2 = Seq(5L, 5L, 5L)
    val rows = scala.util.Random.shuffle(
      k1.zipWithIndex.map { case (v, i) => (1L, i.toLong, i.toLong, v) } ++
      k2.zipWithIndex.map { case (v, i) => (2L, 10L + i, i.toLong, v) })
    val got = Anomaly.ewmaSmooth(rows.toDF("k", "id", "t", "v")
        .repartition(4), col("k"), col("id"), Seq(col("t"), col("id")),
        col("v"), alpha = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSeq.sorted
    val want = (model(k1, 3).zipWithIndex.map { case (s, i) =>
        (1L, i.toLong, s) } ++
      model(k2, 3).zipWithIndex.map { case (s, i) => (2L, 10L + i, s) })
      .sorted
    assert(got == want)
    // a constant series stays exactly at v<<8 (no floor leak)
    assert(got.filter(_._1 == 2L).forall(_._3 == (5L << 8)))
    val neg = Seq((1L, 1L, 1L, -3L)).toDF("k", "id", "t", "v")
    intercept[Exception](Anomaly.ewmaSmooth(neg, col("k"), col("id"),
      Seq(col("t")), col("v"), alpha = 4).collect())
    intercept[IllegalArgumentException](Anomaly.ewmaSmooth(neg, col("k"),
      col("id"), Seq(col("t")), col("v"), alpha = 0))
  }

  // ---- rollingZFlags -------------------------------------------------

  test("rollingZFlags: trailing-window exact z-inequality — a spike " +
      "flags against its own recent past, the SAME spike is quiet " +
      "with too little history, the current row never poisons its own " +
      "baseline, and a level shift re-baselines within a window") {
    import spark.implicits._
    // key 1: 10 flat points then a spike — must flag (n=10 >= minPoints)
    val k1 = (1 to 10).map(i => (1L, i.toLong, i.toLong, 50L)) :+
      (1L, 11L, 11L, 500L)
    // key 2: 4 flat points then the same spike — n=4 < minPoints: quiet
    val k2 = (1 to 4).map(i => (2L, 20L + i, i.toLong, 50L)) :+
      (2L, 25L, 5L, 500L)
    val got = Anomaly.rollingZFlags(
        (k1 ++ k2).toDF("k", "id", "t", "v").repartition(3),
        col("k"), col("id"), Seq(col("t"), col("id")), col("v"),
        window = 16, z = 3, minPoints = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    val flagged = got.filter(_._3).map(x => (x._1, x._2)).toSet
    assert(flagged == Set((1L, 11L)))
    // zero-variance baseline + equal value: dev = 0, both sides 0 — quiet
    assert(got.filter(x => x._1 == 1L && x._2 <= 10L).forall(!_._3))
    intercept[IllegalArgumentException](Anomaly.rollingZFlags(
      k1.toDF("k", "id", "t", "v"), col("k"), col("id"), Seq(col("t")),
      col("v"), window = 1))
    intercept[IllegalArgumentException](Anomaly.rollingZFlags(
      k1.toDF("k", "id", "t", "v"), col("k"), col("id"), Seq(col("t")),
      col("v"), window = 4, minPoints = 5))
  }

  test("cusumAlarms guards: positive threshold, non-negative slack, " +
      "total order required") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L, 1L)).toDF("k", "id", "t", "v")
    intercept[IllegalArgumentException](Anomaly.cusumAlarms(
      df, col("k"), col("id"), Seq(col("t")), col("v"), 0L, 0L, 0L))
    intercept[IllegalArgumentException](Anomaly.cusumAlarms(
      df, col("k"), col("id"), Seq(col("t")), col("v"), 0L, -1L, 5L))
    intercept[IllegalArgumentException](Anomaly.cusumAlarms(
      df, col("k"), col("id"), Seq.empty, col("v"), 0L, 0L, 5L))
  }

  test("leadLagCorrelation == hand model on a shifted pulse; missing " +
      "buckets count as zero; n_days = span - |lag|; swapping the " +
      "series mirrors the lag axis") {
    import spark.implicits._
    // bucketSec = 10: A pulses at buckets 0 and 3, B pulses at 1 and
    // 4 (B = A shifted by +1 bucket); bucket 2 has NO events at all
    // (the dense spine must still count it as (0, 0)).
    val ev = Seq(
      (5L, "a"), (8L, "a"),            // bucket 0: a = 2
      (12L, "b"),                      // bucket 1: b = 1
      (31L, "a"),                      // bucket 3: a = 1
      (45L, "b"), (47L, "b"),          // bucket 4: b = 2
      (46L, "x"))                      // other types are filtered out
    val got = Anomaly.leadLagCorrelation(ev.toDF("s", "t"),
        col("s"), col("t"), "a", "b", maxLag = 2, bucketSec = 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got.size == 5)
    // span = buckets 0..4 (5 dense buckets), a = [2,0,0,1,0],
    // b = [0,1,0,0,2]
    val a = Seq(2L, 0L, 0L, 1L, 0L)
    val b = Seq(0L, 1L, 0L, 0L, 2L)
    (-2 to 2).foreach { lg =>
      val pairs = (0 to 4).flatMap { i =>
        val j = i + lg
        if (j >= 0 && j <= 4) Some((a(i), b(j))) else None
      }
      val (sa, sb) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sab = pairs.map(p => p._1 * p._2).sum
      val saa = pairs.map(p => p._1 * p._1).sum
      val sbb = pairs.map(p => p._2 * p._2).sum
      assert(got(lg.toLong) ==
        (pairs.length.toLong, sa, sb, sab, saa, sbb), s"lag $lg")
      assert(got(lg.toLong)._1 == 5L - math.abs(lg))
    }
    // the +1 lag is the perfect alignment: sab = 2*1 + 1*2 = 4,
    // every other lag pairs a pulse with a zero except -2 (a(3)*b(1))
    assert(got(1L)._4 == 4L)
    assert(got(0L)._4 == 0L && got(2L)._4 == 0L && got(-1L)._4 == 0L)
    // swapping A and B mirrors the lag axis
    val swapped = Anomaly.leadLagCorrelation(ev.toDF("s", "t"),
        col("s"), col("t"), "b", "a", maxLag = 2, bucketSec = 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    (-2 to 2).foreach { lg =>
      assert(swapped(lg.toLong) == (got(-lg.toLong)._1, got(-lg.toLong)._4))
    }
    // negative epoch raises loudly; bad params raise at build
    intercept[Exception](Anomaly.leadLagCorrelation(
      Seq((-5L, "a"), (1L, "b")).toDF("s", "t"),
      col("s"), col("t"), "a", "b", maxLag = 1, bucketSec = 10L)
      .collect())
    intercept[IllegalArgumentException](Anomaly.leadLagCorrelation(
      ev.toDF("s", "t"), col("s"), col("t"), "a", "a", maxLag = 1))
    intercept[IllegalArgumentException](Anomaly.leadLagCorrelation(
      ev.toDF("s", "t"), col("s"), col("t"), "a", "b", maxLag = 0))
    // empty after filtering -> zero rows
    assert(Anomaly.leadLagCorrelation(
      Seq((1L, "x")).toDF("s", "t"),
      col("s"), col("t"), "a", "b", maxLag = 1).collect().isEmpty)
  }
}
