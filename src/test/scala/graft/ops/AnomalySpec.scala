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
}
