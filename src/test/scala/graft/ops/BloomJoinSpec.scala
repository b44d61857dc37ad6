package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  test("semiJoin == plain left-semi regardless of fpp") {
    import spark.implicits._
    val left = (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("k", "v")
    val right = (1 to 400).map(i => (i * 5).toLong).toDF("rk")
    val want = left.join(right, col("k") === col("rk"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    for (fpp <- Seq(0.5, 0.01)) { // even a terrible bloom stays exact
      val got = BloomJoin.semiJoin(left, col("k"), right, col("rk"),
          expectedItems = 400, fpp = fpp)
        .collect().map(_.getLong(0)).toSet
      assert(got == want, s"fpp=$fpp")
    }
  }

  test("antiJoin == plain anti, both arms exercised") {
    import spark.implicits._
    val left = (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("k", "v")
    val right = (1 to 400).map(i => (i * 5).toLong).toDF("rk")
    val want = left.join(right, col("k") === col("rk"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    // fpp 0.5 guarantees maybe-rows that the exact arm must clear
    val got = BloomJoin.antiJoin(left, col("k"), right, col("rk"),
        expectedItems = 400, fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(want.size == 1600)
  }

  test("string keys and null handling") {
    import spark.implicits._
    val left = Seq("a", "b", null, "c", "d").toDF("k")
    val right = Seq("b", "d", null).toDF("rk")
    val semi = BloomJoin.semiJoin(left, col("k"), right, col("rk"), 10)
      .collect().map(_.getString(0)).toSet
    assert(semi == Set("b", "d"))
    val anti = BloomJoin.antiJoin(left, col("k"), right, col("rk"), 10)
      .collect().map(r => Option(r.getString(0))).toSet
    // null keys match nothing -> they are anti-join survivors
    assert(anti == Set(Some("a"), Some("c"), None))
  }

  test("int-width mismatch between sides still matches") {
    import spark.implicits._
    val left = (1 to 100).map(_.toLong).toDF("k") // long
    val right = (1 to 50).map(i => i * 2).toDF("rk") // int
    val got = BloomJoin.semiJoin(left, col("k"), right, col("rk"), 50)
      .collect().map(_.getLong(0)).toSet
    assert(got == (2 to 100 by 2).map(_.toLong).toSet)
  }

  test("cross-family keys (string vs integral) are rejected, not " +
      "silently mis-hashed") {
    import spark.implicits._
    val left = Seq("5", "7").toDF("k")
    val right = Seq(5L, 6L).toDF("rk")
    // hash domains differ (putLong vs mightContainString) -> bloom
    // false NEGATIVES would silently drop matches; must fail fast
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(left, col("k"), right, col("rk"), 10)
    }
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(right, col("rk"), left, col("k"), 10)
    }
  }

  test("unsupported key type fails fast") {
    import spark.implicits._
    val left = Seq(1.5, 2.5).toDF("k")
    val right = Seq(1.5).toDF("rk")
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(left, col("k"), right, col("rk"), 10)
    }
  }
}
