package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("describe: nulls, distincts, min/max per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), 10),
      (2L, None, 10),
      (3L, Some("a"), 30)).toDF("id", "s", "v")
    val out = Profile.describe(df)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(out("id") == ((0L, 3L, "1", "3")))
    assert(out("s") == ((1L, 2L, "a", "b")))
    assert(out("v") == ((0L, 2L, "10", "30")))
  }

  test("column subset and unknown-column guard") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s")
    val out = Profile.describe(df, Seq("s")).collect()
    assert(out.length == 1 && out.head.getString(0) == "s")
    intercept[IllegalArgumentException] {
      Profile.describe(df, Seq("nope"))
    }
  }
}
