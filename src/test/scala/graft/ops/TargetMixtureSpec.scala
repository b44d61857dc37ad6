package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TargetMixtureSpec extends SparkSpec {

  private def h52(id: Long, salt: String): BigInt = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$salt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    BigInt(new java.math.BigInteger(hex, 16))
  }

  // a:1000 b:500 c:2000 rows; weights 1:1:2 → binding group is b
  // (min N/w), kept whole; a and c each keep at exact rate 1/2
  private val rows =
    (1L to 1000L).map(i => (i, "a")) ++
    (2001L to 2500L).map(i => (i, "b")) ++
    (3001L to 5000L).map(i => (i, "c"))

  test("keeps the binding group whole and every group at its exact " +
      "rational rate — matches a BigInt model row for row") {
    import spark.implicits._
    val w = Map("a" -> 1L, "b" -> 1L, "c" -> 2L)
    val n = Map("a" -> 1000L, "b" -> 500L, "c" -> 2000L)
    val kept = Sampling.targetMixture(
      rows.toDF("id", "src"), col("id"), "mx1", col("src"), w)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val model = rows.filter { case (i, g) =>
      // g* = b: h·(w_b·N_g) < (w_g·N_b)·2^52
      h52(i, "mx1") * (BigInt(1) * n(g)) < ((BigInt(w(g)) * 500) << 52)
    }
    assert(kept.toSet == model.toSet)
    val byG = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byG("b") == 500) // binding group fully kept
    // a and c sit near their exact expected sizes (hash noise only)
    assert(math.abs(byG("a") - 500) < 60 && math.abs(byG("c") - 1000) < 90)
  }

  test("raising one weight only adds rows of that group (nesting)") {
    import spark.implicits._
    val df = rows.toDF("id", "src")
    def run(wc: Long): Set[(Long, String)] = Sampling.targetMixture(
      df, col("id"), "mx1", col("src"),
      Map("a" -> 1L, "b" -> 1L, "c" -> wc))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = run(2L); val s3 = run(3L)
    assert(s2.subsetOf(s3))
    assert((s3 -- s2).forall(_._2 == "c"))
  }

  test("unweighted and zero-weight groups are dropped; guards hold") {
    import spark.implicits._
    val df = rows.toDF("id", "src")
    val kept = Sampling.targetMixture(
      df, col("id"), "mx1", col("src"), Map("a" -> 0L, "b" -> 1L))
      .collect().map(_.getString(1)).toSet
    assert(kept == Set("b"))
    intercept[IllegalArgumentException](
      Sampling.targetMixture(df, col("id"), "s", col("src"), Map.empty))
    intercept[IllegalArgumentException](
      Sampling.targetMixture(df, col("id"), "s", col("src"),
        Map("zzz" -> 5L)))
  }
}
