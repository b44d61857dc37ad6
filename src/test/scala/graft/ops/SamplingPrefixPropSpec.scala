package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property tests for the content-addressed sampling and the distributed
  * prefix sum, each against a plain-Scala executable model (the same
  * discipline as MonoidJoinPropSpec): the model re-derives the md5 unit
  * hash and the cumulative cuts exactly as the DuckDB oracle does, so a
  * pass means Spark, the model and the oracle all agree on membership.
  */
class SamplingPrefixPropSpec extends SparkSpec {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  /** Plain-Scala mirror of Sampling.unitHash: md5("id:salt"), first 13
    * hex digits over 16^13.
    */
  private def modelUnitHash(id: Long, salt: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$salt".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(13)
    java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
  }

  private def modelLabel(
      id: Long, salt: String, fractions: Seq[(String, Double)]): String = {
    val u = modelUnitHash(id, salt)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.map(_._1).zip(cuts).init
      .collectFirst { case (l, c) if u < c => l }
      .getOrElse(fractions.last._1)
  }

  private val fractionsGen: Gen[Seq[(String, Double)]] = for {
    n <- Gen.choose(1, 4)
    raw <- Gen.listOfN(n, Gen.choose(0.0, 1.0))
    // normalize so the sum is <= 1 with slack for a remainder label
    scale <- Gen.choose(0.3, 1.0)
  } yield {
    val total = raw.sum max 1e-9
    raw.zipWithIndex.map { case (f, i) => s"l$i" -> f / total * scale }
  }

  test("splitLabel == the md5/cut model for arbitrary fraction lists " +
      "(and therefore matches the oracle's formulation)") {
    import spark.implicits._
    val ids = (1L to 200L)
    val df = ids.toDF("id")
    check(forAll(fractionsGen, Gen.alphaNumStr.suchThat(_.nonEmpty)) {
      (fr, salt) =>
        val fromSpark = df
          .withColumn("s", Sampling.splitLabel(col("id"), salt, fr))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val fromModel = ids.map(i => i -> modelLabel(i, salt, fr)).toMap
        fromSpark == fromModel
    }, minSuccessful = 15)
  }

  test("runningTotal == sequential scanLeft for arbitrary shuffled " +
      "inputs and partition layouts") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 120)
      vals <- Gen.listOfN(n, Gen.choose(0L, 50L))
      parts <- Gen.choose(1, 9)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (vals, parts, seed)
    check(forAll(gen) { case (vals, parts, seed) =>
      val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      val out = Prefix.runningTotal(
          shuffled.toDF("id", "v").repartition(parts), "id", "v", "run")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val model = rows.scanLeft((-1L, 0L)) { case ((_, acc), (id, v)) =>
        (id, acc + v)
      }.tail.toMap
      out == model
    }, minSuccessful = 12)
  }
}
