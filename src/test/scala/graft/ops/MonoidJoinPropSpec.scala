package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property test for joinStep against an executable model of the
  * reference semantics (`bufToStr`, /root/reference/src/Hadron/Join.hs:
  * 81-111): per key, the output is the cross-product of each dataset's
  * row LIST folded with mconcat; missing optional ⇒ mempty, missing
  * required ⇒ no row. The model is 6 lines of plain Scala; the property
  * pits it against the distributed implementation on random inputs —
  * the ScalaCheck analog of the reference's own prop_utcMrKeySort
  * discipline (test/Tests.hs:22-33).
  */
class MonoidJoinPropSpec extends SparkSpec {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  private def model(
      inputs: Seq[(Seq[(Int, String)], JoinSide)]): Map[Int, Seq[String]] = {
    val keys = inputs.flatMap(_._1.map(_._1)).toSet
    keys.iterator.flatMap { k =>
      val lists = inputs.map { case (rows, _) =>
        rows.filter(_._1 == k).map(_._2)
      }
      val required = inputs.map(_._2)
      if (lists.zip(required).exists { case (l, s) => l.isEmpty && s == JRequired })
        None
      else {
        val eff = lists.map(l => if (l.isEmpty) Seq("") else l)
        val combos = eff.foldLeft(Seq(Seq.empty[String])) { (acc, l) =>
          for (stem <- acc; x <- l) yield stem :+ x
        }
        Some(k -> combos.map(_.mkString))
      }
    }.toMap
  }

  private val genDataset: Gen[Seq[(Int, String)]] =
    Gen.listOf(for {
      k <- Gen.choose(0, 4)
      v <- Gen.oneOf("a", "b", "c", "d")
    } yield (k, v)).map(_.take(6))

  private val genInput: Gen[(Seq[(Int, String)], JoinSide)] =
    for {
      ds <- genDataset
      side <- Gen.oneOf(JRequired, JOptional)
    } yield (ds, side)

  test("joinStep == reference bufToStr model on random inputs") {
    import spark.implicits._
    val prop: Prop = forAll(Gen.listOfN(3, genInput)) { inputs =>
      val expected = model(inputs)
      val actual = MonoidJoin
        .joinStep[Int, String](inputs.map { case (rows, side) =>
          MonoidJoin.Input(spark.createDataset(rows), side)
        })
        .collect()
        .groupBy(_._1)
        .map { case (k, rows) => k -> rows.map(_._2).toSeq }
      // multiset equality per key (cross-product order is unspecified)
      expected.keySet == actual.keySet &&
      expected.forall { case (k, vs) =>
        vs.sorted == actual(k).sorted
      }
    }
    check(prop, minSuccessful = 30)
  }

  test("typed sort order == semantic order for timestamps (prop_utcMrKeySort analog)") {
    import spark.implicits._
    val genTs = Gen.listOfN(40, Gen.choose(0L, 4102444800000L)) // 1970..2100
    check(forAll(genTs) { millis =>
      val df = millis.zipWithIndex.toDF("ms", "i")
        .select(org.apache.spark.sql.functions.timestamp_millis(
          org.apache.spark.sql.functions.col("ms")).as("ts"))
      val sorted = df.orderBy("ts").collect().map(_.getTimestamp(0).getTime)
      sorted.toSeq == millis.sorted
    }, minSuccessful = 10)
  }
}
