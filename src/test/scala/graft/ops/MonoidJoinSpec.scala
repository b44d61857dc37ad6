package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Dataset

/** Truth table of hadron's monoidal join semantics
  * (/root/reference/src/Hadron/Join.hs:81-111): per key, output = cartesian
  * product across per-dataset row lists, each combination mconcat'ed;
  * missing optional ⇒ mempty contribution; missing required ⇒ no row.
  */
class MonoidJoinSpec extends SparkSpec {
  import MonoidJoin._

  private def ds(rows: (String, String)*): Dataset[(String, String)] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  private def run(inputs: Input[String, String]*): Map[String, Seq[String]] = {
    import spark.implicits._
    joinStep[String, String](inputs)
      .collect().toSeq.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted }
  }

  test("key present in all datasets: single combination, concatenated") {
    val out = run(
      Input(ds("k" -> "a"), JRequired),
      Input(ds("k" -> "b"), JRequired))
    assert(out("k") == Seq("ab"))
  }

  test("missing required side eliminates the key") {
    val out = run(
      Input(ds("k1" -> "a", "k2" -> "x"), JRequired),
      Input(ds("k1" -> "b"), JRequired))
    assert(out.contains("k1") && !out.contains("k2"))
  }

  test("missing optional side contributes mempty") {
    val out = run(
      Input(ds("k1" -> "a", "k2" -> "x"), JRequired),
      Input(ds("k1" -> "b"), JOptional))
    assert(out("k1") == Seq("ab"))
    assert(out("k2") == Seq("x")) // x <> mempty = x
  }

  test("multi-row sides produce the full cartesian of mconcats") {
    val out = run(
      Input(ds("k" -> "a1", "k" -> "a2"), JRequired),
      Input(ds("k" -> "b1", "k" -> "b2"), JRequired))
    assert(out("k") == Seq("a1b1", "a1b2", "a2b1", "a2b2"))
  }

  test("three-way with middle optional missing keeps order of sides") {
    val out = run(
      Input(ds("k" -> "a"), JRequired),
      Input(ds(), JOptional),
      Input(ds("k" -> "c"), JRequired))
    assert(out("k") == Seq("ac"))
  }

  test("all-optional join emits every key present anywhere") {
    val out = run(
      Input(ds("k1" -> "a"), JOptional),
      Input(ds("k2" -> "b"), JOptional))
    assert(out("k1") == Seq("a") && out("k2") == Seq("b"))
  }

  test("3-way multi-row join keeps dataset order inside every combo " +
      "(non-commutative monoid through the stems/stream path)") {
    val out = run(
      Input(ds("k" -> "a1", "k" -> "a2"), JRequired),
      Input(ds("k" -> "b1", "k" -> "b2"), JRequired),
      Input(ds("k" -> "c1", "k" -> "c2"), JRequired))
    assert(out("k") == (for {
      a <- Seq("a1", "a2"); b <- Seq("b1", "b2"); c <- Seq("c1", "c2")
    } yield a + b + c).sorted)
  }

  test("one large-fan-in key (200x200 optional rows) completes with " +
      "bounded combo materialization (emitStream shape, Join.hs:109-111)") {
    import spark.implicits._
    implicit val longSum: Monoid[Long] = Monoid(0L)(_ + _)
    val left = spark.createDataset((1 to 200).map(i => ("k", i.toLong)))
    val right = spark.createDataset((1 to 200).map(j => ("k", j.toLong)))
    val out = joinStep[String, Long](Seq(
      Input(left, JOptional), Input(right, JOptional))).collect()
    assert(out.length == 200 * 200)
    // sum over all combos of (i + j) = 2 * 200 * (1+..+200)
    assert(out.map(_._2).sum == 2L * 200 * 20100)
  }

  test("joinMR inner 2-way combines pairwise per key") {
    import spark.implicits._
    val out = MonoidJoin.joinMR(
      ds("k" -> "l1", "k" -> "l2"), ds("k" -> "r"))
      .collect().toSeq.map(_._2).sorted
    assert(out == Seq("l1r", "l2r"))
  }
}
