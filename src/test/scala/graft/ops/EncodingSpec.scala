package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Feature encoders vs plain-Scala models — deterministic,
  * hash-addressed, exact-integer, so equality is bitwise.
  */
class EncodingSpec extends SparkSpec {

  test("hashFeatures == independent JVM md5 slot model; per-doc slot " +
      "counts sum to the token count; same token always lands in the " +
      "same slot; dim guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta"),
      (3L, ""))
    def slotOf(t: String, dim: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % dim
    }
    def model(dim: Int): Map[(Long, Long), Long] =
      docs.flatMap { case (id, tx) =>
        tx.split("\\s+").filter(_.nonEmpty).map(t => (id, slotOf(t, dim)))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val dim = 64
    val got = Encoding.hashFeatures(docs.toDF("id", "tx"),
        col("id"), col("tx"), dim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == model(dim))
    // slot counts per doc sum to the doc's token count
    assert(got.filter(_._1._1 == 1L).values.sum == 4L)
    assert(got.filter(_._1._1 == 2L).values.sum == 2L)
    assert(!got.keys.exists(_._1 == 3L)) // empty text -> no slots
    intercept[IllegalArgumentException](Encoding.hashFeatures(
      docs.toDF("id", "tx"), col("id"), col("tx"), dim = 1))
  }

  test("vocabIndex == (freq DESC, term ASC) rank model; indices are " +
      "dense 1..V; minCount cuts before ranking") {
    import spark.implicits._
    val docs = Seq(
      "the cat and the dog and the bird",
      "a cat and a dog",
      "the end").toDF("tx")
    def model(minCount: Long): Map[String, (Long, Long)] = {
      val freq = ("the cat and the dog and the bird a cat and a dog " +
        "the end").split(" ").groupBy(identity)
        .map { case (t, v) => t -> v.length.toLong }
        .filter(_._2 >= minCount)
      freq.toSeq.sortBy { case (t, f) => (-f, t) }.zipWithIndex
        .map { case ((t, f), i) => t -> (f, i + 1L) }.toMap
    }
    for (mc <- Seq(1L, 2L)) {
      val got = Encoding.vocabIndex(docs, col("tx"), mc)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == model(mc), s"minCount=$mc")
      val idxs = got.values.map(_._2).toSeq.sorted
      assert(idxs == (1L to got.size.toLong)) // dense, 1-based
    }
    // the most frequent term is index 1
    val top = Encoding.vocabIndex(docs, col("tx"), 1L)
      .filter(col("idx") === 1L).collect()(0)
    assert(top.getString(0) == "the" && top.getLong(1) == 4L)
    intercept[IllegalArgumentException](
      Encoding.vocabIndex(docs, col("tx"), 0L))
  }

  test("looTargetEncode == leave-one-out model with TRUE floor; " +
      "singletons are NULL; a constant category encodes its own " +
      "constant; negative sums floor toward -inf") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 33L),
      (4L, "b", 7L), (5L, "b", -8L),
      (6L, "c", 42L),
      (7L, "d", 5L), (8L, "d", 5L))
    def floorDiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a.sign * b.sign < 0 && q * b != a) q - 1 else q
    }
    def model: Map[Long, Option[Long]] = {
      val byCat = rows.groupBy(_._2)
      rows.map { case (id, c, v) =>
        val others = byCat(c).filter(_._1 != id).map(_._3)
        id -> (if (others.isEmpty) None
          else Some(floorDiv(BigInt(others.sum) * 1048576,
            BigInt(others.length)).toLong))
      }.toMap
    }
    val got = Encoding.looTargetEncode(rows.toDF("id", "c", "v"),
        col("id"), col("c"), col("v"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == model)
    assert(got(6L).isEmpty) // singleton category
    assert(got(7L) == Some(5L * 1048576L)) // constant category
    // negative floor: id 4's others = [-8] -> exactly -8 * 2^20
    assert(got(4L) == Some(-8L * 1048576L))
    // id 5's others = [7]
    assert(got(5L) == Some(7L * 1048576L))
    intercept[IllegalArgumentException](Encoding.looTargetEncode(
      rows.toDF("id", "c", "v"), col("id"), col("c"), col("v"),
      maxCategories = 0))
  }
}
