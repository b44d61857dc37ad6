package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkSpec {

  test("matches a plain-Scala model of the fixed-point PMI definition") {
    import spark.implicits._
    val docs = Seq(
      (1L, "new york is big"),
      (2L, "new york new york"),
      (3L, "big apple is new"),
      (4L, "york is not new")).toDF("doc_id", "text")
    val toks = Seq("new york is big", "new york new york",
      "big apple is new", "york is not new").map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = toks.flatMap(t => t.zip(t.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTot = uni.values.sum; val bTot = bi.values.sum
    def pmi(x: String, y: String): Long =
      Dsir.ilog2Fx(bi((x, y))) + 2 * Dsir.ilog2Fx(tTot) -
        Dsir.ilog2Fx(bTot) - Dsir.ilog2Fx(uni(x)) - Dsir.ilog2Fx(uni(y))
    val expected = bi.keys.filter(p => bi(p) >= 2).toSeq
      .map { case (x, y) => (x, y, bi((x, y)), pmi(x, y)) }
      .sortBy { case (x, y, _, p) => (-p, x, y) }
    val got = Collocations.topPmi(
      docs, col("doc_id"), col("text"), minCount = 2, k = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the famous PMI property the minCount guard exists for: the rarer
    // qualifying pair ("york is", 2 occurrences) outranks the more
    // frequent "new york" — frequency and association are different axes
    assert(got.map(t => (t._1, t._2)) ==
      Seq(("york", "is"), ("new", "york")))
  }

  test("minCount drops hapax pairs; guards reject bad config") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(Collocations.topPmi(
      docs, col("doc_id"), col("text"), 2, 5).count() == 0)
    intercept[IllegalArgumentException](
      Collocations.topPmi(docs, col("doc_id"), col("text"), 0, 5))
    intercept[IllegalArgumentException](
      Collocations.topPmi(docs, col("doc_id"), col("text"), 1, 0))
  }

  test("skipgramPmi matches a plain-Scala windowed model: unordered " +
      "canonical pairs, every distance 1..window counted (same pair at " +
      "two distances pools), short docs contribute what they can") {
    import spark.implicits._
    val texts = Seq("x y x z", "z q x", "y", "x y")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val W = 2
    val toks = texts.map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val pairs = toks.flatMap { t =>
      for {
        i <- t.indices; d <- 1 to W if i + d < t.length
        a = t(i); b = t(i + d)
      } yield if (a <= b) (a, b) else (b, a)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTot = uni.values.sum; val pTot = pairs.values.sum
    def pmi(x: String, y: String): Long =
      Dsir.ilog2Fx(pairs((x, y))) + 2 * Dsir.ilog2Fx(tTot) -
        Dsir.ilog2Fx(pTot) - Dsir.ilog2Fx(uni(x)) - Dsir.ilog2Fx(uni(y))
    val expected = pairs.keys.filter(p => pairs(p) >= 2).toSeq
      .map { case (x, y) => (x, y, pairs((x, y)), pmi(x, y)) }
      .sortBy { case (x, y, _, p) => (-p, x, y) }
    val got = Collocations.skipgramPmi(
      docs, col("doc_id"), col("text"), window = W, minCount = 2, k = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // "x y" appears at distance 1 (docs 0, 3) AND as y..x at distance
    // 2 via (y, x) in doc 0 — pooling under the canonical order is the
    // point of the unordered definition
    assert(pairs(("x", "y")) == 3L)
    assert(got.exists(t => t._1 == "x" && t._2 == "y" && t._3 == 3L))
  }

  test("skipgramPmi window=1 equals topPmi up to pair orientation " +
      "pooling; guards reject bad windows") {
    import spark.implicits._
    // text chosen so every adjacent pair is already canonical (a <= b)
    // and no pair appears in both orientations — the two definitions
    // must then agree exactly
    val docs = Seq((1L, "a b b c"), (2L, "a b c")).toDF("doc_id", "text")
    val sg = Collocations.skipgramPmi(
      docs, col("doc_id"), col("text"), window = 1, minCount = 1, k = 20)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val bi = Collocations.topPmi(
      docs, col("doc_id"), col("text"), minCount = 1, k = 20)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(sg == bi)
    intercept[IllegalArgumentException](Collocations.skipgramPmi(
      docs, col("doc_id"), col("text"), window = 0, minCount = 1, k = 1))
    intercept[IllegalArgumentException](Collocations.skipgramPmi(
      docs, col("doc_id"), col("text"), window = 17, minCount = 1, k = 1))
  }
}
