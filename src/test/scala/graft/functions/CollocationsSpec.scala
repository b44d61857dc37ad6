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
}
