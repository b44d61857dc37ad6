package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Repetition.stats(rows.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
  }

  test("dup-line fractions: planted repeated lines") {
    // 4 lines, "spam" twice: dup_line_frac = 2/4; chars 4+4+27+4 = 39,
    // dup chars 8
    val doc = "spam\nspam\nthis line appears only once\nonce"
    //         4    4    27 chars                   4
    val out = run(Seq((1L, doc)))
    val (n, dlf, dlcf, _) = out(1L)
    assert(n == 4L)
    assert(dlf == 2.0 / 4.0)
    assert(dlcf == 8.0 / 39.0)
  }

  test("empty lines are dropped; degenerate docs give zeros") {
    val out = run(Seq(
      (1L, "\n\n\n"),          // only empty lines
      (2L, ""),                // empty text
      (3L, "one token")))      // single line, no repetition
    assert(out(1L) == ((0L, 0.0, 0.0, 0.0)))
    assert(out(2L) == ((0L, 0.0, 0.0, 0.0)))
    val (n3, dlf3, dlcf3, tb3) = out(3L)
    assert(n3 == 1L && dlf3 == 0.0 && dlcf3 == 0.0)
    // "one token" has one bigram covering 9 of 9 chars
    assert(tb3 == 1.0)
  }

  test("top-bigram coverage: the dominating phrase wins") {
    // "buy now" (7 chars) occurs 3x in 34 chars; "now buy" twice (they
    // interleave); top = max(3*7, 2*7) = 21
    val doc = "buy now buy now buy now other tail"
    val out = run(Seq((1L, doc)))
    val (_, _, _, tb) = out(1L)
    assert(tb == 21.0 / doc.length)
  }

  test("kernel == plain-Scala model on fixture docs") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .limit(100)
      .select(col("doc_id"),
        regexp_replace(col("text"), lit(" table "), lit("\n")).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val lines = text.split("\n", -1).filter(_.nonEmpty)
      val lc = lines.groupBy(identity).view.mapValues(_.length).toMap
      val dupLines = lines.count(l => lc(l) > 1)
      val dupChars = lines.filter(l => lc(l) > 1).map(_.length.toLong).sum
      val totChars = lines.map(_.length.toLong).sum
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val bgs = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val top = if (bgs.isEmpty) 0L
        else bgs.groupBy(identity).map { case (g, o) => o.length.toLong * g.length }.max
      id -> ((lines.length.toLong,
        if (lines.nonEmpty) dupLines.toDouble / lines.length else 0.0,
        if (totChars > 0) dupChars.toDouble / totChars else 0.0,
        if (top > 0) top.toDouble / text.length else 0.0))
    }.toMap
    import spark.implicits._
    val got = Repetition.stats(
        docs.toSeq.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == expected)
  }
}
