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

  // ---- ngramStats ------------------------------------------------------

  private def runNgram(rows: Seq[(Long, String)], minN: Int = 2,
      maxN: Int = 10) = {
    import spark.implicits._
    Repetition.ngramStats(rows.toDF("doc_id", "text").repartition(3),
        col("doc_id"), col("text"), minN, maxN)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
  }

  test("ngramStats == a plain-Scala model over fixture docs, every n") {
    def model(id: Long, text: String, n: Int)
        : Option[((Long, Long), (Long, Double, Double))] = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n || text.isEmpty) None
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).map { case (g, o) =>
          g -> o.length }
        val top = counts.map { case (g, c) => c.toLong * g.length }.max
        val dup = counts.collect { case (g, c) if c > 1 =>
          c.toLong * g.length }.sum
        Some((id, n.toLong) -> ((grams.length.toLong,
          top.toDouble / text.length, dup.toDouble / text.length)))
      }
    }
    val docs = Seq(
      (1L, "the cat sat on the cat sat on the mat"),
      (2L, "a b a b a b a b a b a b"),
      (3L, "all distinct words here nothing repeats at all today"),
      (4L, "one"),
      (5L, ""))
    val expected = (for {
      (id, text) <- docs; n <- 2 to 10
      kv <- model(id, text, n)
    } yield kv).toMap
    assert(runNgram(docs) == expected)
  }

  test("ngramStats: planted exact values — top covers the dominant " +
      "bigram, dup picks up every repeated occurrence, clean docs " +
      "score dup 0, sub-n docs emit no row") {
    // "x y x y x y": bigrams = [x y, y x, x y, y x, x y] — "x y"(3) and
    // "y x"(2), all dup. text chars = 11.
    val got = runNgram(Seq((1L, "x y x y x y")), minN = 2, maxN = 3)
    assert(got((1L, 2L)) == ((5L, 9.0 / 11, 15.0 / 11)),
      s"got ${got((1L, 2L))}") // top = 3*3=9; dup = 3*3+2*3=15 (>1.0 ok)
    // trigrams: [x y x, y x y, x y x, y x y] → top 2*5=10, dup 20
    assert(got((1L, 3L)) == ((4L, 10.0 / 11, 20.0 / 11)))
    val clean = runNgram(Seq((2L, "all fresh words")), minN = 2, maxN = 4)
    assert(clean((2L, 2L))._3 == 0.0 && clean((2L, 3L))._3 == 0.0)
    assert(!clean.contains((2L, 4L)), "3 tokens have no 4-gram")
    intercept[IllegalArgumentException](
      runNgram(Seq((1L, "a b")), minN = 1))
    intercept[IllegalArgumentException](
      runNgram(Seq((1L, "a b")), minN = 3, maxN = 2))
  }
}
