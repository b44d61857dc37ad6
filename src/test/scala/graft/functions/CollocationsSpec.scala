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

  test("logOddsTerms == plain-Scala fightin'-words model; a term " +
      "over-used by one source scores positive there and negative " +
      "elsewhere; minCount drops corpus-rare terms AFTER V is fixed") {
    import spark.implicits._
    import graft.functions.Dsir.ilog2Fx
    val docs = Seq(
      ("a", "spam spam spam ham word word"),
      ("a", "spam spam word"),
      ("b", "ham ham ham word word spam"),
      ("b", "ham word rare"))
      .toDF("source", "text")
    val rows = Seq(
      ("a", Seq("spam", "spam", "spam", "ham", "word", "word")),
      ("a", Seq("spam", "spam", "word")),
      ("b", Seq("ham", "ham", "ham", "word", "word", "spam")),
      ("b", Seq("ham", "word", "rare")))
    def model(minCount: Long, k: Int)
        : Set[(String, String, Long, Long, Long, Long)] = {
      val sw = rows.flatMap { case (s, ts) => ts.map(s -> _) }
        .groupBy(identity).map { case ((s, w), g) =>
          (s, w, g.size.toLong) }.toSeq
      val yw = sw.groupBy(_._2).map { case (w, g) =>
        w -> g.map(_._3).sum }
      val ns = sw.groupBy(_._1).map { case (s, g) =>
        s -> g.map(_._3).sum }
      val v = yw.size.toLong
      val nn = yw.values.sum
      val scored = sw.filter { case (_, w, _) => yw(w) >= minCount }
        .map { case (s, w, ysw) =>
          val yrw = yw(w) - ysw; val nr = nn - ns(s)
          val d = (ilog2Fx(ysw + 1) - ilog2Fx(ns(s) + v - ysw - 1)) -
            (ilog2Fx(yrw + 1) - ilog2Fx(nr + v - yrw - 1))
          (s, w, ysw, yw(w), d)
        }
      scored.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy(t => (-t._5, t._2)).take(k).zipWithIndex
          .map { case (t, i) => (t._1, t._2, t._3, t._4, t._5,
            (i + 1).toLong) }
      }.toSet
    }
    def run(minCount: Long, k: Int)
        : Set[(String, String, Long, Long, Long, Long)] =
      Collocations.logOddsTerms(docs, col("source"), col("text"),
          minCount, k)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    for ((mc, k) <- Seq((1L, 10), (2L, 10), (1L, 2)))
      assert(run(mc, k) == model(mc, k), s"minCount=$mc k=$k")
    val all = run(1L, 10)
    val spamA = all.find(t => t._1 == "a" && t._2 == "spam").get
    val spamB = all.find(t => t._1 == "b" && t._2 == "spam").get
    assert(spamA._5 > 0 && spamB._5 < 0,
      s"spam must distinguish source a: $spamA vs $spamB")
    // minCount = 2 drops "rare" (y_w = 1) but V/totals keep it
    assert(run(2L, 10).forall(_._2 != "rare"))
  }

  test("zipfSlopeBySource == plain-Scala log-log least-squares model; " +
      "doubling every freq leaves the slope invariant; single-term " +
      "source signals den 0; natural decay slopes negative") {
    import spark.implicits._
    val texts = Map(
      // zipf-ish: "the" 12, "of" 6, "and" 4, "cat" 3, "dog" 2
      "a" -> Seq("the the the the of of and cat dog",
        "the the the the of of and cat dog",
        "the the the the of of and cat"),
      // uniform: every term twice -> ranks vary, y constant -> slope 0
      "b" -> Seq("p q r s", "s r q p"),
      // single qualifying term (others are hapax, cut by minCount=2)
      "c" -> Seq("solo solo once1 once2"))
    val docs = texts.toSeq.flatMap { case (s, ts) => ts.map((s, _)) }
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "src", "text")
    def model(minCount: Long): Map[String, (Long, Long)] =
      texts.map { case (s, ts) =>
        val freqs = ts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
          .filter(_._2 >= minCount)
        val ranked = freqs.toSeq.sortBy { case (w, f) => (-f, w) }
        val xy = ranked.zipWithIndex.map { case ((_, f), i) =>
          (BigInt(Dsir.ilog2Fx(i + 1L) >> 10),
            BigInt(Dsir.ilog2Fx(f) >> 10))
        }
        val n = BigInt(xy.size)
        val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
        val sxy = xy.map(p => p._1 * p._2).sum
        val sxx = xy.map(p => p._1 * p._1).sum
        val num = n * sxy - sx * sy
        val den = n * sxx - sx * sx
        val slope = if (den == 0) BigInt(0) else {
          val scaled = num * BigInt(1) * (BigInt(1) << 20)
          val q = scaled / den
          if (scaled.sign * den.sign < 0 && q * den != scaled) q - 1 else q
        }
        s -> (n.toLong, slope.toLong)
      }
    def run(df: org.apache.spark.sql.DataFrame, minCount: Long = 2L)
        : Map[String, (Long, Long)] =
      Collocations.zipfSlopeBySource(df, col("src"), col("text"), minCount)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = run(docs)
    assert(got == model(2L))
    assert(got("a")._2 < 0, s"zipf-ish source must slope down: $got")
    assert(got("b")._2 == 0, s"uniform freqs must slope 0: $got")
    assert(got("c") == (1L, 0L), s"single-term den-0 signal: $got")
    // doubling every document doubles every freq: y shifts by a
    // constant (+1024 on the coarse grid, exact), ranks unchanged,
    // and the slope is shift-invariant — at minCount=1, where the
    // qualifying term set is the same on both sides (doubling lifts
    // hapaxes past any higher threshold)
    val doubled = docs.unionAll(docs.withColumn("doc_id",
      col("doc_id") + 1000L))
    assert(run(doubled, 1L).view.mapValues(_._2).toMap ==
      run(docs, 1L).view.mapValues(_._2).toMap)
    intercept[IllegalArgumentException](Collocations.zipfSlopeBySource(
      docs, col("src"), col("text"), minCount = 0))
  }

  test("termBurstiness == plain-Scala Fano model; a one-per-doc term " +
      "is exactly 0 (Poisson floor), an all-in-one-doc clump is " +
      "k(N-1)/N; zeros count via N; minTotal filters") {
    import spark.implicits._
    // N = 4 docs. "flat" appears once in every doc (Fano 0);
    // "clump" appears 6 times, all in doc 1; "mid" is in between.
    val docs = Seq(
      (1L, "flat clump clump clump clump clump clump mid mid"),
      (2L, "flat mid"),
      (3L, "flat"),
      (4L, "flat rare"))
    def model(counts: Seq[Long], n: Long): Long = {
      val s = counts.sum
      val q = counts.map(c => c * c).sum
      (BigInt(n) * q - BigInt(s) * s) * 1048576 / (BigInt(n) * s)
    }.toLong
    val got = Collocations.termBurstiness(docs.toDF("id", "tx"),
        col("id"), col("tx"), minTotal = 2L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!got.contains("rare")) // total 1 < minTotal
    assert(got("flat") == (4L, 4L, 0L)) // constant rate: Var = 0
    assert(got("clump") == (1L, 6L, model(Seq(6L, 0L, 0L, 0L), 4L)))
    // all-in-one-doc closed form: k(N-1)/N * 2^20
    assert(got("clump")._3 == 6L * 3L * 1048576L / 4L)
    assert(got("mid") == (2L, 3L, model(Seq(2L, 1L, 0L, 0L), 4L)))
    // Fano is monotone in clumpiness here: clump > mid > flat
    assert(got("clump")._3 > got("mid")._3 &&
      got("mid")._3 > got("flat")._3)
    intercept[IllegalArgumentException](Collocations.termBurstiness(
      docs.toDF("id", "tx"), col("id"), col("tx"), minTotal = 0L))
  }
}
