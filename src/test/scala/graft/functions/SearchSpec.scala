package graft.functions

import graft.SparkSpec

class SearchSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "hash join hash table build probe"),
      (2L, "sort merge join spill"),
      (3L, "hash hash hash hash hash"),
      (4L, "scan filter project"),
      (5L, "")
    ).toDF("doc_id", "text")
  }

  /** Reference scorer: the same fixed-point BM25 in plain Scala. */
  private def refScores(
      corpus: Seq[(Long, String)],
      terms: Seq[String]): Map[Long, Long] = {
    val S = Search.Scale
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val n = toks.size.toLong
    val dls = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val sumDl = dls.values.sum
    def divHalfUp(p: Long, q: Long): Long = (2 * p + q) / (2 * q)
    terms.distinct.flatMap { term =>
      val dfT = toks.count(_._2.contains(term)).toLong
      if (dfT == 0) Nil
      else toks.flatMap { case (id, ts) =>
        val tfT = ts.count(_ == term).toLong
        if (tfT == 0) None
        else {
          val idfFp = divHalfUp((2 * n - 2 * dfT + 1) * S, 2 * dfT + 1)
          val den = 20 * tfT * sumDl + 6 * sumDl + 18 * dls(id) * n
          val tfcFp = divHalfUp(44 * tfT * sumDl * S, den)
          Some(id -> divHalfUp(idfFp * tfcFp, S))
        }
      }
    }.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum }
  }

  test("bm25TopK matches the fixed-point reference scorer") {
    val corpus = Seq(
      1L -> "hash join hash table build probe",
      2L -> "sort merge join spill",
      3L -> "hash hash hash hash hash",
      4L -> "scan filter project",
      5L -> "")
    val terms = Seq("hash", "join")
    val want = refScores(corpus, terms)
    val got = Search.bm25TopK(docs, "doc_id", "text",
        Seq(("q", terms)), k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("ranking is (score desc, doc_id asc) with 1-based ranks and k cap") {
    val out = Search.bm25TopK(docs, "doc_id", "text",
        Seq(("q", Seq("join"))), k = 1)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.length == 1 && out.head._3 == 1L)
    // doc 2 has join with a shorter dl than doc 1 -> higher tf component
    assert(out.head._2 == 2L)
  }

  test("absent terms contribute nothing; all-absent query returns no rows") {
    val out = Search.bm25TopK(docs, "doc_id", "text",
      Seq(("q", Seq("zzz_missing"))), k = 5).collect()
    assert(out.isEmpty)
  }

  test("repeated query terms are deduped, not double-counted") {
    def run(ts: Seq[String]) =
      Search.bm25TopK(docs, "doc_id", "text", Seq(("q", ts)), k = 10)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(run(Seq("hash", "hash")) == run(Seq("hash")))
  }

  test("multiple queries rank independently") {
    val out = Search.bm25TopK(docs, "doc_id", "text",
        Seq(("a", Seq("hash")), ("b", Seq("scan"))), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.map(_._1) == Set("a", "b"))
    assert(out.contains(("b", 4L)) && !out.exists(p =>
      p._1 == "b" && p._2 != 4L))
  }
}
