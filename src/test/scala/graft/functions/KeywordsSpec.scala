package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeywordsSpec extends SparkSpec {

  test("tfidfTopTerms ranks rare-but-frequent terms above ubiquitous ones") {
    import spark.implicits._
    // "common" appears in every doc (df=3), "rare" only in doc 1 with
    // tf=2: rare's idf dominates
    val df = Seq(
      (1L, "rare rare common alpha"),
      (2L, "common beta beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val out = Keywords.tfidfTopTerms(df, col("doc_id"), col("text"), k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getString(1)).toMap
    // doc 1: rare tf=2 df=1 -> 2*(4/2)=4.0; alpha tf=1 df=1 -> 2.0;
    // common tf=1 df=3 -> 1.0
    assert(out((1L, 1)) == "rare")
    assert(out((1L, 2)) == "alpha")
    // doc 2: beta tf=3 df=1 -> 6.0 beats common 1.0
    assert(out((2L, 1)) == "beta")
  }

  test("scores match the (N+1)/(df+1) linear idf exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "x y"),
      (2L, "x z")).toDF("doc_id", "text")
    val out = Keywords.tfidfTopTerms(df, col("doc_id"), col("text"), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // N=2; x: df=2 -> 1*(3/3)=1.0; y,z: df=1 -> 1*(3/2)=1.5
    assert(out((1L, "x")) == 1.0)
    assert(out((1L, "y")) == 1.5)
    assert(out((2L, "z")) == 1.5)
  }

  test("ties rank by term ascending; k caps each doc") {
    import spark.implicits._
    val df = Seq((1L, "b a c d")).toDF("doc_id", "text")
    val out = Keywords.tfidfTopTerms(df, col("doc_id"), col("text"), k = 3)
      .collect().sortBy(_.getInt(3)).map(_.getString(1)).toSeq
    // all four terms tie (tf=1, df=1): alphabetical, capped at 3
    assert(out == Seq("a", "b", "c"))
  }

  test("plan: the tf aggregate is computed ONCE — its exchange is reused " +
      "by the dfreq consumer and the token explode appears once") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // tfidfTopTerms consumes the tf subtree twice (dfreq + the join);
    // only exchange reuse keeps that from doubling the token-explode
    // shuffle. This pins the single-computation property the way
    // TopKByScoreSpec pins partial-agg-below-exchange — a column rename
    // between the two consumers would break subtree identity and
    // silently recompute (the VERDICT r5 hazard).
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq(
        (1L, "p q p"), (2L, "q r"), (3L, "p r r s")).toDF("doc_id", "text")
      val plan = Keywords.tfidfTopTerms(df, col("doc_id"), col("text"))
        .queryExecution.executedPlan
      val reused = plan.collect { case r: ReusedExchangeExec => r }
      assert(reused.nonEmpty,
        s"tf subtree duplicated — no ReusedExchange in plan:\n$plan")
      // exactly 2 generators: ONE token explode + the final posexplode;
      // a recomputed tf subtree would add a second token explode
      val gens = plan.collect { case g: GenerateExec => g }
      assert(gens.size == 2,
        s"expected 2 Generate nodes (token explode + posexplode), " +
          s"got ${gens.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("broadcastVocab=false produces identical output") {
    import spark.implicits._
    val df = Seq(
      (1L, "p q p"), (2L, "q r"), (3L, "p r r s")).toDF("doc_id", "text")
    def run(b: Boolean) = Keywords.tfidfTopTerms(
        df, col("doc_id"), col("text"), k = 2, broadcastVocab = b)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(run(true) == run(false))
  }

  // ---- dictionaryTag -------------------------------------------------

  /** Brute positional model: overlapping occurrences of term in text. */
  private def bruteCount(text: String, term: String): Long =
    (0 to text.length - term.length)
      .count(p => text.regionMatches(p, term, 0, term.length)).toLong

  private def runTag(rows: Seq[(Long, String)], dict: Seq[String])
      : Set[(Long, String, Long)] = {
    import spark.implicits._
    Keywords.dictionaryTag(rows.toDF("doc_id", "text").repartition(3),
        col("doc_id"), col("text"), dict)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
  }

  test("dictionaryTag equals the brute positional model: overlapping " +
      "occurrences ('aa' in 'aaaa' = 3), nested terms each counted, " +
      "substring-of-word matches, zero-match terms absent") {
    val dict = Seq("aa", "aaaa", "ab", "b", "zz")
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "xyx"), (4L, "ba"))
    val got = runTag(docs, dict)
    val want = (for {
      (id, text) <- docs; term <- dict
      n = bruteCount(text, term) if n > 0
    } yield (id, term, n)).toSet
    assert(got == want)
    // the specific adversarial counts, pinned by hand
    assert(got((1L, "aa", 3L)) && got((1L, "aaaa", 1L)))
    assert(got((2L, "ab", 2L)) && got((2L, "b", 2L)))
    assert(!got.exists(_._2 == "zz") && !got.exists(_._1 == 3L))
  }

  test("dictionaryTag matches the model on realistic phrase " +
      "dictionaries (q158's shape) and drops NULL text") {
    val dict = Seq("table", "table table", "fast table", "a")
    val docs = Seq(
      (1L, "fast table table scan a fast"),
      (2L, "a table"),
      (3L, null.asInstanceOf[String]))
    val got = runTag(docs, dict)
    val want = (for {
      (id, text) <- docs if text != null; term <- dict
      n = bruteCount(text, term) if n > 0
    } yield (id, term, n)).toSet
    assert(got == want)
    assert(got((1L, "table table", 1L))) // crosses the nested "table"s
  }

  test("dictionaryTag guards: empty dict, empty term, duplicate term") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Keywords.dictionaryTag(df, col("doc_id"), col("text"), Seq.empty))
    intercept[IllegalArgumentException](
      Keywords.dictionaryTag(df, col("doc_id"), col("text"), Seq("a", "")))
    intercept[IllegalArgumentException](
      Keywords.dictionaryTag(df, col("doc_id"), col("text"),
        Seq("a", "a")))
  }
}
