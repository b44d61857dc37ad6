package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Line-level exact dedup (Dedup.stripDuplicateLines): the C4-style
  * boilerplate-removal step. Covers the keep/strip boundary at
  * maxOccurrences, order-preserving reassembly, blank-line structure
  * preservation, and the doc whose every line is stripped.
  */
class LineDedupSpec extends SparkSpec {

  private def run(
      docs: Seq[(Long, String)],
      maxOccurrences: Long = 1,
      minLineChars: Int = 1): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.stripDuplicateLines(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        maxOccurrences = maxOccurrences, minLineChars = minLineChars)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("strips lines over the occurrence threshold, keeps those at it " +
      "(boundary), preserves order") {
    // "dup" appears 2x (> 1, stripped everywhere); "solo a"/"solo b"
    // once each (kept); "edge" exactly once -> kept at threshold 1
    val out = run(Seq(
      (1L, "solo a\ndup\nedge"),
      (2L, "dup\nsolo b")))
    assert(out(1L) == ((3L, 2L, "solo a\nedge")))
    assert(out(2L) == ((2L, 1L, "solo b")))
  }

  test("threshold is corpus-wide and counts within-doc repeats; " +
      "maxOccurrences=2 keeps a twice-occurring line") {
    // "twice" occurs twice IN ONE doc: at maxOccurrences=2 kept, at 1
    // stripped — within-doc occurrences count toward the corpus total
    val docs = Seq((1L, "twice\nmiddle\ntwice"), (2L, "other"))
    val loose = run(docs, maxOccurrences = 2)
    assert(loose(1L) == ((3L, 3L, "twice\nmiddle\ntwice")))
    val strict = run(docs, maxOccurrences = 1)
    assert(strict(1L) == ((3L, 1L, "middle")))
  }

  test("normalization folds case and surrounding spaces, but the KEPT " +
      "text is the original line") {
    // "  Header " and "header" normalize identically -> both stripped
    val out = run(Seq(
      (1L, "  Header \nbody one"),
      (2L, "header\nbody two")))
    assert(out(1L) == ((2L, 1L, "body one")))
    assert(out(2L) == ((2L, 1L, "body two")))
  }

  test("a doc whose every line is boilerplate survives with empty text") {
    val out = run(Seq(
      (1L, "nav\nfooter"),
      (2L, "nav\nfooter"),
      (3L, "real content")))
    assert(out(1L) == ((2L, 0L, "")))
    assert(out(2L) == ((2L, 0L, "")))
    assert(out(3L) == ((1L, 1L, "real content")))
    assert(out.size == 3) // emptied docs are NOT dropped
  }

  test("blank lines are structure: never counted, always kept") {
    // the empty line occurs 3x corpus-wide but survives everywhere
    val out = run(Seq(
      (1L, "a\n\nb"),
      (2L, "c\n\nd\n\ne")))
    assert(out(1L) == ((3L, 3L, "a\n\nb")))
    assert(out(2L) == ((5L, 5L, "c\n\nd\n\ne")))
  }

  test("null text behaves as one empty (kept) line") {
    import spark.implicits._
    val df = Seq((1L, Option("x\ny")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Dedup.stripDuplicateLines(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3))))
      .toMap
    assert(out(2L) == ((1L, "")))
    assert(out(1L) == ((2L, "x\ny")))
  }

  test("custom separator splits and rejoins literally (regex metachars " +
      "quoted)") {
    val out = run2sep(Seq((1L, "a|dup|b"), (2L, "dup|c")), "|")
    assert(out(1L) == ((3L, 2L, "a|b")))
    assert(out(2L) == ((2L, 1L, "c")))
  }

  private def run2sep(docs: Seq[(Long, String)], sep: String)
      : Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.stripDuplicateLines(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        lineSep = sep)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("the count pass shuffles hashes with map-side partial " +
      "aggregation (plan shape)") {
    import spark.implicits._
    val df = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = Dedup.stripDuplicateLines(df, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    // partial count below the exchange: the count pass must not shuffle
    // raw lines
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"no map-side partial aggregation in count pass:\n$plan")
  }

  test("scoped (per-source) counting: a line repeated within one scope " +
      "strips there only; cross-scope repeats stay under a per-scope " +
      "threshold a global count would breach") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "nav\nbody one"),
      (2L, "s1", "nav\nbody two"), //   "nav" 2x in s1 -> stripped in s1
      (3L, "s2", "nav\nbody three"), // "nav" 1x in s2 -> KEPT there
      (4L, "s2", "legal\nbody four"),
      (5L, "s3", "legal\nbody five")) // "legal" 1x per scope -> kept,
      //                                 though globally 2x (> 1)
      .toDF("doc_id", "source", "text")
    val out = Dedup.stripDuplicateLines(
        docs, col("doc_id"), col("text"), maxOccurrences = 1,
        scopeCol = Some(col("source")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, "body one")))
    assert(out(2L) == ((1L, "body two")))
    assert(out(3L) == ((2L, "nav\nbody three")))
    assert(out(4L) == ((2L, "legal\nbody four")))
    assert(out(5L) == ((2L, "legal\nbody five")))
    // and the same corpus under GLOBAL counting strips both
    val global = Dedup.stripDuplicateLines(
        docs, col("doc_id"), col("text"), maxOccurrences = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(global(3L) == "body three" && global(5L) == "body five")
    // null scopes form their own group: two null-scope "nav"s strip
    val nulls = Dedup.stripDuplicateLines(
        Seq((6L, null: String, "nav\nx"), (7L, null: String, "nav\ny"))
          .toDF("doc_id", "source", "text"),
        col("doc_id"), col("text"), maxOccurrences = 1,
        scopeCol = Some(col("source")))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(nulls == Map(6L -> "x", 7L -> "y"))
  }
}
