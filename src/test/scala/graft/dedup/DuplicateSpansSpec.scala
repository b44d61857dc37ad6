package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** duplicateSpans must equal the brute-force definition: a position p
  * of doc d is "duplicated" iff the k-char substring at p occurs more
  * than maxOccurrences times in the corpus multiset; spans are the
  * merged maximal runs of duplicated windows (ranges touching or
  * overlapping fuse).
  */
class DuplicateSpansSpec extends SparkSpec {

  private def naive(
      docs: Seq[(Long, String)], k: Int,
      maxOcc: Int): Set[(Long, Int, Int)] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- docs; p <- 0 to t.length - k)
      counts(t.substring(p, p + k)) =
        counts.getOrElse(t.substring(p, p + k), 0) + 1
    docs.flatMap { case (id, t) =>
      val dup = (0 to t.length - k)
        .filter(p => counts(t.substring(p, p + k)) > maxOcc)
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      for (p <- dup) {
        val end = p + k - 1
        if (spans.nonEmpty && p <= spans.last._2 + 1)
          spans(spans.length - 1) =
            (spans.last._1, math.max(spans.last._2, end))
        else spans += ((p, end))
      }
      // operator reports 1-based starts
      spans.map { case (s, e) => (id, s + 1, e - s + 1) }
    }.toSet
  }

  private def run(
      docs: Seq[(Long, String)], k: Int,
      maxOcc: Long): Set[(Long, Int, Int)] = {
    import spark.implicits._
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k, maxOcc)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
  }

  test("planted shared block: one merged span per doc, exact offsets") {
    val block = "all work and no play makes jack a dull boy"
    val docs = Seq(
      1L -> s"unique alpha prose here. $block trailing tail one.",
      2L -> s"different beta words. $block other ending.",
      3L -> "entirely novel text with no repetition at all in it xyz")
    val got = run(docs, k = 20, maxOcc = 1)
    assert(got == naive(docs, 20, 1))
    // the >= k duplicated region surfaces as exactly ONE span per doc
    assert(got.count(_._1 == 1L) == 1 && got.count(_._1 == 2L) == 1)
    assert(got.count(_._1 == 3L) == 0)
    val (_, s1, l1) = got.find(_._1 == 1L).get
    assert(docs.head._2.substring(s1 - 1, s1 - 1 + l1).contains(block))
  }

  test("within-doc repetition is reported (Lee et al. semantics)") {
    val docs = Seq(
      7L -> ("intro words. the exact same looping sentence here. " +
        "middle filler. the exact same looping sentence here. outro."))
    val got = run(docs, k = 20, maxOcc = 1)
    assert(got == naive(docs, 20, 1))
    assert(got.size == 2, s"two duplicated regions expected, got $got")
  }

  test("maxOccurrences threshold, short and null docs") {
    import spark.implicits._
    val tri = "thrice repeated block of text!"
    val docs = Seq(
      1L -> s"aa $tri zz",
      2L -> s"bb $tri yy",
      3L -> s"cc $tri xx")
    // at maxOcc=2 a 3x block still trips; at 3 it is normal text
    assert(run(docs, k = 20, maxOcc = 2) == naive(docs, 20, 2))
    assert(run(docs, k = 20, maxOcc = 2).nonEmpty)
    assert(run(docs, k = 20, maxOcc = 3).isEmpty)
    // sub-k and null docs contribute nothing and do not throw
    val withEdge = Seq((10L, Option("tiny")), (11L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(withEdge, col("doc_id"), col("text"), 20)
      .collect().isEmpty)
  }

  private def naiveKeepFirst(
      docs: Seq[(Long, String)], k: Int): Set[(Long, Int, Int)] = {
    // position removable iff its window duplicates AND it is not the
    // corpus-wide first (min (id, pos)) occurrence of that window
    val occ = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Int)]]
    for ((id, t) <- docs; p <- 0 to t.length - k)
      occ.getOrElseUpdate(t.substring(p, p + k),
        scala.collection.mutable.ArrayBuffer.empty) += ((id, p))
    val removable = occ.values.filter(_.size > 1)
      .flatMap(os => os.sortBy(identity).drop(1)).toSet
    docs.flatMap { case (id, t) =>
      val dup = (0 to t.length - k).filter(p => removable((id, p)))
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      for (p <- dup) {
        val end = p + k - 1
        if (spans.nonEmpty && p <= spans.last._2 + 1)
          spans(spans.length - 1) =
            (spans.last._1, math.max(spans.last._2, end))
        else spans += ((p, end))
      }
      spans.map { case (s, e) => (id, s + 1, e - s + 1) }
    }.toSet
  }

  test("keepFirst exempts the corpus-wide first occurrence " +
      "(min (id, pos)) — the paper's all-but-one removal semantics") {
    import spark.implicits._
    val block = "all work and no play makes jack a dull boy"
    val docs = Seq(
      5L -> s"later doc yet FIRST span copy here: $block tail.",
      9L -> s"second copy lives here: $block and more.",
      2L -> "this doc is unique filler prose with nothing repeated qq")
    val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = 20, keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == naiveKeepFirst(docs, 20))
    // min id (5) keeps its copy; only doc 9 is spanned
    assert(got.map(_._1) == Set(9L))
    // within-doc: the first occurrence survives, the second is spanned
    val rep = Seq(3L -> ("alpha unique lead-in. the repeated passage body " +
      "x. middle. the repeated passage body x. coda"))
    val got2 = Dedup.duplicateSpans(rep.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = 20, keepFirst = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got2 == naiveKeepFirst(rep, 20))
    assert(got2.size == 1)
  }

  test("spliceSpans cuts spans and passes span-free docs through " +
      "byte-identical; keepFirst splice leaves exactly one copy") {
    import spark.implicits._
    val block = "all work and no play makes jack a dull boy"
    // surrounding prose is distinct INCLUDING the characters adjacent
    // to the block — a shared boundary char would (correctly) extend
    // the duplicated region beyond the block
    val docs = Seq(
      1L -> s"alphaone intro $block ending-one.",
      2L -> s"betatwo prelude $block closing-two.",
      3L -> s"gammathree lead $block finish-three.",
      4L -> "delta doc with entirely novel prose and no duplication zz")
    val df = docs.toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, col("doc_id"), col("text"),
      k = 20, keepFirst = true)
    val clean = Dedup.spliceSpans(df, col("doc_id"), col("text"), spans)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // doc 1 (min id) intact; span-free doc 4 byte-identical
    assert(clean(1L) == docs.head._2)
    assert(clean(4L) == docs(3)._2)
    // the block survives exactly once corpus-wide
    assert(clean.values.count(_.contains(block)) == 1)
    // cut docs keep their unique prose on both sides of the cut
    // (the shared " block " region including both spaces is spanned)
    assert(clean(2L) == "betatwo preludeclosing-two.", clean(2L))
    // audit-mode spans (keepFirst=false) cut EVERY copy
    val cleanAll = Dedup.spliceSpans(df, col("doc_id"), col("text"),
        Dedup.duplicateSpans(df, col("doc_id"), col("text"), k = 20))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cleanAll.values.count(_.contains(block)) == 0)
    // splice is exact: reconstruct doc 2 by hand from its span
    val s2 = spans.filter(col("id") === 2L).collect()
      .map(r => (r.getInt(1), r.getInt(2)))
    val expected2 = s2.sortBy(_._1).foldLeft((docs(1)._2, 0)) {
      case ((acc, cut), (st, ln)) =>
        (acc.substring(0, st - 1 - cut) + acc.substring(st - 1 - cut + ln),
          cut + ln)
    }._1
    assert(clean(2L) == expected2)
  }

  test("contaminationSpans: exact quote offsets vs a test set, clean " +
      "docs silent, broadcast semi-join pinned in the plan") {
    import spark.implicits._
    val quote = "to be or not to be that is the question"
    val test = Seq(100L -> s"benchmark item alpha. $quote more.").toDF(
      "tid", "ttext")
    val corpus = Seq(
      1L -> s"xxone preface, quoting: $quote closing-one.",
      2L -> "novel text sharing not a single window with the benchmark",
      3L -> s"yythree cites $quote mid-doc, then continues freely zz")
      .toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(corpus, col("doc_id"),
      col("text"), test, col("ttext"), k = 20)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // naive: position contaminated iff its 20-window occurs in test
    val testGrams = {
      val t = s"benchmark item alpha. $quote more."
      (0 to t.length - 20).map(p => t.substring(p, p + 20)).toSet
    }
    val expected = Seq(
      1L -> s"xxone preface, quoting: $quote closing-one.",
      3L -> s"yythree cites $quote mid-doc, then continues freely zz")
      .flatMap { case (id, t) =>
        val dup = (0 to t.length - 20)
          .filter(p => testGrams(t.substring(p, p + 20)))
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        for (p <- dup) {
          val e = p + 19
          if (spans.nonEmpty && p <= spans.last._2 + 1)
            spans(spans.length - 1) =
              (spans.last._1, math.max(spans.last._2, e))
          else spans += ((p, e))
        }
        spans.map { case (s, e) => (id, s + 1, e - s + 1) }
      }.toSet
    assert(got == expected && got.map(_._1) == Set(1L, 3L))
    // each contaminated doc: the quote is inside its single span
    for ((id, st, ln) <- got) {
      val t = if (id == 1L) s"xxone preface, quoting: $quote closing-one."
              else s"yythree cites $quote mid-doc, then continues freely zz"
      assert(t.substring(st - 1, st - 1 + ln).contains(quote))
    }
    // the test-gram set must BUILD a broadcast semi-join — the corpus
    // side must not exchange on gram hashes
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi:\n$plan")
  }

  test("fixture corpus equals the brute-force reference") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    import spark.implicits._
    val got = run(docs, k = 24, maxOcc = 1)
    assert(got == naive(docs, 24, 1))
    assert(got.nonEmpty, "fixture's planted duplicates should surface")
  }
}
