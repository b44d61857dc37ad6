package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("train learns the classic merge sequence on a hand-checked corpus") {
    import spark.implicits._
    // word counts: low x3, lower x2, lowest x1
    val df = Seq("low low lower", "low lower lowest").toDF("text")
    val merges = Bpe.train(df, col("text"), numMerges = 4)
    // pair counts round 1: (l,o) = 6, (o,w) = 6, (w,e) = 3, ... —
    // tie at 6 breaks lexicographically: (l,o) first, then (lo,w)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    // round 3: "low" is one token; (low,e) = 3 beats everything else
    assert(merges(2) == (("low", "e")))
    // round 4: lower x2 gives (lowe,r)=2; lowest x1 gives (lowe,s)=1,(s,t)=1
    assert(merges(3) == (("lowe", "r")))
  }

  test("tokenize applies merges by rank; concat reconstructs the word") {
    import spark.implicits._
    val train = Seq("low low lower", "low lower lowest").toDF("text")
    val merges = Bpe.train(train, col("text"), numMerges = 3)
    val docs = Seq((1L, "low lowest slower"), (2L, "")).toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toMap
    // merges: (l,o), (lo,w), (low,e) — so lowest -> lowe|s|t,
    // slower -> s|lowe|r
    assert(out(1L) == Seq("low", "lowe", "s", "t", "s", "lowe", "r"))
    assert(out(2L) == Seq.empty)
    // reconstruction property on arbitrary words
    val words = Seq("lowly", "owl", "zzz", "l")
    words.foreach { w =>
      val toks = Bpe.tokenizeWord(w, merges.zipWithIndex.toMap)
      assert(toks.mkString == w, s"lossy tokenization of $w")
    }
  }

  test("incremental merge loop == the naive recount-every-iteration model") {
    // plain-Scala reference: full pair recount each iteration, the
    // formulation the incremental loop replaced
    def naiveTrain(dict: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
      val words = dict.map(_._1.map(_.toString).toArray).toArray
      val counts = dict.map(_._2).toArray
      val out = Vector.newBuilder[(String, String)]
      var m = 0; var done = false
      while (m < numMerges && !done) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        for (i <- words.indices; j <- 0 until words(i).length - 1)
          pc((words(i)(j), words(i)(j + 1))) =
            pc.getOrElse((words(i)(j), words(i)(j + 1)), 0L) + counts(i)
        if (pc.isEmpty) done = true
        else {
          val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          out += best
          for (i <- words.indices) {
            var k = 0; val w = words(i)
            val buf = scala.collection.mutable.ArrayBuffer[String]()
            while (k < w.length) {
              if (k < w.length - 1 && w(k) == best._1 && w(k + 1) == best._2) {
                buf += w(k) + w(k + 1); k += 2
              } else { buf += w(k); k += 1 }
            }
            words(i) = buf.toArray
          }
          m += 1
        }
      }
      out.result()
    }
    import spark.implicits._
    // adversarial dict: repeated-char runs (overlapping pairs), shared
    // prefixes/suffixes, a singleton — the cases where stale postings
    // or bad retraction deltas would diverge
    val corpus = Seq(
      "aaaa aaa banana banana bandana low lower lowest",
      "aaaa banana bananas abcabcabc low low")
    val df = corpus.toDF("text")
    val dict = corpus.flatMap(_.split(" ")).groupBy(identity).toSeq
      .map { case (w, g) => (w, g.size.toLong) }
      .sortBy { case (w, c) => (-c, w) }
    for (n <- Seq(0, 1, 5, 12, 40)) {
      val inc = Bpe.train(df, col("text"), n)
      val ref = naiveTrain(dict, n)
      assert(inc == ref, s"divergence at numMerges=$n: $inc vs $ref")
    }
  }

  test("zero merges = character tokenization; training is deterministic " +
      "across partitionings") {
    import spark.implicits._
    val docs = Seq((1L, "abc de")).toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, col("doc_id"), col("text"), Seq.empty)
      .collect().map(_.getSeq[String](1).toSeq).head
    assert(out == Seq("a", "b", "c", "d", "e"))

    val corpus = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .limit(200)
    val m1 = Bpe.train(corpus.repartition(2), col("text"), 10)
    val m2 = Bpe.train(corpus.repartition(7), col("text"), 10)
    assert(m1 == m2)
    assert(m1.length == 10)
  }
}
