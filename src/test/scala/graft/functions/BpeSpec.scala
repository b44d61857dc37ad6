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
