package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  test("chunk boundaries: overlap, short tail, exact fit, empty doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 toks, size 3 step 2: abc cde efg
      (2L, "a b c"),         // exact single chunk — no redundant tail
      (3L, "a"),             // shorter than size
      (4L, ""),              // no chunks
      (5L, "  x   y  "),     // whitespace runs normalize
      (6L, "a b c d")        // 4 toks: abc + short tail cd (new token d)
    ).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, col("doc_id"), col("text"),
        size = 3, overlap = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, 0L, "a b c", 3L), (1L, 1L, "c d e", 3L),
      (1L, 2L, "e f g", 3L),
      (2L, 0L, "a b c", 3L),
      (3L, 0L, "a", 1L),
      (5L, 0L, "x y", 2L),
      (6L, 0L, "a b c", 3L), (6L, 1L, "c d", 2L)))
  }

  test("zero overlap partitions the tokens exactly") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, col("doc_id"), col("text"), 4, 0)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    assert(out.toSeq == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
  }

  test("kernel == Column mirror on random documents") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 50L).map { i =>
      val n = rnd.nextInt(40)
      (i, (1 to n).map(_ => s"w${rnd.nextInt(20)}").mkString(" "))
    }.toDF("doc_id", "text")
    for ((size, overlap) <- Seq((8, 3), (5, 0), (1, 0), (12, 11))) {
      val kernel = Chunking.chunkTokens(docs, col("doc_id"), col("text"),
          size, overlap)
        .select("doc_id", "chunk_idx", "chunk_text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val mirror = docs.select(col("doc_id"),
          posexplode(Chunking.chunkColumn(col("text"), size, overlap)))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2))).toSet
      assert(kernel == mirror, s"size=$size overlap=$overlap")
    }
  }

  test("parameter validation") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkTokens(df, col("doc_id"), col("text"), 3, 3)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkTokens(df, col("doc_id"), col("text"), 0, 0)
    }
  }

  test("sentenceSpans: substr(text, start, len) reconstructs every " +
      "span byte-for-byte; spans tile the text; edge cases (no " +
      "terminator, terminator runs, trailing newline, empty/null)") {
    import spark.implicits._
    val texts = Seq(
      1L -> "One sentence. Two!  Three? tail without end",
      2L -> "no terminator at all",
      3L -> "...",
      4L -> "ends with newline.\n",
      5L -> "a.b.c",
      6L -> "",
      7L -> null)
    val df = texts.toDF("doc_id", "text")
    val spans = Chunking.sentenceSpans(df, col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val byDoc = spans.groupBy(_._1)
    val textOf = texts.toMap
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    byDoc.foreach { case (id, ss) =>
      val text = textOf(id)
      val ordered = ss.sortBy(_._2)
      // spans tile the text: contiguous from offset 1, total = length
      assert(ordered.head._3 == 1L, s"doc $id starts at 1")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4, s"doc $id gap")
        case _ =>
      }
      assert(ordered.map(_._4).sum == text.length.toLong, s"doc $id total")
      // reconstruction: the hash is of exactly the original slice
      ordered.foreach { case (_, _, start, len, h) =>
        val slice = text.substring((start - 1).toInt, (start - 1 + len).toInt)
        assert(md5Hex(slice) == h, s"doc $id span at $start")
      }
    }
    // shape expectations
    assert(byDoc(1L).length == 4) // three terminated + the tail
    assert(byDoc(2L).length == 1) // terminator-less tail is one span
    assert(byDoc(3L).length == 1) // a pure terminator run is one span
    assert(byDoc(4L).length == 1) // trailing newline folds into the span
    assert(byDoc(5L).length == 3) // "a." "b." "c"
    assert(!byDoc.contains(6L) && !byDoc.contains(7L))
  }
}
