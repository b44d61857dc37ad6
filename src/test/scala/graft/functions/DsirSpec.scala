package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  test("ilog2Fx is exact at powers of two and monotone") {
    for (k <- 0 to 42)
      assert(Dsir.ilog2Fx(1L << k) == k.toLong * Dsir.Scale)
    val samples = Seq(1L, 2L, 3L, 7L, 100L, 4095L, 4097L, 1048577L,
      999999937L, (1L << 43) - 1)
    samples.sliding(2).foreach { case Seq(a, b) =>
      assert(Dsir.ilog2Fx(a) < Dsir.ilog2Fx(b))
    }
  }

  test("ilog2Fx tracks log2 within one truncation per round") {
    val rnd = new scala.util.Random(11)
    (1 to 2000).foreach { _ =>
      val v = 1L + (rnd.nextLong() & ((1L << 43) - 1)) % ((1L << 43) - 1)
      val got = Dsir.ilog2Fx(v).toDouble / Dsir.Scale
      assert(math.abs(got - math.log(v.toDouble) / math.log(2.0)) < 1e-5,
        s"v=$v")
    }
  }

  test("ilog2Fx rejects out-of-domain input") {
    intercept[IllegalArgumentException](Dsir.ilog2Fx(0L))
    intercept[IllegalArgumentException](Dsir.ilog2Fx(1L << 43))
  }

  test("importanceScores matches an in-memory model replay") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta beta gamma", true),
      (2L, "alpha alpha delta", true),
      (3L, "gamma gamma epsilon zeta", false),
      (4L, "beta delta delta zeta zeta", false),
      (5L, "alpha beta gamma delta epsilon", false),
      (6L, "   ", false)
    ).toDF("id", "text", "tgt")
    val B = 64
    val got = Dsir.importanceScores(
      docs, col("id"), col("text"), col("tgt"), buckets = B)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % B
    }
    val rows = Seq(
      (1L, "alpha beta beta gamma", true),
      (2L, "alpha alpha delta", true),
      (3L, "gamma gamma epsilon zeta", false),
      (4L, "beta delta delta zeta zeta", false),
      (5L, "alpha beta gamma delta epsilon", false))
    val toks = rows.map { case (id, t, tgt) =>
      (id, t.trim.split("\\s+").toSeq.map(bucket), tgt)
    }
    val qc = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val pc = toks.filter(_._3).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong)
    val qt = qc.values.sum; val pt = pc.values.sum
    val lam = qc.keys.map { b =>
      b -> ((Dsir.ilog2Fx(pc.getOrElse(b, 0L) + 1) - Dsir.ilog2Fx(pt + B)) -
        (Dsir.ilog2Fx(qc(b) + 1) - Dsir.ilog2Fx(qt + B)))
    }.toMap
    val want = toks.map { case (id, bs, _) =>
      id -> ((bs.size.toLong, bs.map(lam).sum))
    }.toMap
    assert(got == want) // doc 6 (whitespace only) absent from both
  }

  test("resampleTopK is ordered by score then id and the λ join broadcasts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a", true), (2L, "b b b", false),
      (3L, "a b", false), (4L, "a a a", false)
    ).toDF("id", "text", "tgt")
    val top = Dsir.resampleTopK(
      docs, col("id"), col("text"), col("tgt"), k = 3, buckets = 16)
    assert(top.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    val rows = top.collect().map(r => (r.getLong(0), r.getLong(2)))
    // docs 1 and 4 share identical text → identical score; id breaks the tie
    assert(rows.map(_._1).toSeq == Seq(1L, 4L, 3L))
    assert(rows(0)._2 == rows(1)._2)
  }

  test("guards: empty target and bad buckets") {
    import spark.implicits._
    val docs = Seq((1L, "a b", false)).toDF("id", "text", "tgt")
    intercept[IllegalArgumentException] {
      Dsir.importanceScores(docs, col("id"), col("text"), col("tgt"))
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceScores(docs, col("id"), col("text"), col("tgt"),
        buckets = 1)
    }
  }
}
