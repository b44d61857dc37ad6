package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property coverage for concat-and-chop packing: model equivalence vs a
  * sequential packer across random corpora AND random sequence lengths
  * (the fixed-parameter case lives in PrefixSpec).
  */
class PackSequencesPropSpec extends SparkSpec {

  private def sequentialPack(
      docs: Seq[(Long, Int)], L: Long): Seq[(Long, Long, Long, Long, Long)] = {
    var pos = 0L
    docs.sortBy(_._1).flatMap { case (id, tok) =>
      val spans = scala.collection.mutable.Buffer
        .empty[(Long, Long, Long, Long, Long)]
      var off = 0L
      while (off < tok) {
        val seq = (pos + off) / L
        val take = math.min(tok - off, (seq + 1) * L - (pos + off))
        spans += ((id, seq, off, off + take, (pos + off) % L))
        off += take
      }
      pos += tok
      spans
    }
  }

  test("packSequences == sequential packer for random corpora and " +
      "sequence lengths; spans tile each document exactly") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      l <- Gen.choose(1L, 50L)
      seed <- Gen.choose(0, 10000)
    } yield (n, l, seed)
    val prop = forAll(gen) { case (n, l, seed) =>
      val rng = new scala.util.Random(seed)
      val docs = (1L to n.toLong).map(i => (i, rng.nextInt(30)))
      val out = Prefix.packSequences(
          rng.shuffle(docs).toDF("id", "tok").repartition(5), "id", "tok", l)
        .select("id", "seq_id", "tok_from", "tok_to", "seq_off")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(t => (t._1, t._2)).toSeq
      val tiled = docs.filter(_._2 > 0).forall { case (id, tok) =>
        val spans = out.filter(_._1 == id).sortBy(_._3)
        spans.head._3 == 0L && spans.last._4 == tok.toLong &&
          spans.sliding(2).forall {
            case Seq(a, b) => a._4 == b._3
            case _ => true
          }
      }
      out == sequentialPack(docs, l) && tiled
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
