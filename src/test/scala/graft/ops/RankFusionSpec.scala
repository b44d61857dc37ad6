package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankFusionSpec extends SparkSpec {

  private val S = RankFusion.Scale

  test("fuses two rankings by exact reciprocal-rank contributions, " +
      "missing items contribute nothing, ties break by id") {
    import spark.implicits._
    val a = Seq(("q", 10L, 1L), ("q", 20L, 2L), ("q", 30L, 3L))
      .toDF("qid", "id", "rank")
    val b = Seq(("q", 20L, 1L), ("q", 10L, 2L), ("q", 40L, 3L))
      .toDF("qid", "id", "rank")
    def c(r: Long): Long = S / (60L + r)
    val got = RankFusion.rrfTopK(Seq(a, b), kk = 60, k = 4)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // 10 and 20 both score c(1)+c(2) — exact tie, id asc puts 10 first;
    // 30 and 40 both score c(3), id asc again
    assert(got == Set(
      (10L, c(1) + c(2), 1L), (20L, c(1) + c(2), 2L),
      (30L, c(3), 3L), (40L, c(3), 4L)))
  }

  test("k truncates per query independently") {
    import spark.implicits._
    val a = Seq(("x", 1L, 1L), ("x", 2L, 2L), ("y", 9L, 1L))
      .toDF("qid", "id", "rank")
    val got = RankFusion.rrfTopK(Seq(a), k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("x", 1L), ("y", 9L)))
  }

  test("guards") {
    intercept[IllegalArgumentException](RankFusion.rrfTopK(Seq.empty))
  }

  // ---- rboExact ------------------------------------------------------

  private def rk(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("qid", "id", "rank")
  }

  test("rboExact == a plain-Scala RBO_EXT model on mixed rankings, " +
      "and identical rankings score num == den exactly") {
    val a = rk(
      (1 to 10).map(d => ("q1", 100L + d, d.toLong)) ++
      (1 to 10).map(d => ("q2", 100L + d, d.toLong)): _*)
    // q1: same set, two head items swapped; q2: identical to a
    val b = rk(
      (("q1", 102L, 1L) +: ("q1", 101L, 2L) +:
        (3 to 10).map(d => ("q1", 100L + d, d.toLong))) ++
      (1 to 10).map(d => ("q2", 100L + d, d.toLong)): _*)
    val got = RankFusion.rboExact(a, b, depth = 10)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // plain-Scala model: exact rational RBO_EXT via BigInt
    def model(av: Seq[Long], bv: Seq[Long], depth: Int,
        pN: Int, pD: Int): (BigInt, BigInt) = {
      def lcm(x: BigInt, y: BigInt): BigInt = x / x.gcd(y) * y
      val l = (1 to depth).map(BigInt(_)).reduce(lcm)
      val den = BigInt(pD).pow(depth) * l
      val num = (1 to depth).map { d =>
        val over = av.take(d).toSet.intersect(bv.take(d).toSet).size
        val base = BigInt(pD - pN) * BigInt(pN).pow(d - 1) *
          BigInt(pD).pow(depth - d) * (l / d)
        val c = if (d == depth) base + BigInt(pN).pow(depth) * (l / depth)
                else base
        c * over
      }.sum
      (num, den)
    }
    val aq1 = (1 to 10).map(100L + _)
    val bq1 = Seq(102L, 101L) ++ (3 to 10).map(100L + _)
    val (mn, md) = model(aq1, bq1, 10, 9, 10)
    assert(got("q1") == ((mn.toLong, md.toLong)))
    assert(mn < md, "a head swap must cost agreement")
    assert(got("q2")._1 == got("q2")._2,
      s"identical rankings must score exactly 1, got ${got("q2")}")
  }

  test("rboExact: disjoint rankings score 0; a query present in only " +
      "one ranking still emits (overlap 0); rows past depth ignored") {
    val a = rk((1 to 10).map(d => ("q1", 100L + d, d.toLong)) :+
      ("only_a", 1L, 1L): _*)
    val b = rk((1 to 12).map(d => ("q1", 200L + d, d.toLong)): _*)
    val got = RankFusion.rboExact(a, b, depth = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("q1") == 0L, "disjoint id sets share nothing at any depth")
    assert(got("only_a") == 0L, "one-sided query emits with overlap 0")
    assert(got.size == 2)
  }

  test("rboExact guards: depth and persistence bounds are loud") {
    val a = rk(("q", 1L, 1L))
    intercept[IllegalArgumentException](
      RankFusion.rboExact(a, a, depth = 0))
    intercept[IllegalArgumentException](
      RankFusion.rboExact(a, a, depth = 17))
    intercept[IllegalArgumentException](
      RankFusion.rboExact(a, a, pNum = 10, pDen = 10))
    intercept[IllegalArgumentException](
      RankFusion.rboExact(a, a, pNum = 0, pDen = 10))
  }

  test("ndcgAtK == a plain-Scala model; perfect ranking scores exactly " +
      "2^20; all-zero grades score 0; k truncates") {
    import spark.implicits._
    def disc(i: Int): Long =
      (1L << 40) / graft.functions.Dsir.ilog2Fx(i + 1L)
    // (qid, doc, score, rel)
    val rows = Seq(
      // q1: system order by score desc = ideal order → ndcg = 1
      (1L, 11L, 30L, 3L), (1L, 12L, 20L, 2L), (1L, 13L, 10L, 0L),
      // q2: inverted — best doc ranked last
      (2L, 21L, 30L, 0L), (2L, 22L, 20L, 1L), (2L, 23L, 10L, 3L),
      // q3: all-zero grades
      (3L, 31L, 5L, 0L), (3L, 32L, 4L, 0L),
      // q4: score tie broken by doc asc; more docs than k
      (4L, 41L, 9L, 1L), (4L, 42L, 9L, 2L), (4L, 43L, 1L, 3L),
      (4L, 44L, 0L, 1L))
    val df = rows.toDF("qid", "doc", "s", "rel")
    def run(k: Int): Map[Long, (Long, Long, Long, Long)] =
      RankFusion.ndcgAtK(df, col("qid"), col("doc"), col("s"),
          col("rel"), k)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    def model(k: Int): Map[Long, (Long, Long, Long, Long)] =
      rows.groupBy(_._1).map { case (q, rs) =>
        val sys = rs.sortBy(r => (-r._3, r._2)).take(k)
        val dcg = sys.zipWithIndex.map { case (r, i) =>
          r._4 * disc(i + 1) }.sum
        val ideal = rs.map(_._4).sorted.reverse.take(k)
        val idcg = ideal.zipWithIndex.map { case (g, i) =>
          g * disc(i + 1) }.sum
        val n = if (idcg > 0) dcg * 1048576L / idcg else 0L
        q -> (rs.length.toLong, dcg, idcg, n)
      }
    for (k <- Seq(1, 2, 3, 10)) assert(run(k) == model(k), s"k=$k")
    val at10 = run(10)
    assert(at10(1L)._4 == 1048576L, "perfect ranking must score 2^20")
    assert(at10(3L) == (2L, 0L, 0L, 0L))
    assert(at10(2L)._4 < 1048576L)
    // grade domain guard is loud
    val bad = Seq((1L, 1L, 1L, 1L << 13)).toDF("qid", "doc", "s", "rel")
    intercept[Exception] {
      RankFusion.ndcgAtK(bad, col("qid"), col("doc"), col("s"),
        col("rel"), 5).collect()
    }
  }
}
