package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("kmvDistinct is exact below k and within KMV error above it") {
    import spark.implicits._
    // 50 distinct values, k=64: sketch holds everything -> exact
    val small = (1 to 200).map(i => s"v${i % 50}").toDF("x")
    val (n1, e1) = Sketch.kmvDistinct(small, col("x"), k = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    assert(n1 == 50L && e1 == 50.0)

    // 5000 distinct values, k=256: estimation arm; standard error
    // ~1/sqrt(k-2) ~ 6%, assert a generous 4-sigma band
    val big = (1 to 5000).map(i => s"value-$i").toDF("x")
    val (n2, e2) = Sketch.kmvDistinct(big, col("x"), k = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    assert(n2 == 256L)
    assert(math.abs(e2 - 5000) / 5000.0 < 0.25, s"estimate off: $e2")
  }

  test("kmvDistinct is bit-identical across partitionings and " +
      "insensitive to duplication") {
    import spark.implicits._
    val base = (1 to 3000).map(i => s"d-${i % 1000}")
    def run(parts: Int, dup: Int): (Long, Double) =
      Sketch.kmvDistinct(
          (1 to dup).flatMap(_ => base).toDF("x").repartition(parts),
          col("x"), k = 128)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    val a = run(2, 1)
    assert(a == run(11, 1))   // partitioning
    assert(a == run(5, 3))    // duplication: same distinct set, same sketch
  }

  test("heavyHitters returns exactly the >= minCount set with exact " +
      "counts, regardless of sketch size") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // zipfian-ish: value v-i appears ~ 3000/i times
    val rows = (1 to 60).flatMap(i => Seq.fill(3000 / i)(s"v-$i")) ++
      (1 to 2000).map(i => s"tail-${rnd.nextInt(1500)}")
    val df = rnd.shuffle(rows).toDF("x").repartition(7)
    val want = rows.groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 >= 100L).toMap
    // a deliberately TINY sketch (many collisions): more false
    // candidates shuffle, but the exact verify keeps output identical
    for (w <- Seq(16, 8192)) {
      val got = Sketch.heavyHitters(df, col("x"), 100L, width = w)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"width=$w")
    }
  }

  test("heavyHitters is insensitive to partitioning and handles " +
      "empty/threshold edge cases") {
    import spark.implicits._
    val rows = Seq.fill(10)("a") ++ Seq.fill(9)("b") ++ Seq("c")
    def run(parts: Int) =
      Sketch.heavyHitters(rows.toDF("x").repartition(parts), col("x"), 10L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(1) == Set(("a", 10L)))   // b at 9 is below, c far below
    assert(run(1) == run(6))
    val empty = Sketch.heavyHitters(
      Seq.empty[String].toDF("x"), col("x"), 1L).collect()
    assert(empty.isEmpty)
  }

  test("kmvDistinctByGroup: per-group arms match the global sketch " +
      "run on each group alone") {
    import spark.implicits._
    // group a: 20 distinct (exact arm at k=64); b: 500 (estimate arm)
    val rows = (1 to 200).map(i => ("a", s"v${i % 20}")) ++
      (1 to 1000).map(i => ("b", s"w${i % 500}"))
    val df = rows.toDF("g", "x").repartition(5)
    val grouped = Sketch.kmvDistinctByGroup(df, Seq("g"), col("x"), k = 64)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for (g <- Seq("a", "b")) {
      val solo = Sketch.kmvDistinct(df.filter(col("g") === g), col("x"),
        k = 64).collect().map(r => (r.getLong(0), r.getDouble(1))).head
      assert(grouped(g) == solo, s"group $g")
    }
    assert(grouped("a") == ((20L, 20.0)))
    assert(math.abs(grouped("b")._2 - 500) / 500.0 < 0.4)
  }

  test("topKByGroup: exact counts, deterministic tie-break, k cap") {
    import spark.implicits._
    val rows = Seq.fill(5)(("g1", "b")) ++ Seq.fill(5)(("g1", "a")) ++
      Seq.fill(2)(("g1", "c")) ++ Seq.fill(9)(("g2", "z"))
    val out = Sketch.topKByGroup(rows.toDF("g", "x").repartition(4),
        Seq("g"), col("x"), k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // g1: a and b tie at 5 -> value-ascending puts a first; c cut by k
    assert(out == Set(
      ("g1", "a", 5L, 1L), ("g1", "b", 5L, 2L), ("g2", "z", 9L, 1L)))
  }

  test("degenerate inputs") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sketch.kmvDistinct(Seq("a").toDF("x"), col("x"), k = 1)
    }
    val empty = Seq.empty[String].toDF("x")
    val r = Sketch.kmvDistinct(empty, col("x"), k = 8).collect().head
    assert(r.getLong(0) == 0L && r.getDouble(1) == 0.0)
  }

  test("kmvSetOps is exact below k and matches the KMV model when " +
      "saturated") {
    import spark.implicits._
    // unsaturated: sketches hold everything, every figure exact
    val a = (1 to 30).map(_.toString).toDF("x")
    val b = (20 to 50).map(_.toString).toDF("x")
    val ex = Sketch.kmvSetOps(a, col("x"), b, col("x"), k = 256)
      .collect().head
    assert(ex.getLong(0) == 30 && ex.getLong(1) == 31)
    assert(ex.getDouble(2) == 30.0 && ex.getDouble(3) == 31.0)
    assert(ex.getLong(4) == 11) // 20..30 shared
    assert(ex.getDouble(5) == 50.0 && ex.getDouble(6) == 11.0)

    // saturated at k=64: replay the estimator with the same md5 hashes
    def u(v: String): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$v:kmv".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16) / 4503599627370496.0
    }
    val va = (1 to 500).map(_.toString); val vb = (250 to 750).map(_.toString)
    val k = 64
    def sk(vs: Seq[String]) = vs.map(v => (u(v), v)).sorted.take(k)
    val (sa, sb) = (sk(va), sk(vb))
    val uni = (sa ++ sb).distinct.sorted.take(k)
    val setA = sa.map(_._2).toSet; val setB = sb.map(_._2).toSet
    val shared = uni.count(x => setA(x._2) && setB(x._2))
    val estU = (k - 1).toDouble / uni.last._1
    val got = Sketch.kmvSetOps(
      va.toDF("x"), col("x"), vb.toDF("x"), col("x"), k = k)
      .collect().head
    assert(got.getLong(4) == shared)
    assert(got.getDouble(5) == estU)
    assert(got.getDouble(6) == shared.toDouble / k * estU)
    // sanity: estimates within ~25% of truth (500, 751, 251) at k=64
    assert(math.abs(got.getDouble(2) - 500) < 125)
    assert(math.abs(got.getDouble(5) - 751) < 190)
  }
}
