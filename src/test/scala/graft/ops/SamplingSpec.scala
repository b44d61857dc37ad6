package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-addressed splitting: membership must be a pure function of
  * (id, salt) — the property `randomSplit` lacks and the reason this
  * operator exists.
  */
class SamplingSpec extends SparkSpec {

  private def ids = spark.range(5000).select(col("id"))

  test("splitLabel is deterministic and unaffected by partitioning") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("s", Sampling.splitLabel(col("id"), "seed1", fr))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = labels(ids)
    val b = labels(ids.repartition(7)) // different physical layout
    assert(a == b)
  }

  test("splitLabel partitions completely with roughly the asked fractions") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = ids
      .withColumn("s", Sampling.splitLabel(col("id"), "seed1", fr))
      .groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000) // complete: every row labeled
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(counts("val") / 5000.0 - 0.1) < 0.03)
  }

  test("a different salt draws an independent split") {
    val fr = Seq("a" -> 0.5, "b" -> 0.5)
    val both = ids
      .withColumn("s1", Sampling.splitLabel(col("id"), "saltA", fr))
      .withColumn("s2", Sampling.splitLabel(col("id"), "saltB", fr))
    val agree = both.filter(col("s1") === col("s2")).count()
    // independent 50/50 splits agree on ~half the ids, not all or none
    assert(agree > 2000 && agree < 3000, s"agreement $agree of 5000")
  }

  test("sampleByHash keeps a stable subset at the asked rate; " +
      "smaller samples nest inside larger ones") {
    val s10 = Sampling.sampleByHash(ids.toDF(), col("id"), "s", 0.1)
      .collect().map(_.getLong(0)).toSet
    val s20 = Sampling.sampleByHash(ids.toDF(), col("id"), "s", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(s10.size / 5000.0 - 0.1) < 0.02)
    assert(s10.subsetOf(s20)) // monotone in fraction: pilot ⊂ full sample
    assert(Sampling.sampleByHash(ids.toDF(), col("id"), "s", 0.0).count() == 0)
    assert(Sampling.sampleByHash(ids.toDF(), col("id"), "s", 1.0).count() == 5000)
  }

  test("mixtureSample keeps each source at its own rate and nests " +
      "within sampleByHash membership") {
    import spark.implicits._
    val df = (0L until 4000L).map(i => (i, s"src${i % 4}"))
      .toDF("id", "source")
    val mixed = Sampling.mixtureSample(df, col("id"), "m", col("source"),
      Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 1.0),
      defaultFraction = 0.25)
    val bySrc = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0"))            // dropped entirely
    assert(bySrc("src2") == 1000L)             // kept entirely
    assert(math.abs(bySrc("src1") / 1000.0 - 0.5) < 0.06)
    assert(math.abs(bySrc("src3") / 1000.0 - 0.25) < 0.06)
    // same salt => the mixture's src1 rows are exactly the 0.5-rate
    // hash sample of src1 (nested membership)
    val direct = Sampling.sampleByHash(
        df.filter(col("source") === "src1"), col("id"), "m", 0.5)
      .collect().map(_.getLong(0)).toSet
    val mixedSrc1 = mixed.filter(col("source") === "src1")
      .collect().map(_.getLong(0)).toSet
    assert(mixedSrc1 == direct)
  }

  test("stratifiedSample: exactly n lowest-hash ids per stratum, " +
      "stable across partitionings; small strata return everything") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (s"src${i % 3}", i)) ++
      Seq(("tiny", 1000L), ("tiny", 1001L))
    val data = df.toDF("source", "doc_id")
    def run(parts: Int) = Sampling.stratifiedSample(
        data.repartition(parts), col("source"), col("doc_id"), "s1", n = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val a = run(2)
    assert(a == run(7)) // pure function of (id, salt)
    // per-stratum counts: full strata give exactly n, tiny gives all 2
    val byStratum = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byStratum == Map(
      "src0" -> 10, "src1" -> 10, "src2" -> 10, "tiny" -> 2))
    // rank order = unitHash asc within each stratum (plain-Scala model)
    def uh(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:s1".getBytes("UTF-8"))
        .map(b => "%02x".format(b & 0xff)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
    }
    val strata = (1L to 300L).map(i => (s"src${i % 3}", i)) ++
      Seq(("tiny", 1000L), ("tiny", 1001L))
    val expected = strata.groupBy(_._1)
      .flatMap { case (s, is) =>
        is.map(_._2).sortBy(i => (uh(i), i)).take(10).zipWithIndex
          .map { case (i, r) => (s, i, r + 1) }
      }.toSet
    assert(a == expected)
  }

  test("epochRepeat matches the floor+fractional-hash model, nests " +
      "with sampleByHash below e=1, and ignores partitioning") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, if (i % 2 == 0) 2.3 else 0.4))
    val data = rows.toDF("doc_id", "e")
    def uh(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:ep".getBytes("UTF-8"))
        .map(b => "%02x".format(b & 0xff)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
    }
    val expected = rows.flatMap { case (i, e) =>
      val c = e.toInt + (if (uh(i) < e - e.toInt) 1 else 0)
      (1 to c).map(k => (i, k.toLong))
    }.toSet
    def run(parts: Int) = Sampling.epochRepeat(
        data.repartition(parts), col("doc_id"), "ep", col("e"))
      .select("doc_id", "copy_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run(2)
    assert(got == expected && got == run(7))
    // e=2.3 rows appear 2 or 3 times; e=0.4 rows 0 or 1 — and the
    // sub-1 arm is EXACTLY sampleByHash's membership (same hash+salt)
    val sub = Sampling.sampleByHash(
        data.filter(col("e") === 0.4), col("doc_id"), "ep", 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.filter(_._1 % 2 == 1).map(_._1) == sub)
    // fan-out guard fails loudly, not silently
    val boom = intercept[Exception](Sampling.epochRepeat(
      data, col("doc_id"), "ep", col("e") * 1000).collect())
    assert(boom.getMessage.contains("epochs outside"))
  }

  test("budgetSample matches the sequential hash-order model, cuts " +
      "inclusively, and is partitioning-invariant") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val n = 400
    val rows = (0L until n).map(i => (i, (i * 7 % 23) + 1)) // weights 1..23
    val budget = 900L
    // model: sort by (md5("id:s") ++ ":" ++ id), keep while cum <= budget
    val model = rows
      .map { case (id, w) => (md5hex(s"$id:s") + ":" + id, id, w) }
      .sortBy(_._1)
      .scanLeft(("", -1L, 0L, 0L)) { case ((_, _, _, cum), (k, id, w)) =>
        (k, id, w, cum + w) }
      .drop(1)
      .takeWhile(_._4 <= budget)
      .map(t => (t._2, t._3, t._4)).toSet
    assert(model.nonEmpty && model.size < n) // the cut actually bites
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.budgetSample(df, col("id"), col("w"), budget, salt = "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    import spark.implicits._
    val df = rows.toDF("id", "w")
    assert(run(df) == model)
    assert(run(df.repartition(13)) == model) // layout-proof
    // inclusive cut: total of kept == the largest cum <= budget
    assert(model.map(_._3).max <= budget)
    // zero budget keeps nothing (weights are all >= 1 here)
    assert(run(df.limit(50)).nonEmpty)
    assert(Sampling.budgetSample(df, col("id"), col("w"), 0L, "s")
      .count() == 0L)
  }

  test("degenerate configurations are rejected") {
    assertThrows[IllegalArgumentException](
      Sampling.splitLabel(col("id"), "s", Seq.empty))
    assertThrows[IllegalArgumentException](
      Sampling.splitLabel(col("id"), "s", Seq("a" -> 0.9, "b" -> 0.3)))
    assertThrows[IllegalArgumentException](
      Sampling.sampleByHash(ids.toDF(), col("id"), "s", 1.5))
    assertThrows[IllegalArgumentException](
      Sampling.weightedSample(ids.toDF(), col("id"), col("id"), 0))
  }

  test("weightedSample keys match the A-Res fixed-point model and " +
      "ignore partitioning") {
    import spark.implicits._
    import graft.functions.Dsir
    val rows = (1L to 200L).map(i => (i, if (i <= 100) 10000L else 1L))
    def model(i: Long, w: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:wsample".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val v = java.lang.Long.parseLong(hex, 16)
      ((32L * Dsir.Scale - Dsir.ilog2Fx(v + 1)) << 20) / w
    }
    val expected = rows.map { case (i, w) => (i, w, model(i, w)) }
      .sortBy(t => (t._3, t._1)).take(50)
    for (parts <- Seq(1, 7)) {
      val got = Sampling.weightedSample(
        rows.toDF("id", "w").repartition(parts), col("id"), col("w"), 50)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == expected, s"parts=$parts")
    }
    // bias sanity: 100 heavy ids (10000x weight) dominate the sample
    assert(expected.count(_._2 == 10000L) >= 45)
  }

  test("weightedSample's top-k runs as TakeOrderedAndProject — " +
      "per-partition heaps, not a global sort") {
    import spark.implicits._
    val plan = Sampling.weightedSample(
      (1L to 100L).map(i => (i, i)).toDF("id", "w"),
      col("id"), col("w"), 5)
      .queryExecution.executedPlan
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected TakeOrderedAndProject:\n$plan")
    assert(plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, s"global sort should not appear:\n$plan")
  }

  test("capPerGroup: brute-model equality, null score/group handling, " +
      "partitioning invariance, and no rank window in the plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map { i =>
      val g = if (i % 17 == 0) null else s"g${i % 7}"
      val s: java.lang.Double =
        if (i % 23 == 0) null else rnd.nextInt(40).toDouble
      (i, g, s)
    }
    // brute model: per group, (score desc, id asc), null scores excluded
    val expected = rows
      .filter(_._3 != null)
      .groupBy(_._2)
      .flatMap { case (g, members) =>
        members.sortBy(t => (-t._3.doubleValue, t._1)).take(3)
          .zipWithIndex.map { case ((id, _, _), i) =>
            (g, id, i + 1L, members.size.toLong) }
      }.toSet
    // n_group counts ALL rows of the group (incl. null-score ones)
    val expectedN = rows.groupBy(_._2).map { case (g, m) => g -> m.size.toLong }
    val adjusted = expected.map { case (g, id, r, _) => (g, id, r, expectedN(g)) }
    for (parts <- Seq(1, 5)) {
      val df = rows.toDF("id", "g", "s").repartition(parts)
      val got = Sampling.capPerGroup(df, col("g"), col("id"), col("s"), 3)
        .select(col("g"), col("id"), col("rank"), col("n_group"))
        .collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0),
          r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == adjusted, s"parts=$parts")
    }
    // the plan ranks via the bounded aggregate, never a window
    val plan = Sampling.capPerGroup(
      rows.toDF("id", "g", "s"), col("g"), col("id"), col("s"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("topk_by"), plan)
  }

  test("leakageSafeSplit lands every member of a dup cluster on one " +
      "side and leaves singletons on their own split") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"doc$i")).toDF("doc_id", "txt")
    // clusters {1,2,3} (transitive via 1-2, 2-3) and {10, 11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val out = Sampling.leakageSafeSplit(
      docs, col("doc_id"), pairs, "lk1",
      Seq("train" -> 0.5, "test" -> 0.5))
      .select(col("doc_id"), col("split_key"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val bySplit = out.map(t => t._1 -> t._3).toMap
    assert(out.length == 40)
    assert(Set(bySplit(1L), bySplit(2L), bySplit(3L)).size == 1)
    assert(bySplit(10L) == bySplit(11L))
    // cluster members share the representative key = component min
    assert(out.filter(t => Set(1L, 2L, 3L)(t._1)).map(_._2).toSet
      == Set(1L))
    // singletons split on their own id — exactly splitLabel's answer
    val solo = out.filter(t => t._1 > 11L)
    val expected = docs.filter(col("doc_id") > 11L)
      .withColumn("s", Sampling.splitLabel(col("doc_id"), "lk1",
        Seq("train" -> 0.5, "test" -> 0.5)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(solo.forall(t => expected(t._1) == t._3))
    // both labels actually occur (not a degenerate hash fixture)
    assert(out.map(_._3).toSet == Set("train", "test"))
  }

  test("weightedSample drops null and non-positive weights") {
    import spark.implicits._
    val df = Seq((1L, java.lang.Long.valueOf(5L)),
      (2L, java.lang.Long.valueOf(0L)), (3L, null: java.lang.Long))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, col("id"), col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("powEighths: dyadic exponents from correctly-rounded sqrt only") {
    assert(Sampling.powEighths(81, 8) == 81.0)
    assert(Sampling.powEighths(81, 4) == 9.0)
    assert(Sampling.powEighths(256, 2) == 4.0)
    assert(Sampling.powEighths(256, 6) == 64.0) // r1*r2 = 16*4
    assert(Sampling.powEighths(65536, 1) == 4.0)
    assert(Sampling.powEighths(7, 0) == 1.0)
    // strictly monotone in the exponent for n > 1
    val v = (0 to 8).map(Sampling.powEighths(1000, _))
    assert(v == v.sorted && v.distinct == v)
  }

  test("temperatureMixture matches the exact integer-rational model, " +
      "up-weights tail groups, and ignores partitioning") {
    import spark.implicits._
    // skewed corpus: a=16 rows, b=4, c=1
    val rows = (1L to 16L).map(i => (i, "a")) ++
      (17L to 20L).map(i => (i, "b")) ++ Seq((21L, "c"))
    val data = rows.toDF("doc_id", "g")
    // reference model: the operator's documented math, recomputed here
    val counts = Map("a" -> 16L, "b" -> 4L, "c" -> 1L)
    val w = counts.map { case (g, n) =>
      g -> BigInt(math.floor(math.sqrt(n.toDouble) * 65536.0).toLong) }
    val s = w.values.sum
    def h52(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:tm".getBytes("UTF-8"))
        .map(b => "%02x".format(b & 0xff)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    val B = 30L
    val expected = rows.flatMap { case (i, g) =>
      val num = BigInt(B) * w(g); val den = s * counts(g)
      val copies = (num / den).toLong +
        (if (BigInt(h52(i)) < ((num % den) << 52) / den) 1 else 0)
      (1L to copies).map(k => (i, g, k))
    }.toSet
    def run(parts: Int) = Sampling.temperatureMixture(
        data.repartition(parts), col("doc_id"), "tm", col("g"), B,
        alphaEighths = 4)
      .select("doc_id", "g", "copy_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val got = run(2)
    assert(got == expected && got == run(5))
    // temperature < 1 moves share from head to tail: per-ROW copy rate
    // of the 1-row group exceeds the 16-row group's
    val perRow = got.groupBy(_._2).map { case (g, rs) =>
      g -> rs.size.toDouble / counts(g) }
    assert(perRow("c") > perRow("a"))
  }

  test("temperatureMixture alpha=8 is the natural distribution: exactly " +
      "targetRows/N copies of every row when integral") {
    import spark.implicits._
    val data = (1L to 10L).map(i => (i, if (i <= 7) "x" else "y"))
      .toDF("doc_id", "g")
    val out = Sampling.temperatureMixture(data, col("doc_id"), "nat",
        col("g"), targetRows = 30, alphaEighths = 8)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10 && out.values.forall(_ == 3L))
  }

  test("temperatureMixture expansion is map-only: no exchange in the " +
      "returned plan (the counts groupBy is a separate bounded job)") {
    val data = spark.range(100).select(col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("g"))
    val out = Sampling.temperatureMixture(data, col("doc_id"), "pp",
      col("g"), targetRows = 200)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("temperatureMixture many-group arm: broadcast-joined plan equals " +
      "the when-chain bit-for-bit; corpus still never shuffles") {
    import spark.implicits._
    // 100 groups (> the 64 chain cap) with skewed sizes
    val data = (1L to 600L).map(i => (i, s"g${i % 100}"))
      .toDF("doc_id", "g")
    def run(chainCap: Int) = Sampling.temperatureMixture(
        data, col("doc_id"), "arm", col("g"), targetRows = 900,
        alphaEighths = 4, maxWhenChainGroups = chainCap)
      .select("doc_id", "g", "copy_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val joined = run(64) //   default: join arm engages at 100 groups
    val chained = run(1000) // forced when-chain on the same data
    assert(joined == chained && joined.nonEmpty)
    // the join arm broadcasts the plan table; the corpus side must
    // not hit a shuffle exchange
    val plan = Sampling.temperatureMixture(
        data, col("doc_id"), "arm", col("g"), targetRows = 900)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!"(?<!Broadcast)Exchange".r.findFirstIn(plan).isDefined, plan)
  }

  test("temperatureMixture: loud plan-time cap, null groups dropped, " +
      "degenerate params rejected") {
    import spark.implicits._
    val data = Seq((1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "g")
    // a 2-row group under a 1000-row budget needs 500 epochs — the cap
    // must fire on the DRIVER at plan time, before any job runs
    val boom = intercept[IllegalArgumentException](
      Sampling.temperatureMixture(data, col("doc_id"), "s", col("g"),
        targetRows = 1000, maxEpochs = 10))
    assert(boom.getMessage.contains("maxEpochs"))
    val ok = Sampling.temperatureMixture(data, col("doc_id"), "s",
        col("g"), targetRows = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ok == Set(1L, 2L)) // null group contributes no rows
    assertThrows[IllegalArgumentException](
      Sampling.temperatureMixture(data, col("doc_id"), "s", col("g"), 0))
    assertThrows[IllegalArgumentException](
      Sampling.temperatureMixture(data, col("doc_id"), "s", col("g"), 5,
        alphaEighths = 9))
  }

  test("uniMax matches the exact integer allocation model: the cap binds " +
      "smallest-first and the surplus re-splits over larger groups; " +
      "partitioning-invariant") {
    import spark.implicits._
    // a=16 rows, b=4, c=1; budget 30, cap 2.
    // ascending (c,b,a): c share 30/3=10, cap 2*1=2 -> alloc 2 (BINDS);
    // b share 28/2=14, cap 8 -> alloc 8 (BINDS); a share 20/1=20,
    // cap 32 -> alloc 20 = 1 copy + 4/16 fractional.
    val rows = (1L to 16L).map(i => (i, "a")) ++
      (17L to 20L).map(i => (i, "b")) ++ Seq((21L, "c"))
    val data = rows.toDF("doc_id", "g")
    def h52(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:um".getBytes("UTF-8"))
        .map(b => "%02x".format(b & 0xff)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    val alloc = Map("a" -> 20L, "b" -> 8L, "c" -> 2L)
    val counts = Map("a" -> 16L, "b" -> 4L, "c" -> 1L)
    val expected = rows.flatMap { case (i, g) =>
      val copies = alloc(g) / counts(g) +
        (if (BigInt(h52(i)) <
             (BigInt(alloc(g) % counts(g)) << 52) / counts(g)) 1 else 0)
      (1L to copies).map(k => (i, g, k))
    }.toSet
    def run(parts: Int) = Sampling.uniMax(
        data.repartition(parts), col("doc_id"), "um", col("g"),
        budgetRows = 30, maxEpochs = 2)
      .select("doc_id", "g", "copy_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val got = run(2)
    assert(got == expected && got == run(5))
    // the capped groups are EXACT (no fractional noise): c has 2 rows,
    // b has 8 — the UniMax repetition bound
    assert(got.count(_._2 == "c") == 2 && got.count(_._2 == "b") == 8)
  }

  test("uniMax under a budget beyond every cap emits exactly maxEpochs " +
      "copies of every row and leaves the surplus unspent") {
    import spark.implicits._
    val data = (1L to 10L).map(i => (i, if (i <= 7) "x" else "y"))
      .toDF("doc_id", "g")
    val out = Sampling.uniMax(data, col("doc_id"), "cap", col("g"),
        budgetRows = 10000, maxEpochs = 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10 && out.values.forall(_ == 3L))
  }

  test("uniMax expansion is map-only (shared expandByPlan kernel); " +
      "zero budget emits zero rows; null groups drop; degenerate " +
      "params rejected") {
    import spark.implicits._
    val data = spark.range(100).select(col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("g"))
    val out = Sampling.uniMax(data, col("doc_id"), "pp", col("g"),
      budgetRows = 200)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(Sampling.uniMax(data, col("doc_id"), "pp", col("g"),
      budgetRows = 0).count() == 0L)
    val withNull = Seq((1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "g")
    val kept = Sampling.uniMax(withNull, col("doc_id"), "s", col("g"),
        budgetRows = 2, maxEpochs = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L)) // alloc = min(1*2, 2//1) = 2 -> 1 copy each
    assertThrows[IllegalArgumentException](
      Sampling.uniMax(withNull, col("doc_id"), "s", col("g"), -1))
    assertThrows[IllegalArgumentException](
      Sampling.uniMax(withNull, col("doc_id"), "s", col("g"), 5,
        maxEpochs = 0))
  }

  test("rendezvousShard matches a brute-force md5 argmax model, and " +
      "growing N to N+1 moves ids ONLY into the new shard") {
    import spark.implicits._
    def model(id: Long, n: Int): Long = {
      def h(s: Int): BigInt = {
        val d = java.security.MessageDigest.getInstance("MD5")
        val hex = d.digest(s"$id#$s:rdv".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        BigInt(hex.take(13), 16)
      }
      (0 until n).maxBy(s => (h(s), -s)).toLong
    }
    val ids = (0L until 200L).toSeq
    val out = ids.toDF("id").repartition(5)
      .select(col("id"),
        Sampling.rendezvousShard(col("id"), 7, "rdv").as("s7"),
        Sampling.rendezvousShard(col("id"), 8, "rdv").as("s8"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (id, s7, s8) =>
      assert(s7 == model(id, 7), s"id=$id n=7")
      assert(s8 == model(id, 8), s"id=$id n=8")
      // the consistency property: a changed assignment lands in the
      // NEW shard — nothing ever moves between surviving shards
      if (s7 != s8) assert(s8 == 7L, s"id=$id moved to $s8, not the new shard")
    }
    val moved = out.count { case (_, s7, s8) => s7 != s8 }
    // expectation 200/8 = 25; a generous band guards the distribution
    assert(moved > 5 && moved < 60, s"moved=$moved")
    assertThrows[IllegalArgumentException](
      Sampling.rendezvousShard(col("id"), 0, "rdv"))
    assertThrows[IllegalArgumentException](
      Sampling.rendezvousShard(col("id"), 5000, "rdv"))
  }

  test("hashBootstrapMean == plain-Scala md5 replay: replicate " +
      "membership, true-floor replicate means, ceil-rank CI; the CI " +
      "brackets hold ci_lo <= ci_hi; pure function of (ids, salt)") {
    import spark.implicits._
    val data = (1L to 400L).map(i => ("g" + (i % 2), i, i * 7L % 101L))
    val reps = 16
    def md5FirstHex(s: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (d(0) >> 4) & 0xf
    }
    def floorDiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a.sign * b.sign < 0 && q * b != a) q - 1 else q
    }
    def meanFx(vs: Seq[Long]): Long =
      floorDiv(BigInt(vs.sum) * 1048576, BigInt(vs.length)).toLong
    val model: Map[String, (Long, Long, Long, Long, Long)] =
      data.groupBy(_._1).map { case (g, rows) =>
        val full = meanFx(rows.map(_._3))
        val repMeans = (0 until reps).flatMap { b =>
          val mem = rows.filter(r =>
            md5FirstHex(s"${r._2}:bs:$b") < 8).map(_._3)
          if (mem.nonEmpty) Some(meanFx(mem)) else None
        }.sorted
        val nr = repMeans.length.toLong
        def at(bp: Long) =
          repMeans((math.max(1L, (nr * bp + 9999L) / 10000L) - 1).toInt)
        g -> (rows.length.toLong, full, nr, at(500L), at(9500L))
      }
    val got = Sampling.hashBootstrapMean(data.toDF("g", "id", "v"),
        col("g"), col("id"), col("v"), reps = reps)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == model)
    got.values.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
    // deterministic: a second run is bit-identical
    val again = Sampling.hashBootstrapMean(data.toDF("g", "id", "v"),
        col("g"), col("id"), col("v"), reps = reps)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(again == got)
    intercept[IllegalArgumentException](Sampling.hashBootstrapMean(
      data.toDF("g", "id", "v"), col("g"), col("id"), col("v"),
      reps = 1))
    intercept[IllegalArgumentException](Sampling.hashBootstrapMean(
      data.toDF("g", "id", "v"), col("g"), col("id"), col("v"),
      loBp = 9500, hiBp = 500))
  }
}
