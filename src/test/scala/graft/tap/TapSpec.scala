package graft.tap

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TapSpec extends SparkSpec {

  test("concat of same-format taps unions paths into one scan") {
    val n = Tap.concat(spark, Seq(
      Tap.parquet(sf("sf0.001") + "/nation.parquet"),
      Tap.parquet(sf("sf0.001") + "/nation.parquet")))
    assert(n.count() == 2 * 25)
  }

  test("concatByFile dispatches decoders per file inside one mixed " +
      "directory (the reference's filename-stem match)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-mixed")
    Files.write(dir.resolve("part0.csv"),
      "id,name\n1,alpha\n2,beta\n".getBytes("UTF-8"))
    Files.write(dir.resolve("part1.json"),
      """{"id":3,"name":"gamma"}
        |{"id":4,"name":"delta"}
        |""".stripMargin.getBytes("UTF-8"))
    Files.write(dir.resolve("part2.csv"),
      "id,name\n5,epsilon\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Tap.concatByFile(spark, dir.toString, Seq(
      "*.csv" -> Tap(Nil, "csv", Map("header" -> "true"),
        Some(schema)),
      "*.json" -> Tap(Nil, "json", Map.empty, Some(schema))))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, "delta"), (5L, "epsilon")))
  }

  test("merge tags two different-schema taps (mergeTaps analog)") {
    val m = Tap.merge(spark,
      Tap.parquet(sf("sf0.001") + "/region.parquet"),
      Tap.parquet(sf("sf0.001") + "/nation.parquet"))
    assert(m.filter(col("side") === "left").count() == 5)
    assert(m.filter(col("side") === "right").count() == 25)
    // left rows have nation columns null-padded
    assert(m.filter(col("side") === "left" && col("n_name").isNull).count() == 5)
  }

  test("binaryDir reads file payloads with glob filtering") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("b.txt"), Array[Byte](4))
    val df = Tap.binaryDir(dir.toString, "*.bin").read(spark)
    val rows = df.select("length").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 3)
  }

  test("fan-out write partitions by route and returns per-route stats") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-fan").toString + "/out"
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("route", "v")
    val stats = FanOut.write(df, col("route"), out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("a" -> 2L, "b" -> 1L))
    // route=a rows landed under the a partition directory
    val aRows = spark.read.parquet(out).filter(col("__route") === "a").count()
    assert(aRows == 2)
  }

  test("write + read round-trip via Tap") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft-rt").toString + "/t"
    val tap = Tap.parquet(p)
    tap.write(Seq((1, "x"), (2, "y")).toDF("id", "s"))
    assert(tap.read(spark).count() == 2)
  }

  test("orc round-trip preserves schema and pushes filters to the scan") {
    import spark.implicits._
    val p = Files.createTempDirectory("graft-orc").toString + "/t"
    val tap = Tap.orc(p)
    tap.write((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"))
    val back = tap.read(spark)
    assert(back.schema.map(_.name) == Seq("id", "s"))
    val filtered = back.filter(col("id") === 7L)
    assert(filtered.collect().map(_.getString(1)).toSeq == Seq("v7"))
    // the predicate must reach the ORC scan, not run post-load
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]"),
      s"filter not pushed:\n$scan")
  }

  test("gzip files read transparently (readHdfsFile auto-ungzip analog)") {
    val dir = Files.createTempDirectory("graft-gz")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("data.txt.gz")))
    gz.write("alpha\nbeta\n".getBytes("UTF-8")); gz.close()
    val rows = Tap.text(dir.toString + "/data.txt.gz").read(spark)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(rows == Seq("alpha", "beta"))
  }

  test("bucketed tables join with no shuffle exchange") {
    import spark.implicits._
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    Tap.writeBucketed(a, "bkt_a", "k", 4)
    Tap.writeBucketed(b, "bkt_b", "k", 4)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("writeMerged routes a merged union back through two fresh taps " +
      "(homogeneous schemas, mergeTaps write side, Controller.hs:436-439)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-wm").toString
    val l0 = Seq((1, "a"), (2, "b")).toDF("id", "s")
    val r0 = Seq((10, "x")).toDF("id", "s")
    val srcL = Tap.parquet(base + "/src-l"); srcL.write(l0)
    val srcR = Tap.parquet(base + "/src-r"); srcR.write(r0)

    val merged = Tap.merge(spark, srcL, srcR)
    val dstL = Tap.parquet(base + "/dst-l")
    val dstR = Tap.parquet(base + "/dst-r")
    Tap.writeMerged(merged, dstL, dstR)

    assert(dstL.read(spark).collect().map(r => (r.getInt(0), r.getString(1)))
      .sorted.toSeq == Seq((1, "a"), (2, "b")))
    assert(dstR.read(spark).collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq == Seq((10, "x")))
    assert(!dstL.read(spark).columns.contains("side"))
  }

  test("writeMerged with explicit per-tap schemas drops the union's " +
      "null-padded columns on each side (heterogeneous round-trip)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-wm2").toString
    val l0 = Seq((1, "a")).toDF("id", "s")
    val r0 = Seq((2, 2.5)).toDF("id", "v")
    val srcL = Tap.parquet(base + "/src-l"); srcL.write(l0)
    val srcR = Tap.parquet(base + "/src-r"); srcR.write(r0)

    val merged = Tap.merge(spark, srcL, srcR)
    assert(merged.columns.toSet == Set("id", "s", "v", "side"))

    val dstL = Tap.parquet(base + "/dst-l").copy(schema = Some(l0.schema))
    val dstR = Tap.parquet(base + "/dst-r").copy(schema = Some(r0.schema))
    Tap.writeMerged(merged, dstL, dstR)

    val lBack = dstL.read(spark)
    val rBack = dstR.read(spark)
    assert(lBack.columns.toSeq == Seq("id", "s"))
    assert(rBack.columns.toSeq == Seq("id", "v"))
    assert(lBack.collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq == Seq((1, "a")))
    assert(rBack.collect().map(r => (r.getInt(0), r.getDouble(1)))
      .toSeq == Seq((2, 2.5)))
  }

  test("writeMerged back into the SOURCE taps materializes first instead " +
      "of overwriting a path being read (in-place round-trip)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-wm3").toString
    val l0 = Seq((1, "a"), (2, "b")).toDF("id", "s")
    val r0 = Seq((10, "x")).toDF("id", "s")
    val tapL = Tap.parquet(base + "/l"); tapL.write(l0)
    val tapR = Tap.parquet(base + "/r"); tapR.write(r0)

    // transform the merged stream, then write back to the same locations —
    // the reference's in-place re-encode; naive lazy overwrite would throw
    val merged = Tap.merge(spark, tapL, tapR)
      .withColumn("s", upper(col("s")))
    Tap.writeMerged(merged, tapL, tapR)

    assert(tapL.read(spark).collect().map(r => (r.getInt(0), r.getString(1)))
      .sorted.toSeq == Seq((1, "A"), (2, "B")))
    assert(tapR.read(spark).collect().map(r => (r.getInt(0), r.getString(1)))
      .toSeq == Seq((10, "X")))
  }

  test("readEither: per-record first-that-parses fallback decode " +
      "(eitherProtocol analog, Protocol.hs:283-287)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-either")
    Files.writeString(dir.resolve("mixed.jsonl"),
      """{"id": 1, "name": "ada"}
        |{"code": "X9", "score": 0.5}
        |{"id": 2, "name": "bob"}
        |not json at all
        |""".stripMargin)
    val aSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val bSchema = StructType(Seq(
      StructField("code", StringType), StructField("score", DoubleType)))
    val out = Tap.readEither(spark, Tap.text(dir.toString), aSchema, bSchema)
      .collect()
    val byTag = out.groupBy(_.getString(1))
    assert(byTag("left").map(_.getStruct(2).getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    assert(byTag("right").map(_.getStruct(3).getString(0)).toSeq == Seq("X9"))
    // the undecodable line survives as dead-letter residue, raw line intact
    assert(byTag("corrupt").map(_.getString(0)).toSeq ==
      Seq("not json at all"))
    assert(byTag("corrupt").forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("readEither parses each schema exactly once per record (the " +
      "optimized plan carries two from_json, not one per consumer)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-either-plan")
    Files.writeString(dir.resolve("x.jsonl"), """{"id": 1, "name": "a"}""")
    val aSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val bSchema = StructType(Seq(
      StructField("code", StringType), StructField("score", DoubleType)))
    val plan = Tap.readEither(spark, Tap.text(dir.toString), aSchema, bSchema)
      .queryExecution.optimizedPlan.toString
    val parses = "from_json".r.findAllIn(plan).size
    assert(parses == 2,
      s"expected exactly 2 from_json (one per schema), got $parses:\n$plan")
  }

  test("filters and projections reach the parquet scan through a Tap " +
      "(pushdown + pruning — the scan must not read what the query " +
      "doesn't touch)") {
    val df = Tap.parquet(sf("sf0.001") + "/lineitem.parquet").read(spark)
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan parquet")).mkString("\n") +
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(scan.contains("PushedFilters") &&
      scan.contains("LessThan(l_orderkey,100)"),
      s"filter not pushed to scan:\n$scan")
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(scan).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity") &&
      !readSchema.contains("l_comment"),
      s"column pruning failed: $readSchema")
  }

  test("a Tap re-binds as a stream: file source -> transform -> file sink") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream")
    val inDir = base.resolve("in").toString
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    val batch = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    batch.write.parquet(inDir)

    val src = Tap.parquet(inDir).copy(schema = Some(batch.schema))
    val sink = Tap.parquet(outDir)
    // same relational transform a batch pipeline would apply
    val q = sink.writeStream(
      src.readStream(spark).filter(col("v") >= 20.0), ckpt)
    try q.processAllAvailable() finally q.stop()

    val out = sink.read(spark).select("id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(2L, 3L))
  }
}
