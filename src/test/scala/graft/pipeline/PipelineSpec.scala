package graft.pipeline

import graft.SparkSpec
import graft.tap.Tap
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** RerunStrategy behavior (/root/reference/src/Hadron/Controller.hs:867-924):
  * RSFail throws on existing output, RSSkip memoizes, RSReRun overwrites.
  */
class PipelineSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft-pipe").toString

  private def stage(name: String, out: String, rerun: RerunStrategy, tag: String) =
    Stage(name, Seq(Tap.parquet(sf("sf0.001") + "/region.parquet")),
      Tap.parquet(out), rerun)(dfs => dfs.head.withColumn("tag", lit(tag)))

  test("RSReRun overwrites existing output") {
    val out = tmp() + "/o1"
    new Pipeline(spark, Seq(stage("s1", out, RSReRun, "first"))).run()
    val ran = new Pipeline(spark, Seq(stage("s1", out, RSReRun, "second"))).run()
    assert(ran == Seq("s1"))
    assert(spark.read.parquet(out).select("tag").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("second"))
  }

  test("RSSkip leaves existing output untouched and reports no compute") {
    val out = tmp() + "/o2"
    new Pipeline(spark, Seq(stage("s1", out, RSSkip, "first"))).run()
    val ran = new Pipeline(spark, Seq(stage("s1", out, RSSkip, "second"))).run()
    assert(ran.isEmpty)
    assert(spark.read.parquet(out).select("tag").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("first"))
  }

  test("RSFail throws when output exists") {
    val out = tmp() + "/o3"
    new Pipeline(spark, Seq(stage("s1", out, RSFail, "first"))).run()
    assertThrows[IllegalStateException] {
      new Pipeline(spark, Seq(stage("s1", out, RSFail, "second"))).run()
    }
  }

  test("WordCountLocal analog: 3-stage chain incl. a map-only stage " +
      "(reference examples/WordCountLocal.hs:24-91)") {
    val base = tmp()
    val srcFile = java.nio.file.Paths.get(base, "sample.csv")
    Files.writeString(srcFile,
      "line\nthe quick brown fox\nthe lazy dog\nthe fox again\n")

    // stage 1: tokenize + word frequency (mapper + fold reducer)
    val s1 = Stage("wordFreq", Seq(Tap.csv(srcFile.toString)),
      Tap.parquet(base + "/freq"), RSReRun) { dfs =>
      dfs.head
        .select(explode(split(col("line"), "\\s+")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
    }
    // stage 2: total count over stage 1's output (chained job)
    val s2 = Stage("total", Seq(Tap.parquet(base + "/freq")),
      Tap.parquet(base + "/total"), RSReRun) { dfs =>
      dfs.head.agg(sum(col("n")).as("total"))
    }
    // stage 3: map-only truncation (B.take 5 analog; no shuffle)
    val s3 = Stage("truncate", Seq(Tap.parquet(base + "/freq")),
      Tap.parquet(base + "/trunc"), RSReRun) { dfs =>
      dfs.head.select(substring(col("word"), 1, 5).as("word5"), col("n"))
    }

    val ran = new Pipeline(spark, Seq(s1, s2, s3)).run()
    assert(ran == Seq("wordFreq", "total", "truncate"))
    val freq = spark.read.parquet(base + "/freq")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("the") == 3 && freq("fox") == 2 && freq("dog") == 1)
    assert(spark.read.parquet(base + "/total")
      .head().getLong(0) == freq.values.sum)
    assert(spark.read.parquet(base + "/trunc")
      .collect().map(_.getString(0)).forall(_.length <= 5))
  }

  test("multi-stage pipeline chains outputs in program order") {
    val base = tmp()
    val s1 = Stage("a", Seq(Tap.parquet(sf("sf0.001") + "/nation.parquet")),
      Tap.parquet(base + "/a"), RSReRun)(dfs => dfs.head.filter(col("n_regionkey") === 0))
    val s2 = Stage("b", Seq(Tap.parquet(base + "/a")),
      Tap.parquet(base + "/b"), RSReRun)(dfs => dfs.head.select("n_name"))
    val ran = new Pipeline(spark, Seq(s1, s2)).run()
    assert(ran == Seq("a", "b"))
    assert(spark.read.parquet(base + "/b").columns.toSeq == Seq("n_name"))
  }
}
