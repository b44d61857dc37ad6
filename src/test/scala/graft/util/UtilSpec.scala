package graft.util

import graft.SparkSpec
import graft.ops.Aggregators
import graft.tap.Tap
import java.nio.file.Files

class UtilSpec extends SparkSpec {

  test("Counters.countRows passes rows through and counts them") {
    import spark.implicits._
    val counters = new Counters(spark)
    val df = counters.countRows(
      Seq(1, 2, 3, 4).toDF("x"), "rows_seen")()
    assert(df.count() == 4)
    assert(counters.value("rows_seen") == 4)
  }

  test("topK aggregator keeps the k largest with bounded state") {
    import spark.implicits._
    val agg = Aggregators.topK[(String, Long)](3)(_._2)
    val out = Seq(("a", 5L), ("a", 1L), ("a", 9L), ("a", 7L), ("a", 3L))
      .toDS()
      .groupByKey(_._1)
      .agg(agg.toColumn.name("top"))
      .collect().head._2
    assert(out == Seq(9L, 7L, 5L))
  }

  test("fromFileList reads the files named in a listing file") {
    val dir = Files.createTempDirectory("graft-fl")
    Files.write(dir.resolve("one.bin"), Array[Byte](1))
    Files.write(dir.resolve("two.bin"), Array[Byte](2, 2))
    Files.write(dir.resolve("skip.bin"), Array[Byte](3, 3, 3))
    val listing = dir.resolve("list.txt")
    Files.writeString(listing,
      s"${dir.resolve("one.bin")}\n${dir.resolve("two.bin")}\n")
    val df = Tap.fromFileList(spark, listing.toString)
    assert(df.count() == 2)
    assert(df.select("length").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
