package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Secondary-sort grouped reduce: group-boundary and in-group ordering
  * semantics ported from hadron's group splitter
  * (/root/reference/src/Hadron/Basic.hs:255-268) + Hadoop's full-key sort.
  */
class GroupReduceSpec extends SparkSpec {

  private def input = {
    import spark.implicits._
    // deliberately shuffled input order; 3 groups, skewed sizes
    Seq(
      ("g2", 3, "c"), ("g1", 2, "b"), ("g3", 1, "x"),
      ("g1", 1, "a"), ("g2", 1, "a"), ("g2", 2, "b"),
      ("g1", 3, "c"))
      .toDF("k", "ord", "v")
  }

  test("groups iterate contiguously in sort-column order") {
    import spark.implicits._
    val out = GroupReduce.secondarySort[(String, String)](
      input, Seq("k"), Seq(col("ord"))) { (key, rows) =>
      Iterator((key.getAs[String]("k"),
        rows.map(_.getAs[String]("v")).mkString("")))
    }.collect().toMap
    assert(out == Map("g1" -> "abc", "g2" -> "abc", "g3" -> "x"))
  }

  test("descending sort columns are honored") {
    import spark.implicits._
    val out = GroupReduce.secondarySort[(String, String)](
      input, Seq("k"), Seq(col("ord").desc)) { (key, rows) =>
      Iterator((key.getAs[String]("k"),
        rows.map(_.getAs[String]("v")).mkString("")))
    }.collect().toMap
    assert(out("g1") == "cba")
  }

  test("reducer that consumes only part of a group stays stream-aligned") {
    import spark.implicits._
    val out = GroupReduce.secondarySort[(String, String)](
      input, Seq("k"), Seq(col("ord"))) { (key, rows) =>
      // take only the first row, leave the rest unconsumed
      val first = rows.next()
      Iterator((key.getAs[String]("k"), first.getAs[String]("v")))
    }.collect().toMap
    assert(out == Map("g1" -> "a", "g2" -> "a", "g3" -> "x"))
  }

  test("ReSkip drops only the failing group (ReduceErrorStrategy)") {
    import spark.implicits._
    val out = GroupReduce.secondarySort[(String, String)](
      input, Seq("k"), Seq(col("ord")), onError = ReSkip) { (key, rows) =>
      val k = key.getAs[String]("k")
      if (k == "g2") throw new RuntimeException("boom")
      Iterator((k, rows.map(_.getAs[String]("v")).mkString("")))
    }.collect().toMap
    assert(out == Map("g1" -> "abc", "g3" -> "x"))
  }

  test("ReThrow propagates the reducer exception") {
    import spark.implicits._
    assertThrows[org.apache.spark.SparkException] {
      GroupReduce.secondarySort[(String, String)](
        input, Seq("k"), Seq(col("ord"))) { (_, _) =>
        throw new RuntimeException("boom")
      }.collect()
    }
  }
}
