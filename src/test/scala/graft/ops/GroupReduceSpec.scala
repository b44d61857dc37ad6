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

  test("ReSkip truncates a group whose reducer fails MID-STREAM, " +
      "after it already yielded rows; later groups are unaffected") {
    import spark.implicits._
    val out = GroupReduce.secondarySort[(String, String)](
      input, Seq("k"), Seq(col("ord")), onError = ReSkip) { (key, rows) =>
      val k = key.getAs[String]("k")
      rows.map { r =>
        val v = r.getAs[String]("v")
        if (k == "g2" && v == "b") throw new RuntimeException("mid-stream")
        (k, v)
      }
    }.collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out("g1") == Seq("a", "b", "c"))
    assert(out("g2") == Seq("a")) // truncated at the failure point
    assert(out("g3") == Seq("x"))
  }

  test("ReRetry re-runs only the failing key and succeeds once the " +
      "transient fault clears (Types.hs:56-60, declared-only in hadron)") {
    import spark.implicits._
    GroupReduceSpec.failures.clear()
    GroupReduceSpec.failures.put("g2", new java.util.concurrent.atomic.AtomicInteger(2))
    val out = GroupReduce.secondarySort[(String, String)](
      input, Seq("k"), Seq(col("ord")), onError = ReRetry(attempts = 3)) {
      (key, rows) =>
        val k = key.getAs[String]("k")
        val remaining = GroupReduceSpec.failures.get(k)
        if (remaining != null && remaining.getAndDecrement() > 0)
          throw new RuntimeException("transient")
        Iterator((k, rows.map(_.getAs[String]("v")).mkString("")))
    }.collect().toMap
    // two transient failures, third attempt lands — full output, no loss
    assert(out == Map("g1" -> "abc", "g2" -> "abc", "g3" -> "x"))
  }

  test("ReRetry exhausted falls back to ReSkip (drops the key) or " +
      "ReThrow (fails the task)") {
    import spark.implicits._
    def run(onExhausted: ReduceErrorStrategy) =
      GroupReduce.secondarySort[(String, String)](
        input, Seq("k"), Seq(col("ord")),
        onError = ReRetry(2, onExhausted)) { (key, rows) =>
        val k = key.getAs[String]("k")
        if (k == "g2") throw new RuntimeException("permanent")
        Iterator((k, rows.map(_.getAs[String]("v")).mkString("")))
      }
    assert(run(ReSkip).collect().toMap == Map("g1" -> "abc", "g3" -> "x"))
    assertThrows[org.apache.spark.SparkException] { run(ReThrow).collect() }
  }

  test("ReRetry rejects nonsense configurations at construction") {
    assertThrows[IllegalArgumentException](ReRetry(0))
    assertThrows[IllegalArgumentException](ReRetry(2, ReRetry(2)))
  }
}

/** Shared transient-fault registry: local-mode executors run in this JVM,
  * so a static map observes per-key attempt counts across retries.
  */
object GroupReduceSpec {
  val failures = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
}
