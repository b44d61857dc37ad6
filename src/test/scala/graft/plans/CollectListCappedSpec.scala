package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** collect_list_capped: graft's custom Catalyst TypedImperativeAggregate
  * (registered via SparkSessionExtensions in Sessions).
  */
class CollectListCappedSpec extends SparkSpec {

  test("complete lists for groups at or under the cap") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(call_function("collect_list_capped", col("v"), lit(5)).as("vs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).sorted).toMap
    assert(out == Map(1 -> Seq("a", "b"), 2 -> Seq("c")))
  }

  test("buffers never exceed the cap; truncated groups keep a subset") {
    import spark.implicits._
    // 10k rows in one group, spread over partitions so merge() runs
    val df = spark.range(10000).repartition(8)
      .select(lit(1).as("k"), col("id"))
    val out = df.groupBy("k")
      .agg(
        call_function("collect_list_capped", col("id"), lit(7)).as("vs"),
        count(lit(1)).as("n"))
      .collect().head
    assert(out.getSeq[Long](out.fieldIndex("vs")).length == 7)
    assert(out.getLong(out.fieldIndex("n")) == 10000L)
    // elements are real group members
    assert(out.getSeq[Long](out.fieldIndex("vs")).forall(v => v >= 0 && v < 10000))
  }

  test("works in SQL and skips nulls like collect_list") {
    import spark.implicits._
    Seq((1, Some("x")), (1, None), (1, Some("y")))
      .toDF("k", "v").createOrReplaceTempView("cap_in")
    val out = spark.sql(
      "SELECT collect_list_capped(v, 10) AS vs FROM cap_in GROUP BY k")
      .collect().head.getSeq[String](0).sorted
    assert(out == Seq("x", "y"))
  }

  test("matches collect_list exactly when cap is not hit (fixture posting lists)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val posting = graft.dedup.Dedup.shingleDocs(
        docs, col("doc_id"), col("text"), 8)
      .select(col("id"), explode(col("vms")).as("sh"))
    val capped = posting.groupBy("sh")
      .agg(call_function("collect_list_capped", col("id"), lit(1000000)).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted.toSeq).toMap
    val builtin = posting.groupBy("sh")
      .agg(collect_list(col("id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted.toSeq).toMap
    assert(capped == builtin)
  }
}
