package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {

  test("diff labels added/removed/changed and drops unchanged rows") {
    import spark.implicits._
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val neu = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = SnapshotDiff.diff(
        old, col("doc_id"), col("text"), neu, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null text diffs by presence, not by hash nullness") {
    import spark.implicits._
    val old = Seq((1L, null: String), (2L, "x"), (3L, null: String))
      .toDF("doc_id", "text")
    val neu = Seq((1L, null: String), (2L, null: String), (4L, null: String))
      .toDF("doc_id", "text")
    val out = SnapshotDiff.diff(
        old, col("doc_id"), col("text"), neu, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // 1: null == null -> unchanged (dropped); 2: "x" -> null = changed
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("join moves hashes, not documents (projection reaches the scan)") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"text $i", s"junk $i"))
      .toDF("doc_id", "text", "payload")
    val plan = SnapshotDiff.diff(
        df.filter(col("doc_id") <= 60), col("doc_id"), col("text"),
        df.filter(col("doc_id") >= 40), col("doc_id"), col("text"))
      .queryExecution.optimizedPlan.toString
    // the untouched wide column must be pruned before the join
    assert(!plan.contains("payload"), s"wide column not pruned:\n$plan")
  }
}
