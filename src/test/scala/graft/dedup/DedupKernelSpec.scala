package graft.dedup

import graft.SparkSpec
import graft.functions.{Hashing, Text}
import org.apache.spark.sql.functions._

/** The typed shingle/hash kernel must be bit-identical to the Column
  * formulation it replaces (the oracle SQL mirrors the Column semantics).
  */
class DedupKernelSpec extends SparkSpec {

  test("shingleDocs kernel == Column formulation (hashed-shingle sets)") {
    val df = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .limit(50)
    val kernel = Dedup.shingleDocs(df, col("doc_id"), col("text"), 8)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
      .sortBy(_._1)
    val column = df.select(col("doc_id"),
        array_distinct(Text.charShingles(col("text"), 8)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("vms", transform(col("sh"), s => Hashing.md5Mod(s)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](2).toSet))
      .sortBy(_._1)
    assert(kernel.length == column.length)
    kernel.zip(column).foreach { case (k, c) => assert(k == c) }
  }

  test("emitPairCounts: tiny flush threshold changes nothing (mid-stream drain path)") {
    import spark.implicits._
    val groups = Seq(
      Seq(3L, 1L, 2L), Seq(1L, 2L), Seq(2L, 3L), Seq(5L, 1L))
      .toDF("ids").repartition(2)
    def counts(flushAt: Int) =
      Dedup.emitPairCounts(groups, org.apache.spark.sql.types.LongType, flushAt)
        .groupBy("id1", "id2").sum("cnt")
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = Map(
      (1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 2L, (1L, 5L) -> 1L)
    assert(counts(flushAt = 1 << 22) == expected) // single final drain
    assert(counts(flushAt = 1) == expected)       // drain after every group
  }

  test("minhashLsh finds the fixture's planted near-duplicates") {
    val df = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val pairs = Dedup.minhashLsh(df, col("doc_id"), col("text"),
      shingleK = 8, numHashes = 12, bands = 3, threshold = 0.3,
      maxBucketSize = Int.MaxValue)
      .collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getDouble(2) >= 0.3))
  }
}
