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
