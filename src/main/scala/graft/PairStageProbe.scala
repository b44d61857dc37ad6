package graft

import org.apache.spark.sql.functions._

/** Stage attribution for the MinHash-LSH dedup chain on a scale-ladder
  * rung: ITERS=1 wall-clock alone cannot distinguish a candidate-pair
  * blowup (a real banding knee, or a rung-data artifact) from box
  * noise, so this probe counts every stage's cardinality and times the
  * signature pass vs the full chain separately:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/docs/x100 \
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.PairStageProbe"
  *
  * Prints one JSON line: docs, banded rows, buckets with >= 2 members,
  * over-cap buckets, candidate pairs (pre/post distinct), verified
  * pairs, and seconds for signatures alone vs the whole q18 shape.
  * Results in NOTES.md ("dedup deep ladder x30/x100").
  */
object PairStageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/docs/x100")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val (numHashes, bands, maxBucketSize, threshold) = (12, 3, 1000, 0.3)

    def sec(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val docs = graft.dedup.Dedup.shingleDocs(
      d, col("doc_id"), col("text"), 8).select(col("id"), col("vms"))
    val (secSig, nDocs) = sec(docs.count())
    val banded = graft.dedup.Dedup.bandBuckets(docs, numHashes, bands)
    val (secBand, nBanded) = sec(banded.count())
    val sizes = banded.groupBy("bucket").count().filter(col("count") >= 2)
      .agg(
        count(lit(1)).as("ge2"),
        sum(when(col("count") > maxBucketSize, 1L).otherwise(0L)).as("capped"),
        sum(when(col("count") <= maxBucketSize,
          (col("count") * (col("count") - 1) / 2).cast("long"))
          .otherwise(1L)).as("pairs"))
      .first()
    val grouped = graft.dedup.Dedup.cappedBucketGroups(
      banded, maxBucketSize, "graft.probe")
    val pairs = graft.dedup.Dedup.emitPairs(grouped, docs.schema("id").dataType)
    val (secDistinct, nDistinct) = sec(pairs.distinct().count())
    val (secFull, nVerified) = sec(graft.dedup.Dedup.minhashLsh(
      d, col("doc_id"), col("text"), shingleK = 8, numHashes = numHashes,
      bands = bands, threshold = threshold,
      maxBucketSize = maxBucketSize).count())
    println(s"""{"metric":"pair_stages","sf":"$sfDir","docs":$nDocs,""" +
      s""""banded":$nBanded,"buckets_ge2":${sizes.getLong(0)},""" +
      s""""capped_buckets":${sizes.getLong(1)},""" +
      s""""cand_pairs":${sizes.getLong(2)},""" +
      s""""cand_pairs_distinct":$nDistinct,"verified":$nVerified,""" +
      s""""sec_signatures":$secSig,"sec_banded":$secBand,""" +
      s""""sec_through_distinct":$secDistinct,"sec_full_chain":$secFull}""")
    spark.stop()
  }
}
