package graft.tools

import graft.Sessions
import graft.functions.{Hashing, Text}
import org.apache.spark.sql.functions._

/** Ad-hoc stage-by-stage profiler for the minhash pipeline (not part of
  * the driver contract; kept for perf iteration).
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val df = spark.read.parquet(s"$dir/documents.parquet")
    time("scan count")(df.count())

    val docs = graft.dedup.Dedup.shingleDocs(
        df, col("doc_id"), col("text"), 8).cache()
    time("docs cache (shingle+md5)")(docs.count())

    val banded = docs.select(col("id"),
        Hashing.lshBandKeys(Hashing.minhashFromBase(col("vms"), 12), 3, 4)
          .as("bk"))
      .select(col("id"), explode(col("bk")).as("bucket"))
      .cache()
    // (column-based banding, for comparison with the kernel inside minhashLsh)
    time("banded cache (signature)")(banded.count())

    val pairs = banded.as("a").join(banded.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      .cache()
    time("pairs (self-join+distinct)")(pairs.count())

    val verified = pairs
      .join(docs.select(col("id").as("id1"), col("shingles").as("sh1")), "id1")
      .join(docs.select(col("id").as("id2"), col("shingles").as("sh2")), "id2")
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("common")))
      .filter(col("jaccard") >= 0.3)
    time("verify (2 joins+intersect)")(verified.count())

    spark.stop()
  }
}
