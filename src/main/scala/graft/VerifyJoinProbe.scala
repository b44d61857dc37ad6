package graft

import org.apache.spark.sql.functions._

/** A/B for the MinHash verify stage's physical join: `PairStageProbe`
  * attributed ~90% of q18's x100 wall-clock to `verifyJaccard`'s two
  * pair⋈docs joins, where sort-merge sorts millions of pair rows that
  * carry multi-KB shingle-hash arrays (the sh1 payload rides through
  * the id2 exchange AND its sort). A shuffle-hash join moves the same
  * bytes but never sorts the wide stream side. Same JVM, same data,
  * both arms:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/docs/x100 \
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.VerifyJoinProbe"
  *
  * Results in NOTES.md; the winning arm becomes verifyJaccard's
  * explicit join hint.
  */
object VerifyJoinProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/docs/x100")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    def chain(): Long = graft.dedup.Dedup.minhashLsh(
      d, col("doc_id"), col("text"), shingleK = 8, numHashes = 12,
      bands = 3, threshold = 0.3, maxBucketSize = 1000).count()
    def sec(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val plan = graft.dedup.Dedup.minhashLsh(
      d, col("doc_id"), col("text"), shingleK = 8, numHashes = 12,
      bands = 3, threshold = 0.3, maxBucketSize = 1000)
      .queryExecution.executedPlan.toString
    println(s"""{"metric":"verify_join_plan",""" +
      s""""shj":${"ShuffledHashJoin".r.findAllIn(plan).length},""" +
      s""""smj":${"SortMergeJoin".r.findAllIn(plan).length}}""")

    chain() // warm JIT/codegen + page cache once
    val arms = Seq(true, false, true, false, true, false)
    val res = arms.map { smj =>
      spark.conf.set("spark.sql.join.preferSortMergeJoin", smj.toString)
      val (s, n) = sec(chain())
      (smj, s, n)
    }
    val report = res.map { case (smj, s, n) =>
      s"""{"smj":$smj,"sec":$s,"rows":$n}""" }.mkString(",")
    println(s"""{"metric":"verify_join_ab","sf":"$sfDir","runs":[$report]}""")
    spark.stop()
  }
}
