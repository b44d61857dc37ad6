package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-join evidence harness: measures `Partitioning.saltedJoin` against
  * the plain sort-merge join and AQE's skew-join splitting on a fixture
  * where ONE key owns 20% of the fact rows — the distribution the
  * saltedJoin scaladoc claims to fix. Run:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.SkewBench"
  *
  * Prints one JSON line: median seconds per variant over 3 iterations.
  * Variants (dim side kept un-broadcastable via autoBroadcastJoinThreshold
  * = -1, so the join actually shuffles — with broadcast on, none of this
  * matters, which is itself the first lever to reach for):
  *
  *  - smj_aqe_off:  plain join, AQE disabled — the stalled-hot-task shape
  *  - smj_aqe_skew: plain join, AQE + skewJoin enabled (Spark's runtime
  *                  split of oversized sort-merge partitions)
  *  - salted:       Partitioning.saltedJoin(salt = cpus), AQE disabled —
  *                  the explicit lever for operators AQE can't re-plan
  *
  * Results land in NOTES.md ("saltedJoin skew evidence").
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nFact = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "8000000").toLong
    val nKeys = 256
    val hotShare = 5 // key 0 gets every 5th row = 20%
    val base = java.nio.file.Files.createTempDirectory("graft_skew")

    // fact: 20% of rows on key 0, the rest uniform over the other keys;
    // ~64 B payload so the shuffle moves real bytes
    spark.range(nFact)
      .select(
        when(col("id") % hotShare === 0, 0L)
          .otherwise(pmod(hash(col("id")), lit(nKeys - 1)) + 1)
          .as("k"),
        concat(lit("payload-"), md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string"))).as("payload"))
      .write.mode("overwrite").parquet(s"$base/fact")
    spark.range(nKeys).select(col("id").as("k"),
        md5(col("id").cast("string")).as("tag"))
      .write.mode("overwrite").parquet(s"$base/dim")

    def fact = spark.read.parquet(s"$base/fact")
    def dim = spark.read.parquet(s"$base/dim")

    // force the joined rows to materialize (same rationale as Bench's
    // noop write)
    def consume(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Unit): Double = {
      f // warm
      Seq.fill(3)(timed(f)).sorted.apply(1)
    }

    def withConf(kvs: (String, String)*)(body: => Double): Double = {
      val saved = kvs.map { case (k, _) => k -> spark.conf.get(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }

    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold" -> "-1"

    val smjOff = withConf(noBroadcast,
      "spark.sql.adaptive.enabled" -> "false") {
      median3(consume(fact.join(dim, Seq("k"))))
    }
    val smjAqe = withConf(noBroadcast,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // the fixture's hot partition (~400 MB estimated) must exceed the
      // split threshold or AQE declines to act at local-bench scale
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB") {
      median3(consume(fact.join(dim, Seq("k"))))
    }
    val salted = withConf(noBroadcast,
      "spark.sql.adaptive.enabled" -> "false") {
      median3(consume(
        graft.ops.Partitioning.saltedJoin(fact, dim, Seq("k"), cpus.toInt)))
    }

    // sanity: all variants join the same row count
    val n1 = withConf(noBroadcast)(
      { fact.join(dim, Seq("k")).count().toDouble })
    val n2 = graft.ops.Partitioning.saltedJoin(fact, dim, Seq("k"), cpus.toInt)
      .count().toDouble
    require(n1 == n2, s"variant row counts differ: $n1 vs $n2")

    println(s"""{"metric":"skew_join","rows":$nFact,"hot_share":0.2,""" +
      s""""smj_aqe_off":$smjOff,"smj_aqe_skew":$smjAqe,"salted":$salted,""" +
      s""""joined_rows":${n1.toLong}}""")
    spark.stop()
  }
}
