package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: times every SparkEntry query (or the subset named in
  * SPARK_GRAFT_QUERIES) against SPARK_GRAFT_SF_DIR, forcing full
  * materialization via a noop-format write — `count()` would let Catalyst
  * prune un-counted aggregate columns and under-report. One JSON line on
  * stdout, as the driver contract requires.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // JVM/codegen/session warm-up outside the timed region
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10)
      .write.format("noop").mode("overwrite").save()

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // caches are per-query internals, not carryover
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
