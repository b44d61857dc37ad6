package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: times every SparkEntry query (or the subset named in
  * SPARK_GRAFT_QUERIES) against SPARK_GRAFT_SF_DIR, forcing full
  * materialization via a noop-format write — `count()` would let Catalyst
  * prune un-counted aggregate columns and under-report. One JSON line on
  * stdout, as the driver contract requires.
  *
  * Methodology (JMH-style steady state): each query runs once untimed,
  * then `SPARK_GRAFT_ITERS` (default 3) timed iterations; the reported
  * figure is the per-query MEDIAN, with min/max spread alongside —
  * single-iteration timings on a shared 32-core box swing ±0.3 s on
  * untouched queries, which buries real regressions in noise. The DATA
  * cache is cleared between every run — nothing a query materializes
  * carries into its timed runs; only JVM-global state (JIT, whole-stage-
  * codegen class cache) is warm. That matches the deployment this engine
  * targets: on a long-lived cluster a plan's generated code compiles once
  * and then processes terabytes — per-plan Janino compile time (~6 s
  * across this suite, measured) is not throughput. The cold pass's total
  * is still reported as `cold_total`.
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
      .toSeq.sortBy(_._1)

    // a failed run records a (misleadingly fast) timing — so failures are
    // ALSO counted into the JSON line, where nothing can grep past them
    val failed = scala.collection.mutable.Set.empty[String]
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // caches are per-query internals, not carryover
      sec
    }

    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    require(iters >= 1, s"SPARK_GRAFT_ITERS must be >= 1, got $iters")

    // Interleaved: untimed warm run immediately followed by the timed
    // iterations of the same query — back-to-back so the plan's generated
    // classes stay resident in the (LRU-bounded) codegen cache.
    val runs = selected.map { case (name, fn) =>
      val cold = runOne(name, fn)
      val timed = Seq.fill(iters)(runOne(name, fn)).sorted
      (name, cold, timed)
    }
    val cold = runs.map(_._2).sum
    // xs is pre-sorted; even lengths average the two middle elements
    def median(xs: Seq[Double]): Double =
      if (xs.length % 2 == 1) xs(xs.length / 2)
      else (xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2.0
    val results = runs.map { case (name, _, t) => (name, median(t), t.head, t.last) }

    val qs = results.map { case (k, med, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, lo, hi) => "\"" + k + "\":[" + lo + "," + hi + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$cold,"iters":$iters,"failed":$failedJson,"queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    // Second, short line: the r7 driver capture truncated the long line's
    // HEAD, losing total/cold/failed. This summary is small enough that a
    // tail-biased truncation always preserves it.
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","cold_total":$cold,"iters":$iters,"nqueries":${results.length},"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
