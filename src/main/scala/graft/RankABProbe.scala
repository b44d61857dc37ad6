package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-box A/B for the round-17 grouped order-statistic reshape:
  * the round-16 per-group WINDOW sort (parallelism = group count —
  * 5 event types = 5 tasks whatever the cluster) replicated inline,
  * vs the shipped [[graft.ops.Prefix.rankByGroup]] range-exchange
  * forms of trimmedMeanByGroup and robustStatsByGroup. Arms must be
  * row-identical (exact integer statistics).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/events/x100 \
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.RankABProbe
  *
  * Results in NOTES.md ("rank-ab").
  */
object RankABProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/events/x100")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val vExpr = expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)")

    import org.apache.spark.sql.expressions.Window
    def trimmedOld(): DataFrame = { // the r16 window form, verbatim shape
      val base = ev.select(col("event_type").as("g"), vExpr.as("v"))
        .filter(col("g").isNotNull && col("v").isNotNull)
      val grp = Window.partitionBy(col("g"))
      base
        .withColumn("__rn", row_number().over(grp.orderBy(col("v").asc)))
        .withColumn("__n", count(lit(1)).over(grp))
        .withColumn("__lo", expr("(__n * 500L) div 10000L"))
        .groupBy(col("g"))
        .agg(max(col("__n")).as("n"),
          coalesce(sum(when(col("__rn") > col("__lo") &&
            col("__rn") <= col("__n") - col("__lo"), 1L)), lit(0L))
            .as("n_kept"),
          coalesce(sum(when(col("__rn") > col("__lo") &&
            col("__rn") <= col("__n") - col("__lo"),
            col("v").cast("decimal(38,0)"))),
            lit(0L).cast("decimal(38,0)")).as("__sum"))
        .select(col("g"), col("n"), col("n_kept"),
          col("__sum").cast("long").as("sum_kept"))
    }
    def trimmedNew(): DataFrame =
      graft.ops.Profile.trimmedMeanByGroup(ev, col("event_type"), vExpr,
        trimBp = 500).select("g", "n", "n_kept", "sum_kept")

    def robustOld(): DataFrame = {
      val base = ev.select(col("event_type").as("g"), vExpr.as("v"))
        .filter(col("g").isNotNull && col("v").isNotNull)
      val grp = Window.partitionBy(col("g"))
      val byV = grp.orderBy(col("v").asc)
      val ranked = base
        .withColumn("__rn", row_number().over(byV))
        .withColumn("__n", count(lit(1)).over(grp))
        .withColumn("__med", max(when(
          col("__rn") <= expr("(__n + 1) div 2"), col("v"))).over(grp))
      val byDev = grp.orderBy(abs(col("v") - col("__med")).asc)
      ranked
        .withColumn("__rnd", row_number().over(byDev))
        .withColumn("__mad", max(when(
          col("__rnd") <= expr("(__n + 1) div 2"),
          abs(col("v") - col("__med")))).over(grp))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), max(col("__med")).as("median"),
          max(col("__mad")).as("mad"))
    }
    def robustNew(): DataFrame =
      graft.ops.Profile.robustStatsByGroup(ev, col("event_type"), vExpr)

    def sig(df: DataFrame): String =
      df.collect().map(_.toString).sorted.mkString("|").hashCode.toString
    def medianSec(body: => String): (Double, String) = {
      var s: String = null
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        s = body
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (times(times.length / 2), s)
    }
    for ((label, arm) <- Seq(
        "trimmed-window" -> (() => trimmedOld()),
        "trimmed-range " -> (() => trimmedNew()),
        "robust-window " -> (() => robustOld()),
        "robust-range  " -> (() => robustNew()))) {
      val (t, s) = medianSec(sig(arm()))
      println(f"[rank-ab] $sfDir $label: $t%.2f s (sig=$s)")
    }
    spark.stop()
  }
}
