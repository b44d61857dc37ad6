package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale ladder for the round-17 statistics operators (the >1 s set
  * from the sf0.1 bench): weightedQuantilesByGroup (q201),
  * kendallTau (q204), quantileMapByGroup (q206), hashBootstrapMean
  * (q207) — all driven over the events scale rungs so the exponent
  * between x10 and x100 is comparable with the rank-stats family's
  * (NOTES "rank ladder"). Column choices mirror the queries' shapes:
  * value cents as the measure, bounded buckets for Kendall's cells.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/events/x10 \
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.StatLadderProbe
  *
  * Results in NOTES.md ("stat ladder").
  */
object StatLadderProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/events/x10")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val vExpr = expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)")

    def wq(): DataFrame =
      graft.ops.RankStats.weightedQuantilesByGroup(ev,
        col("event_type"), vExpr,
        expr("CAST(event_id AS BIGINT) % 97 + 1"),
        Seq(2500, 5000, 7500, 9900))
    def kt(): DataFrame =
      graft.ops.RankStats.kendallTau(ev,
        expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) " +
          "div 100000"),
        expr("CAST(user_id AS BIGINT) % 50"))
    def qm(): DataFrame =
      graft.ops.RankStats.quantileMapByGroup(
        ev.filter(col("value").isNotNull), col("event_type"), vExpr)
    def bs(): DataFrame =
      graft.ops.Sampling.hashBootstrapMean(
        ev.filter(col("value").isNotNull), col("event_type"),
        col("event_id"), vExpr, reps = 32)

    def sig(df: DataFrame): String =
      df.collect().map(_.toString).sorted.mkString("|")
        .hashCode.toString
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
        "weighted-quantiles" -> (() => wq()),
        "kendall-tau       " -> (() => kt()),
        "quantile-map      " -> (() => qm()),
        "bootstrap-ci      " -> (() => bs()))) {
      val (t, s) = medianSec(sig(arm()))
      println(f"[stat-ladder] $sfDir $label: $t%.2f s (sig=$s)")
    }
    spark.stop()
  }
}
