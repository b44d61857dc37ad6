package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-side scan diagnostics (like [[ProfileDedup]], not library
  * surface): attribute the measured gap between the nanos-timestamp
  * events fixture and a micros-rewritten copy of the same rows.
  *
  * Usage: runMain graft.tools.ScanProbe <fileA.parquet> [fileB.parquet]
  * Prints per-file warm timings of (a) a pruned non-ts aggregate and
  * (b) a ts-touching aggregate, so "whole-scan slow" vs "ts-column
  * slow" is a one-look answer.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions
      .builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
        32)
      .appName("graft-scanprobe").getOrCreate()
    try {
      args.foreach { path =>
        val df = spark.read.parquet(path)
        val tsIsLong = df.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType
        def time(tag: String)(f: => Unit): Unit = {
          f // warm
          val runs = (1 to 3).map { _ =>
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          println(f"[scanprobe] $path $tag median=${runs.sorted.apply(1)}%.3f")
        }
        time("value-only")(df.selectExpr("sum(value)").collect())
        time("ts-agg")(
          if (tsIsLong) df.selectExpr("max(ts)").collect()
          else df.selectExpr("max(unix_micros(ts))").collect())
        time("all-cols")(df.selectExpr("count(distinct event_type)",
          "max(length(props))").collect())
        // mimic q76 end-to-end on this file
        import org.apache.spark.sql.functions._
        val ev = if (tsIsLong)
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
        else df
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("value").as("view_value"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value")
        time("asof")(
          graft.ops.TemporalJoin.asofJoin(purchases, views,
            Seq("user_id"), "ts", "ts", Seq("view_value"),
            toleranceMicros = Some(86400L * 1000000L)).collect())
      }
    } finally spark.stop()
  }
}
