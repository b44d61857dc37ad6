package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures `Graphs.coOccurrenceEdges`' member-collect exchange sizing
  * (the round-15 `numPartitions` knob) on a graphco rung: the q172
  * shape (full lineitem, minWeight = 2) built with the session-default
  * 32 partitions vs an explicitly sized count, with a content-hash
  * equality check between the arms (partitioning must never change the
  * edge set). The x100 rung (60M memberships) ran 12g heap at the
  * allocation-pressure edge with 32 partitions — this probe records
  * what sizing buys.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/graphco/x100 \
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g \
  *   GRAFT_PARTS=128 tools/run_main.sh graft.GraphPartsProbe
  *
  * Results in NOTES.md ("graphparts").
  */
object GraphPartsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/graphco/x30")
    val explicitParts = sys.env.getOrElse("GRAFT_PARTS", "128").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(parts: Int): DataFrame = graft.ops.Graphs.coOccurrenceEdges(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("l_orderkey"), col("l_partkey"), minWeight = 2L,
        numPartitions = parts)
      .select(col("a"), col("b"), col("w"))

    def sig(df: DataFrame): (Long, String) = {
      val h = df.select(xxhash64(df.columns.map(col): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)), sum(col("h"))).first()
      (h.getLong(0), String.valueOf(h.getDecimal(1)))
    }
    def medianSec(body: => (Long, String)): (Double, (Long, String)) = {
      var s: (Long, String) = null
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        s = body
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (times(times.length / 2), s)
    }

    val (tAuto, sAuto) = medianSec(sig(edges(graft.ops.Sizing.Auto)))
    val (tSized, sSized) = medianSec(sig(edges(explicitParts)))
    // Auto is no longer the bare session parallelism: round 19 sizes
    // it from plan-statistics memberships at 8 B/row, 32 MB/task
    println(f"[graphparts] $sfDir auto: $tAuto%.2f s " +
      f"(n=${sAuto._1}, sig=${sAuto._2.take(12)}…)")
    println(f"[graphparts] $sfDir parts=$explicitParts: $tSized%.2f s " +
      f"(n=${sSized._1}, sig=${sSized._2.take(12)}…)")
    println(s"[graphparts] arms_equal=${sAuto == sSized}")
    spark.stop()
  }
}
