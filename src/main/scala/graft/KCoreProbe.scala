package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core scale ladder over the co-order part graph (q152's exact
  * shape: parts sharing ≥ 2 orders, 2-core by default) on the
  * `graphco` rungs — x1 = sf0.1, x3/x10/x30 replicas in DISJOINT id
  * spaces, so rungs scale the peel's breadth (more components), not
  * its depth. Expected cost split: the edge build (distinct + one
  * pair-count exchange) dominates; each peel round is a
  * map-side-combined degree agg + two broadcast-gated semi-joins of a
  * shrinking edge set. Per rung this prints median-of-3 wall-clock,
  * the edge/core sizes, and a forced-shuffle-arm run (gate=0) with a
  * content-hash equality check — the KCoreSpec arm invariant
  * re-checked at scale.
  *
  *   python3 tools/gen_scale_rungs.py --families graphco
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/graphco/x10 \
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.KCoreProbe
  *
  * `GRAFT_KCORE_K` overrides k; `GRAFT_SKIP_FORCED=1` times only the
  * default arm. Results in NOTES.md ("kcore ladder").
  */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/graphco/x3")
    val k = sys.env.getOrElse("GRAFT_KCORE_K", "2").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(): DataFrame = graft.ops.Graphs.coOccurrenceEdges(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("l_orderkey"), col("l_partkey"), minWeight = 2L)
      .select(col("a"), col("b"))

    // GraphGateProbe's content signature: per-row xxhash64 summed in
    // DECIMAL(38,0) (ANSI long-sum overflows immediately on hashes)
    def sig(df: DataFrame): (Long, String) = {
      val h = df.select(xxhash64(df.columns.map(col): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)), sum(col("h"))).first()
      (h.getLong(0), String.valueOf(h.getDecimal(1)))
    }
    def medianSec(body: => DataFrame): (Double, (Long, String)) = {
      var s: (Long, String) = null
      val times = (0 to 3).map { _ =>
        val t0 = System.nanoTime()
        s = sig(body)
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        sec
      }.drop(1).sorted
      (times(times.length / 2), s)
    }

    val nEdges = edges().count()
    val (sec, sg) = medianSec(graft.ops.KCore.kCore(
      edges(), col("a"), col("b"), k = k, maxRounds = 20))
    val forced = sys.env.get("GRAFT_SKIP_FORCED").isEmpty
    val (secSh, sgSh) =
      if (forced) medianSec(graft.ops.KCore.kCore(
        edges(), col("a"), col("b"), k = k, maxRounds = 20,
        broadcastNodesUpTo = 0L))
      else (0.0, sg)
    println(s"""{"metric":"kcore_ladder","sf":"$sfDir","k":$k,""" +
      s""""edges_w2":$nEdges,"core_nodes":${sg._1},"sec":$sec,""" +
      s""""sec_shuffle_arm":$secSh,"arms_equal":${sg == sgSh}}""")
    spark.stop()
  }
}
