package graft

/** Physical-plan inspection for any catalog query on any rung: prints
  * the join/exchange/aggregate node mix of the ADAPTIVE final plan
  * after one executed run, plus wall-clock — the tool for "why does
  * this rung time differently" questions that ITERS medians can't
  * answer (e.g. the q55 x30-vs-x100 inversion, NOTES.md):
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/docs/x30 \
  *   SPARK_GRAFT_QUERY=q55_line_dedup SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.PlanProbe"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q55_line_dedup")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = SparkEntry.queries(qname)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    // executedPlan AFTER execution = AQE's final adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    def c(pat: String) = pat.r.findAllIn(plan).length
    println(s"""{"metric":"plan_probe","query":"$qname","sf":"$sfDir",""" +
      s""""rows":$n,"sec":$sec,""" +
      s""""smj":${c("SortMergeJoin")},"shj":${c("ShuffledHashJoin")},""" +
      s""""bhj":${c("BroadcastHashJoin")},"bnlj":${c("BroadcastNestedLoop")},""" +
      s""""exchanges":${c("Exchange")},"aqe_shuffle_reads":${c("AQEShuffleRead")},""" +
      s""""hashaggs":${c("HashAggregate")},"objhashaggs":${c("ObjectHashAggregate")},""" +
      s""""sortaggs":${c("SortAggregate")},"sorts":${c("(?m)^.*\\bSort\\b")}}""")
    sys.env.get("SPARK_GRAFT_PLAN_DUMP").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), plan.getBytes)
    }
    spark.stop()
  }
}
