package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for the n-gram df join-back strategy (round-16 verdict #1):
  * `ngramNovelty` consumes the gram exchange twice — once to count
  * document frequencies, once to join them back. Catalyst's default
  * broadcasts the aggregated df table, which re-executes the shingle
  * kernel for the broadcast branch (two map passes over the corpus);
  * pinning the join to sort-merge lets ReuseExchange serve the df
  * branch from the same shuffle files (one kernel pass, two shuffle
  * reads). This probe times both arms at a docs rung, checks the
  * arms content-hash-equal, and counts parquet scans / reused
  * exchanges in the FINAL adaptive plan of each. It also reports the
  * scan count of `ngramWeightedJaccard` (two consumers of the grouped
  * inverted index — same reuse question one level up).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/docs/x100 \
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.GramReuseProbe
  *
  * Results in NOTES.md ("gramreuse").
  */
object GramReuseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/docs/x30")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def novelty(strategy: String): DataFrame =
      graft.dedup.Dedup.ngramNoveltyImpl(docs, col("doc_id"), col("text"),
        shingleK = 8, charsHint = -1L, strategy = strategy)

    def sig(df: DataFrame): (Long, String) = {
      val h = df.select(xxhash64(df.columns.map(col): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)), sum(col("h"))).first()
      (h.getLong(0), String.valueOf(h.getDecimal(1)))
    }
    // ground truth, not plan text: AQE finalizes (and may reuse
    // stages) only at runtime, so count the BYTES each arm actually
    // reads from the source and shuffles — a second kernel pass shows
    // up as ~2x input bytes whatever the plan string claims
    val inBytes = new java.util.concurrent.atomic.AtomicLong
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            inBytes.addAndGet(m.inputMetrics.bytesRead)
            shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    def ioOfOneRun(df: DataFrame): (Double, Double) = {
      Thread.sleep(500) // listener bus is async; let prior events drain
      inBytes.set(0L); shufBytes.set(0L)
      df.queryExecution.toRdd.foreachPartition(_ => ()) // this QE's plan
      Thread.sleep(500)
      (inBytes.get / 1e6, shufBytes.get / 1e6)
    }
    def medianSec(body: => (Long, String)): (Double, (Long, String)) = {
      var s: (Long, String) = null
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        s = body
        spark.catalog.clearCache() // cold per iteration (wj caches)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (times(times.length / 2), s)
    }

    for (strategy <- Seq("broadcast", "merge", "window")) {
      val (inMB, shufMB) = ioOfOneRun(novelty(strategy))
      val (t, s) = medianSec(sig(novelty(strategy)))
      println(f"[gramreuse] $sfDir novelty $strategy: $t%.2f s " +
        f"(n=${s._1}, sig=${s._2.take(12)}…, input=$inMB%.1f MB, " +
        f"shuffleWrite=$shufMB%.1f MB)")
    }
    // weightedJaccard A/B: the round-15 two-branch form (pairsW and
    // docW each re-derive the grouped inverted index — kernel runs
    // 3x) replicated inline, vs the shipped unified-emission form.
    // q187's exact params (threshold 0.3, maxDf 100).
    def wjOld(): DataFrame = {
      import spark.implicits._
      val maxDf = 100
      val parts = graft.ops.Sizing.groupingPartitions(
        graft.ops.Sizing.charsEstimate(docs).get, 24L,
        spark.sparkContext.defaultParallelism,
        targetBytesPerTask = 64L << 20)
      val nDocs = docs.filter(col("text").isNotNull &&
        length(col("text")) >= 8).count()
      val lN = graft.functions.Dsir.ilog2Fx(nDocs)
      val wdf = (1 to maxDf)
        .map(d => (d.toLong, lN - graft.functions.Dsir.ilog2Fx(d.toLong)))
        .toDF("df", "w")
      val grams = graft.dedup.Dedup.shingleDocs(
          docs, col("doc_id"), col("text"), 8)
        .select(col("id"), explode(col("vms")).as("sh"))
        .repartition(parts, col("sh"))
      val groups = grams.groupBy("sh")
        .agg(call_function("collect_list_capped",
          col("id"), lit(maxDf)).as("ids"), count(lit(1)).as("df"))
        .filter(col("df") <= maxDf)
        .join(broadcast(wdf), Seq("df"))
      val pairExpr = explode(expr(
        """flatten(transform(ids, x ->
             filter(transform(ids, y ->
               IF(x < y, struct(x AS id1, y AS id2), NULL)),
             z -> z IS NOT NULL)))""")).as("e")
      val pairsW = groups
        .select(pairExpr, col("w").as("__w"))
        .select(col("e.id1").as("id1"), col("e.id2").as("id2"), col("__w"))
        .groupBy("id1", "id2").agg(sum(col("__w")).as("inter_w"))
      val docW = groups.select(explode(col("ids")).as("id"), col("w"))
        .groupBy("id").agg(sum(col("w")).as("tw"))
      pairsW
        .join(docW.select(col("id").as("id1"), col("tw").as("w1")),
          Seq("id1"))
        .join(docW.select(col("id").as("id2"), col("tw").as("w2")),
          Seq("id2"))
        .withColumn("__den", col("w1") + col("w2") - col("inter_w"))
        .filter(col("__den") > 0L)
        .withColumn("wjaccard",
          col("inter_w").cast("double") / col("__den").cast("double"))
        .filter(col("wjaccard") >= 0.3)
        .select("id1", "id2", "inter_w", "w1", "w2", "wjaccard")
    }
    def wjNew(): DataFrame = graft.dedup.Dedup.ngramWeightedJaccard(docs,
      col("doc_id"), col("text"), shingleK = 8, threshold = 0.3,
      maxDf = 100)
    for ((label, arm) <- Seq("old3pass" -> (() => wjOld()),
        "unified" -> (() => wjNew()))) {
      val (wIn, wShuf) = ioOfOneRun(arm())
      val (wt, ws) = medianSec(sig(arm()))
      println(f"[gramreuse] $sfDir weightedJaccard $label: $wt%.2f s " +
        f"(n=${ws._1}, sig=${ws._2.take(12)}…, input=$wIn%.1f MB, " +
        f"shuffleWrite=$wShuf%.1f MB)")
    }
    spark.stop()
  }
}
