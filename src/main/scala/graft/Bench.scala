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
  *
  * Self-diagnosis (round 10): a capture taken on a loaded box is
  * indistinguishable from a regression unless the JSON itself carries the
  * evidence. Three additions make a polluted capture identifiable without
  * a quiet-box rerun:
  *   - `load_start`/`load_end`: the OS 1-minute load average before the
  *     first and after the last run (this box has 32 hardware threads; a
  *     load far above the bench's own footprint means contention);
  *   - `control`: the FIRST query of the suite re-timed at suite END
  *     (median of the same iteration count). If the box degraded while
  *     the suite ran, the control median drifts above the in-suite median
  *     (`control_ratio` >> 1) even though the code is identical;
  *   - per-query medians re-printed as CHUNKED short lines
  *     (`"metric":"queries_chunk"`, ~8 queries each) so a tail-biased
  *     log truncation can never erase the head of the catalog again
  *     (BENCH_r09 lost q01–q61's per-query data that way).
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
    // ALSO counted into the JSON line, where nothing can grep past them.
    // A DEAD SparkContext is different from a failed query: once the
    // context stops (executor OOM at an oversized rung killed it in the
    // round-12 docs-x300 first attempt), every later query "fails" in
    // milliseconds and the capture reads as a 3-query regression instead
    // of one resource event. Detect it and SKIP the rest, flagged.
    val failed = scala.collection.mutable.Set.empty[String]
    var contextDead = false
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        if (spark.sparkContext.isStopped) {
          contextDead = true
          System.err.println(s"[bench] SparkContext is stopped — skipping remaining queries")
        }
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (!contextDead)
        spark.catalog.clearCache() // caches are per-query internals, not carryover
      sec
    }

    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    require(iters >= 1, s"SPARK_GRAFT_ITERS must be >= 1, got $iters")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadAvg: Double = osBean.getSystemLoadAverage // -1.0 if unavailable
    val loadStart = loadAvg

    // Suite-head warmup (round-12 verdict #5): JVM-global warmup (JIT
    // of the scan/agg/shuffle hot paths, codegen infrastructure, Janino)
    // used to land on whichever queries ran first — q01/q16 swung ±50%
    // round-over-round from suite POSITION, not code (r12 evidence: q01
    // in-suite median 1.15 s vs end-of-suite control re-time 0.77 s).
    // Two untimed runs of the suite's first query absorb that warmup
    // before any timed iteration starts. The seconds are reported
    // (`warmup_sec`) but charged to no query; per-query `cold` runs
    // still capture each PLAN's first-compile cost, so `cold_total`
    // keeps its meaning as the per-plan-codegen signal.
    val warmupSec = selected.headOption match {
      case Some((name, fn)) if !contextDead =>
        val s = runOne(name, fn) + runOne(name, fn)
        failed -= name // a warmup failure must not discredit the timed runs
        s
      case _ => 0.0
    }

    // Interleaved: untimed warm run immediately followed by the timed
    // iterations of the same query — back-to-back so the plan's generated
    // classes stay resident in the (LRU-bounded) codegen cache.
    val runs = selected.flatMap { case (name, fn) =>
      if (contextDead) None
      else {
        val cold = runOne(name, fn)
        val timed = Seq.fill(iters)(runOne(name, fn)).sorted
        Some((name, cold, timed))
      }
    }
    val skipped = selected.map(_._1).filterNot(n => runs.exists(_._1 == n))
    val cold = runs.map(_._2).sum
    // xs is pre-sorted; even lengths average the two middle elements
    def median(xs: Seq[Double]): Double =
      if (xs.length % 2 == 1) xs(xs.length / 2)
      else (xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2.0
    val results = runs.map { case (name, _, t) => (name, median(t), t.head, t.last) }

    // Control: re-time the suite's first query at suite end under the
    // SAME protocol as its in-suite runs (one untimed warm first —
    // after 100+ intervening queries the codegen cache has evicted the
    // plan, and without the warm discard an ITERS=1 control would BE a
    // cold run, a built-in false positive). Any drift vs the in-suite
    // median is then box-state change, not a code regression. Control
    // failures must not poison the suite's `failed` list — the
    // in-suite medians they would discredit are valid; they get their
    // own flag.
    val failedBeforeControl = failed.toSet
    val (control, controlRatio) = selected.headOption match {
      case _ if contextDead =>
        (0.0, -1.0) // no live context to re-time against
      case Some((name, _)) if failedBeforeControl.contains(name) =>
        // The baseline median is a failure timing — any ratio against
        // it is garbage. Sentinel instead of a fake-clean ~1.0.
        (0.0, -1.0)
      case Some((name, fn)) =>
        runOne(name, fn) // untimed warm, mirroring the in-suite runs
        val end = median(Seq.fill(iters)(runOne(name, fn)).sorted)
        val inSuite = results.find(_._1 == name).map(_._2).getOrElse(end)
        (end, if (inSuite > 0) end / inSuite else 1.0)
      case None => (0.0, 1.0)
    }
    val controlFailed = (failed.toSet -- failedBeforeControl).nonEmpty ||
      controlRatio < 0
    failed.clear(); failed ++= failedBeforeControl

    // FLOP-bound control (round 15, VERDICT r14): the shuffle control
    // above catches exchange-path box degradation but is blind to CPU
    // throttling — r14's driver box ran the kernel-bound queries 7–21×
    // slower than the builder capture of the SAME tree while the
    // shuffle control sat at 0.92. This is a FIXED synthetic workload
    // (4000 LCG-derived 64-dim vectors, every 8th as a query, brute
    // cosine top-10 through the production kernel — ~128M mul-adds,
    // data-independent, ~0.5 s on a healthy 32-thread box), so its
    // seconds compare across captures: a capture whose flop_control is
    // several× another's was taken on a throttled/oversubscribed box,
    // and its kernel-bound per-query numbers are box, not code.
    val flopControl: Double =
      if (contextDead) -1.0
      else try {
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val dim = 64
        val vecs = (0 until 4000).map { i =>
          var s = i.toLong
          val a = Array.fill(dim) {
            s = s * 6364136223846793005L + 1442695040888963407L
            ((s >>> 33) % 2000L - 1000L).toFloat / 1000f
          }
          (i.toLong, a)
        }
        val corpus = spark.createDataset(vecs)
          .toDF("vec_id", "embedding")
          .repartition(spark.sparkContext.defaultParallelism)
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.similarity.Similarity.bruteForceTopK(
              corpus = corpus,
              queries = corpus.filter(col("vec_id") % 8 === 0),
              idCol = "vec_id", vecCol = "embedding", k = 10)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // untimed warm — same protocol as every suite query
        median(Seq.fill(iters)(once()).sorted)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] flop control failed: ${e.getMessage}")
        -1.0
      }
    val loadEnd = loadAvg

    val qs = results.map { case (k, med, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, lo, hi) => "\"" + k + "\":[" + lo + "," + hi + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    def f2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val skippedJson = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    val diag = s""""load_start":${f2(loadStart)},"load_end":${f2(loadEnd)},"warmup_sec":${f2(warmupSec)},"control":${f2(control)},"control_ratio":${f2(controlRatio)},"control_failed":$controlFailed,"flop_control":${f2(flopControl)},"context_dead":$contextDead,"skipped":$skippedJson"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$cold,"iters":$iters,"failed":$failedJson,$diag,"queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    // Short trailing lines: the r7/r9 driver captures truncated the long
    // line (r9 lost the per-query HEAD). Everything below is re-printed in
    // lines small enough that tail-biased truncation preserves them.
    results.grouped(8).foreach { grp =>
      val chunk = grp.map { case (k, med, lo, hi) =>
        "\"" + k + "\":[" + f2(med) + "," + f2(lo) + "," + f2(hi) + "]"
      }.mkString("{", ",", "}")
      println(s"""{"metric":"queries_chunk","medlohi":$chunk}""")
    }
    // Truncation-proof BY CONSTRUCTION (round-10 verdict #3): the
    // complete capture — every per-query [median, lo, hi] plus the
    // summary diagnostics — is also written to a JSON FILE, so the
    // artifact no longer depends on how much stdout the driver's
    // capture window keeps. The summary line names the path.
    // Subset guard (round-12 verdict #6): a SPARK_GRAFT_QUERIES run must
    // not clobber the round's full-catalog artifact — the judge had to
    // restore bench_full.json by hand after a subset re-measure. Subset
    // captures go to a name keyed by the subset's hash; an explicit
    // SPARK_GRAFT_BENCH_OUT always wins.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", only match {
      case Some(qs) =>
        val h = Integer.toHexString(qs.toSeq.sorted.mkString(",").hashCode)
        s"/root/repo/bench_subset_$h.json"
      case None => "/root/repo/bench_full.json"
    })
    val medlohi = results.map { case (k, med, lo, hi) =>
      "\"" + k + "\":[" + f2(med) + "," + f2(lo) + "," + f2(hi) + "]"
    }.mkString("{", ",", "}")
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$cold,"iters":$iters,"nqueries":${results.length},"failed":$failedJson,$diag,"medlohi":$medlohi,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fullJson + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","cold_total":$cold,"iters":$iters,"nqueries":${results.length},"failed":$failedJson,$diag,"full_json":"$outPath","sf":"$sfDir"}""")
    // Repeat the complete per-query line as the FINAL stdout line (round-17
    // verdict #2): the driver's capture window is tail-biased, so the
    // identical line printed FIRST (above) has been lost since r14 and
    // PERF_r*.json's per_query map has come back empty. Printing it again
    // here — after the chunks and the summary — puts the full
    // {"metric":"total",…,"queries":{…}} payload where tail capture keeps
    // it. Pure addition: every previously-emitted line is unchanged.
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$cold,"iters":$iters,"failed":$failedJson,$diag,"queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
  }
}
