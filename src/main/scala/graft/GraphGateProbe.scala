package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the graph family's broadcast/shuffle arm switch
  * (ops/PageRank.scala `DefaultBroadcastNodesUpTo`, shared by
  * Hits/LabelProp): every ladder rung through round 9 (≤630k nodes)
  * stayed on the broadcast arm, so the 2M-node crossover — the arm
  * that matters at 100 TB — had only ever run when FORCED via
  * `GRAFT_BROADCAST_NODES_UP_TO=0`. The x100 graph rung (~2.1M nodes,
  * 60M edge rows) crosses the gate ORGANICALLY; this probe pins, per
  * operator (q90 pagerank / q92 hits / q95 label-prop shapes):
  *
  *  - the node count vs the gate (whether the default-arm run below
  *    took the shuffle path is then a deterministic fact of the gate's
  *    `if`, not an inference from timings);
  *  - wall-clock of the DEFAULT arm vs the FORCED-broadcast arm
  *    (explicit `broadcastNodesUpTo = Long.MaxValue`) at the same
  *    rung — is 2M still the right gate value?
  *  - output equality between the arms (count + content hash), the
  *    spec-pinned invariant re-checked at scale.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/graph/x100 \
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ITERS=3 \
  *   sbt "runMain graft.GraphGateProbe"
  *
  * `SPARK_GRAFT_OPS=labelprop` (comma list) restricts the arm A/B to
  * named operators — re-measuring one op's arms doesn't pay for all
  * three (round-10 verdict #4: labelprop's median-of-3 rerun).
  *
  * `GRAFT_PROBE_KIND=depth` runs the round-11 PageRank DEPTH ladder
  * instead: iters ∈ {5,10,20,40} with the default 5-round lineage cut
  * vs cuts disabled, pinning that per-iteration cost is flat under
  * truncation and superlinear without it (ops/PageRank.scala
  * `LineageCutEvery`). Output equality between the arms is asserted
  * per rung.
  *
  * Results in NOTES.md ("graph broadcast gate crossed organically";
  * round 11 "PageRank depth ladder").
  */
object GraphGateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/graph/x100")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pairs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").as("p"),
        (col("l_suppkey") + 10000000L).as("sp")).distinct()
    // q90/q95's bidirectional edge shape; q92 uses the directed pairs
    val bidir = pairs.select(explode(array(
        struct(col("p").as("src"), col("sp").as("dst")),
        struct(col("sp").as("src"), col("p").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val nodes = bidir.select(col("src")).distinct().count()
    val gate = graft.ops.PageRank.DefaultBroadcastNodesUpTo
    val organicArm = if (nodes <= gate) "broadcast" else "shuffle"

    // content hash over the full result — arm equality at scale, not
    // just row counts. Per-row xxhash64 summed as DECIMAL(38,0):
    // ANSI mode (Spark 4 default) throws on long-sum overflow, which
    // random 64-bit hashes hit immediately — the repo's dsum
    // discipline applies to probes too.
    def sig(df: DataFrame): (Long, String) = {
      val h = df.select(xxhash64(df.columns.map(col): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)), sum(col("h"))).first()
      (h.getLong(0), String.valueOf(h.getDecimal(1)))
    }
    def medianSec(body: => DataFrame): (Double, (Long, String)) = {
      var s: (Long, String) = null
      val times = (0 to iters).map { _ =>
        val t0 = System.nanoTime()
        s = sig(body)
        val sec = (System.nanoTime() - t0) / 1e9
        // Bench's hygiene: repeated in-JVM runs accumulate cache and
        // checkpoint blocks otherwise (an 8-run labelprop sequence
        // exhausted storage memory without this)
        spark.catalog.clearCache()
        sec
      }.drop(1).sorted // first run is the untimed-warm discard
      val med =
        if (times.isEmpty) 0.0
        else if (times.length % 2 == 1) times(times.length / 2)
        else (times(times.length / 2 - 1) + times(times.length / 2)) / 2
      (med, s)
    }

    if (sys.env.getOrElse("GRAFT_PROBE_KIND", "gate") == "lpfrontier") {
      // Round-13 feasibility gate for delta (active-set) label
      // propagation: the classic win is a GEOMETRICALLY SHRINKING
      // frontier (nodes whose label changed last round) — but our
      // graph-family shape is bipartite (part ↔ supplier), where the
      // SYNCHRONOUS update rule can oscillate and the frontier never
      // shrinks. Replays LabelProp's exact vote/argmax rounds and
      // counts changed labels per round: if the frontier stays O(N),
      // delta iteration buys nothing here and is not built (verdict
      // #7's "measure before building").
      val itersLp = sys.env.getOrElse("GRAFT_LP_ITERS", "6").toInt
      val e = bidir.select(col("src").as("u"), col("dst").as("v")).persist()
      var labels = e.select(col("u").as("id"))
        .union(e.select(col("v").as("id"))).distinct()
        .withColumn("lbl", col("id")).localCheckpoint()
      for (it <- 1 to itersLp) {
        val votes = e.join(
          labels.withColumnRenamed("id", "u").hint("shuffle_hash"),
          Seq("u"))
          .groupBy(col("v").as("id"), col("lbl"))
          .agg(count(lit(1)).as("c"))
        val best = votes.groupBy("id")
          .agg(min(struct((-col("c")).as("nc"), col("lbl"))).as("m"))
          .select(col("id"), col("m.lbl").as("new_lbl"))
        val next = labels.join(best, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("new_lbl"), col("lbl")).as("lbl"))
          .localCheckpoint()
        val changed = next.withColumnRenamed("lbl", "lbl2")
          .join(labels, Seq("id"))
          .filter(col("lbl") =!= col("lbl2")).count()
        println(s"""{"metric":"lp_frontier","sf":"$sfDir",""" +
          s""""round":$it,"nodes":$nodes,"changed":$changed,""" +
          s""""frac":${changed.toDouble / nodes}}""")
        labels = next
      }
      e.unpersist(); spark.stop(); return
    }

    if (sys.env.getOrElse("GRAFT_PROBE_KIND", "gate") == "trustwalk") {
      // Round-16 graph additions at rung scale: trustRank (q147's
      // shape — seeds = parts ≡ 0 mod 50) and RandomWalk (q148's —
      // starts = parts ≡ 0 mod 100, 3 steps). trustRank shares
      // pageRank's per-iteration kernel, so past the 2M-node gate the
      // x100 rung exercises its SHUFFLE arm organically; walks ride
      // one persisted ranked adjacency, so the expectation is
      // adjacency-build-bounded cost, ~flat in walk count.
      val seeds = pairs.select(col("p").as("sid"))
        .filter(col("sid") % 50 === 0).distinct()
      val starts = pairs.select(col("p").as("w"))
        .filter(col("w") % 100 === 0).distinct()
      val (secTr, sigTr) = medianSec(graft.ops.PageRank.trustRank(
        bidir, col("src"), col("dst"), seeds, col("sid"), iters = 3))
      val (secWk, sigWk) = medianSec(graft.ops.RandomWalk.walks(
        bidir, col("src"), col("dst"), starts, col("w"),
        steps = 3, salt = "rw"))
      println(s"""{"metric":"trustwalk","sf":"$sfDir","nodes":$nodes,""" +
        s""""arm":"$organicArm","sec_trustrank":$secTr,""" +
        s""""trust_rows":${sigTr._1},"sec_walks":$secWk,""" +
        s""""walk_rows":${sigWk._1}}""")
      spark.stop(); return
    }

    if (sys.env.getOrElse("GRAFT_PROBE_KIND", "gate") == "depth") {
      // PageRank depth ladder: per-iteration cost must stay flat with
      // the 5-round lineage cut and is expected superlinear without it
      // (the uncut plan adds one join+agg layer per round; optimizer
      // time grows quadratically). Same rung, same gate, arm equality
      // asserted per depth.
      for (it <- Seq(5, 10, 20, 40)) {
        val (secCut, sigCut) = medianSec(graft.ops.PageRank.pageRank(
          bidir, col("src"), col("dst"), iters = it))
        val (secUncut, sigUncut) = medianSec(graft.ops.PageRank.pageRank(
          bidir, col("src"), col("dst"), iters = it,
          lineageCutEvery = Int.MaxValue))
        println(s"""{"metric":"pagerank_depth","sf":"$sfDir",""" +
          s""""iters":$it,"sec_cut":$secCut,"sec_uncut":$secUncut,""" +
          s""""per_iter_cut":${secCut / it},""" +
          s""""rows":${sigCut._1},"arms_equal":${sigCut == sigUncut}}""")
      }
      spark.stop(); return
    }

    val ops: Seq[(String, Long => DataFrame)] = Seq(
      ("pagerank", (g: Long) => graft.ops.PageRank.pageRank(
        bidir, col("src"), col("dst"), iters = 3,
        broadcastNodesUpTo = g)),
      ("hits", (g: Long) => graft.ops.Hits.hits(
        pairs, col("p"), col("sp"),
        // round-13 attribution levers: vary rounds (marginal cost per
        // iteration) and the lineage-cut cadence (checkpoint term vs
        // edge-join message pass) independently
        iters = sys.env.getOrElse("GRAFT_HITS_ITERS", "2").toInt,
        broadcastNodesUpTo = g,
        cutEveryHalfRounds =
          sys.env.getOrElse("GRAFT_HITS_CUT_EVERY", "1").toInt)),
      ("labelprop", (g: Long) => graft.ops.LabelProp.labelPropagation(
        bidir, col("src"), col("dst"),
        // round-12 attribution lever: vary algorithm rounds to split
        // the fixed prefix (node distinct + count) from per-round cost
        iters = sys.env.getOrElse("GRAFT_LP_ITERS", "2").toInt,
        broadcastNodesUpTo = g)))
    val opFilter = sys.env.get("SPARK_GRAFT_OPS")
      .map(_.split(",").map(_.trim).toSet)

    // GRAFT_SKIP_FORCED=1: time only the default arm — the per-round
    // marginal-cost attribution (vary GRAFT_LP_ITERS) doesn't need the
    // broadcast control and quiet-box time is the scarce resource
    val skipForced = sys.env.get("GRAFT_SKIP_FORCED").contains("1")
    ops.filter { case (n, _) => opFilter.forall(_.contains(n)) }
      .foreach { case (name, run) =>
      val (secDefault, sigDefault) = medianSec(run(gate))
      if (skipForced) {
        println(s"""{"metric":"graph_gate_$name","sf":"$sfDir",""" +
          s""""nodes":$nodes,"gate":$gate,"organic_arm":"$organicArm",""" +
          s""""sec_default":$secDefault,"rows":${sigDefault._1}}""")
      } else {
        val (secBcast, sigBcast) = medianSec(run(Long.MaxValue))
        println(s"""{"metric":"graph_gate_$name","sf":"$sfDir",""" +
          s""""nodes":$nodes,"gate":$gate,"organic_arm":"$organicArm",""" +
          s""""sec_default":$secDefault,"sec_forced_broadcast":$secBcast,""" +
          s""""rows":${sigDefault._1},"arms_equal":${sigDefault == sigBcast}}""")
      }
    }
    spark.stop()
  }
}
